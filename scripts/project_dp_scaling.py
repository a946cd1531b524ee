#!/usr/bin/env python
"""Data-parallel ICI scaling projection for the train step (roofline).

Multi-chip hardware is not reachable in this container (1 chip via the
relay), so ICI scaling cannot be MEASURED — but it can be bounded
honestly: DP training's only cross-chip traffic is the gradient
all-reduce (GSPMD inserts one psum of the grad tree per step; detection
inference inserts none), so per-step collective time is

    t_ar ≈ 2 * V * (n-1)/n / BW_ici     (bidirectional ring all-reduce)

with V = 4 bytes x trainable params and BW_ici the per-chip ICI
bandwidth. Efficiency = t_step / (t_step + t_ar) is a LOWER bound on a
real system, which overlaps the all-reduce with the backward pass.

The param count comes from jax.eval_shape over the real model init
(trace only — no FLOPs, runs in seconds on CPU); the step time is the
chip-measured bench_train number passed via --step-ms. Bandwidth is a
PARAMETER (public v5e figures are ~100-400 GB/s/chip scale; we print a
conservative-to-optimistic range rather than assert one number).

Output: one JSON line with the volume and an efficiency table, recorded
in VALIDATION.md round 5.
"""

import _bootstrap  # noqa: F401

import argparse
import json

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from step_tpu.config import PRESETS  # noqa: E402
from step_tpu.models.detector import STEPDetector  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="ucf_3step")
    ap.add_argument("--step-ms", type=float, default=371.8,
                    help="chip-measured per-step ms at the projected batch "
                         "(default: r5 B=32 baseline)")
    ap.add_argument("--bw-gbps", type=float, nargs="*",
                    default=[50.0, 100.0, 200.0, 400.0],
                    help="assumed per-chip ICI bandwidths (GB/s)")
    ap.add_argument("--chips", type=int, nargs="*", default=[2, 4, 8, 16])
    args = ap.parse_args()

    cfg = PRESETS[args.preset]
    model = STEPDetector(cfg)
    rgb = jax.ShapeDtypeStruct(
        (1, cfg.total_frames, cfg.image_size, cfg.image_size, 3),
        jnp.float32)
    props = jax.ShapeDtypeStruct((1, cfg.max_proposals, cfg.total_frames, 4),
                                 jnp.float32)
    shapes = jax.eval_shape(
        lambda r, p: model.init(jax.random.PRNGKey(0), r, p, train=False),
        rgb, props)
    nparams = sum(int(jnp.prod(jnp.asarray(x.shape)))
                  for x in jax.tree.leaves(shapes["params"]))
    vol_mb = nparams * 4 / 1e6

    table = {}
    for bw in args.bw_gbps:
        row = {}
        for n in args.chips:
            t_ar_ms = 2 * vol_mb / 1e3 * (n - 1) / n / bw * 1e3
            row[str(n)] = round(args.step_ms / (args.step_ms + t_ar_ms), 4)
        table[f"{bw:g}GBps"] = row
    print(json.dumps({
        "preset": args.preset,
        "trainable_params": nparams,
        "allreduce_mb_per_step": round(vol_mb, 1),
        "step_ms": args.step_ms,
        "dp_efficiency_lower_bound": table,
        "note": "no-overlap lower bound; GSPMD overlaps the all-reduce "
                "with the backward pass. NOT a measurement — 1 chip here.",
    }))


if __name__ == "__main__":
    main()
