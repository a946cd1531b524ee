"""Measure the AOT-exported detect program ON the chip vs live jit.

VERDICT r2 item 8: export.py's StableHLO artifact was only
CPU-roundtrip-tested; this runs the deserialized program on the TPU with
the chained methodology and compares against the live-jit program.

Usage: python scripts/bench_export.py [--batch 128]
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import PRESETS
from step_tpu.inference import detect_clip
from step_tpu.models.detector import STEPDetector
from step_tpu.models.optimize import optimize_for_inference
from step_tpu.utils.compile_cache import enable_compile_cache
from step_tpu.utils.export import export_detect_fn, load_detect_fn
from step_tpu.utils.init import init_detector_cpu

enable_compile_cache()
ITERS = 20


def chained(fn, variables, rgb, proposals, prop_mask):
    out = fn(variables, rgb, proposals, prop_mask)
    _ = float(jnp.sum(out["tube_scores"]))
    t0 = time.time()
    props = proposals
    for _ in range(ITERS):
        out = fn(variables, rgb, props, prop_mask)
        props = out["tubes"]
    _ = float(jnp.sum(out["tube_scores"]))
    return (time.time() - t0) / ITERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    cfg = PRESETS["ucf_3step"]
    device = jax.devices()[0]
    variables = init_detector_cpu(cfg, jax.random.PRNGKey(0),
                                  STEPDetector(cfg))
    cfg, variables = optimize_for_inference(cfg, variables)
    # exported artifacts force the portable pure-XLA lowerings; compare
    # against a live jit of the SAME config so the delta is export overhead,
    # not kernel choice
    cfg = cfg.replace(nms_impl="scan")
    model = STEPDetector(cfg)
    variables = jax.device_put(variables, device)

    B, T = args.batch, cfg.total_frames
    rng = np.random.RandomState(0)
    frames = rng.rand(B, T, cfg.image_size, cfg.image_size, 3)
    if cfg.uint8_transfer:
        # the exported program's input spec follows cfg.uint8_transfer
        # (utils/export.py::_detect_arg_specs); feed the SAME wire array to
        # the live program so the live-vs-AOT parity check stays exact
        from step_tpu.data.pipeline import rgb_to_uint8_wire

        frames = rgb_to_uint8_wire(frames)
    rgb = jax.device_put(jnp.asarray(frames), device)
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, B)
    proposals, prop_mask = jax.device_put((proposals, prop_mask), device)

    @jax.jit
    def live(variables, rgb, proposals, prop_mask):
        return detect_clip(variables, rgb, proposals, prop_mask, cfg, model)

    dt_live = chained(live, variables, rgb, proposals, prop_mask)
    print(f"live jit    : {B / dt_live:8.1f} clips/s  {dt_live * 1e3:7.2f} ms/batch",
          flush=True)

    t0 = time.time()
    blob = export_detect_fn(cfg, batch_size=B)
    export_s = time.time() - t0
    run = load_detect_fn(blob)
    dt_aot = chained(run, variables, rgb, proposals, prop_mask)
    print(f"AOT export  : {B / dt_aot:8.1f} clips/s  {dt_aot * 1e3:7.2f} ms/batch"
          f"   (blob {len(blob) / 1e6:.1f} MB, export {export_s:.0f}s)",
          flush=True)

    out_l = live(variables, rgb, proposals, prop_mask)
    out_a = run(variables, rgb, proposals, prop_mask)
    d = float(jnp.max(jnp.abs(out_l["frame_scores"] - out_a["frame_scores"])))
    print(f"max |Δframe_scores| live vs AOT: {d:.2e}")


if __name__ == "__main__":
    main()
