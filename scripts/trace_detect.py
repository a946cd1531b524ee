"""Trace the production detect program and rank device-op time.

Round-3 follow-up to the fused-Inception win: capture a jax.profiler trace
of the OPTIMIZED detect program (fold+fuse, B=128) and rank per-fusion
device time (utils/profiling.summarize_trace — the relay passes the TPU
lane through). Never run while another process uses the chip.

Usage: python scripts/trace_detect.py [--batch 128] [--top 40]
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import PRESETS
from step_tpu.inference import detect_clip
from step_tpu.models.detector import STEPDetector
from step_tpu.models.optimize import optimize_for_inference
from step_tpu.utils.compile_cache import enable_compile_cache
from step_tpu.utils.init import init_detector_cpu
from step_tpu.utils.profiling import summarize_trace, trace

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--base", action="store_true",
                    help="trace the unoptimized (round-2) program instead")
    args = ap.parse_args()

    cfg = PRESETS["ucf_3step"]
    device = jax.devices()[0]
    variables = init_detector_cpu(cfg, jax.random.PRNGKey(0),
                                  STEPDetector(cfg))
    if not args.base:
        cfg, variables = optimize_for_inference(cfg, variables)
    model = STEPDetector(cfg)
    variables = jax.device_put(variables, device)

    B, T = args.batch, cfg.total_frames
    rng = np.random.RandomState(0)
    rgb = jax.device_put(jnp.asarray(
        rng.rand(B, T, cfg.image_size, cfg.image_size, 3), jnp.float32),
        device)
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, B)
    proposals, prop_mask = jax.device_put((proposals, prop_mask), device)

    @jax.jit
    def detect(variables, rgb, proposals, prop_mask):
        return detect_clip(variables, rgb, proposals, prop_mask, cfg, model)

    out = detect(variables, rgb, proposals, prop_mask)
    _ = float(jnp.sum(out["tube_scores"]))          # compile + settle

    log_dir = "/tmp/step_tpu_trace_detect"
    with trace(log_dir):
        props = proposals
        for _ in range(args.iters):
            out = detect(variables, rgb, props, prop_mask)
            props = out["tubes"]
        _ = float(jnp.sum(out["tube_scores"]))

    rows = summarize_trace(log_dir, top=args.top)
    total = sum(ms for name, ms, n in rows
                if not name.startswith(("jit_", "while")))
    print(f"{'op':60s} {'ms':>9s} {'n':>5s}")
    for name, ms, n in rows:
        print(f"{name[:60]:60s} {ms:9.2f} {n:5d}")
    print(f"\n(visible leaf-op total ~{total:.1f} ms over {args.iters} iters)")


if __name__ == "__main__":
    main()
