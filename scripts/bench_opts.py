"""A/B the round-3 inference optimizations at the bench shape.

Variants (cumulative + isolating):
  base        — round-2 path: BN ops, separate 1x1s, head_compact off
  compact     — head_compact only
  fold        — BN folding only
  fold+fuse   — BN folding + fused Inception 1x1
  all         — fold + fuse + compact (what bench.py r3 first shipped)

Full-program chained methodology (CLAUDE.md): data-dependent proposal
chain, one readback. Run on the TPU with no other chip user.
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import time

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import PRESETS
from step_tpu.inference import detect_clip
from step_tpu.models.detector import STEPDetector
from step_tpu.models.optimize import optimize_for_inference
from step_tpu.utils.compile_cache import enable_compile_cache
from step_tpu.utils.init import init_detector_cpu

enable_compile_cache()

BATCH = 128
ITERS = 20


def chained(detect, variables, rgb, proposals, prop_mask):
    out = detect(variables, rgb, proposals, prop_mask)
    _ = float(jnp.sum(out["tube_scores"]))
    t0 = time.time()
    props = proposals
    for _ in range(ITERS):
        out = detect(variables, rgb, props, prop_mask)
        props = out["tubes"]
    _ = float(jnp.sum(out["tube_scores"]))
    return (time.time() - t0) / ITERS


def run(tag, cfg, variables, rgb, device):
    model = STEPDetector(cfg)
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, BATCH)
    v = jax.device_put(variables, device)
    proposals, prop_mask = jax.device_put((proposals, prop_mask), device)

    @jax.jit
    def detect(variables, rgb, proposals, prop_mask):
        return detect_clip(variables, rgb, proposals, prop_mask, cfg, model)

    t0 = time.time()
    jax.block_until_ready(detect(v, rgb, proposals, prop_mask))
    compile_s = time.time() - t0
    dt = chained(detect, v, rgb, proposals, prop_mask)
    print(f"{tag:12s} {BATCH / dt:8.1f} clips/s   {dt * 1e3:7.2f} ms/batch"
          f"   (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    cfg0 = PRESETS["ucf_3step"].replace(head_compact=False)
    device = jax.devices()[0]
    variables = init_detector_cpu(cfg0, jax.random.PRNGKey(0),
                                  STEPDetector(cfg0))
    rng = np.random.RandomState(0)
    rgb = jax.device_put(jnp.asarray(
        rng.rand(BATCH, cfg0.total_frames, cfg0.image_size, cfg0.image_size, 3),
        jnp.float32), device)

    run("base", cfg0, variables, rgb, device)
    run("compact", cfg0.replace(head_compact=True), variables, rgb, device)
    cfg_fold, vars_fold = optimize_for_inference(cfg0, variables,
                                                 fuse_inception=False)
    run("fold", cfg_fold, vars_fold, rgb, device)
    cfg_ff, vars_ff = optimize_for_inference(cfg0, variables)
    run("fold+fuse", cfg_ff, vars_ff, rgb, device)
    run("all", cfg_ff.replace(head_compact=True), vars_ff, rgb, device)
    # scan_unroll: identical math (bit-exact-tested), different lowering —
    # removes the per-iteration dynamic-slice of the stacked per-step tail
    # params and lets XLA schedule across step boundaries.
    run("ff+unroll", cfg_ff.replace(scan_unroll=True), vars_ff, rgb, device)


if __name__ == "__main__":
    main()
