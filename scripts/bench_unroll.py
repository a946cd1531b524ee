"""A/B: rolled `nn.scan` refinement loop vs unrolled lowering at the
serving shape (B=128, ucf_3step, optimized fold+fuse variables).

Hypothesis: the scan boundary forces XLA to materialize the carry and
blocks cross-step fusion; unrolling the 3 steps may let the emitter
overlap the per-step tails. (The unrolled program is identical math —
bit-exact-tested in tests/test_models.py — and is already what bench.py
lowers for its exact MFU denominator, so compile cost is cached.)

Chained methodology per CLAUDE.md: data-dependent proposal chain, one
readback. Run on the TPU with no other chip user.
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import json
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
    _ = float(jnp.sum(out["tube_scores"]))          # compile + settle
    t0 = time.time()
    props = proposals
    for _ in range(ITERS):
        out = detect(variables, rgb, props, prop_mask)
        props = out["tubes"]
    _ = float(jnp.sum(out["tube_scores"]))
    return (time.time() - t0) / ITERS


def main():
    device = jax.devices()[0]
    cfg0 = PRESETS["ucf_3step"]
    variables = init_detector_cpu(cfg0, jax.random.PRNGKey(0),
                                  STEPDetector(cfg0))
    cfg0, variables = optimize_for_inference(cfg0, variables)
    variables = jax.device_put(variables, device)

    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(BATCH, cfg0.total_frames, cfg0.image_size,
                               cfg0.image_size, 3), jnp.float32)
    proposals, prop_mask = STEPDetector.initial_proposals(cfg0, BATCH)
    rgb, proposals, prop_mask = jax.device_put(
        (rgb, proposals, prop_mask), device)

    results = {}
    outs = {}
    for unroll in (False, True):
        cfg = cfg0.replace(scan_unroll=unroll)
        model = STEPDetector(cfg)

        @jax.jit
        def detect(variables, rgb, proposals, prop_mask,
                   cfg=cfg, model=model):
            return detect_clip(variables, rgb, proposals, prop_mask, cfg,
                               model)

        dt = chained(detect, variables, rgb, proposals, prop_mask)
        results["unroll" if unroll else "rolled"] = {
            "ms_per_batch": round(dt * 1000, 1),
            "clips_per_sec": round(BATCH / dt, 1),
        }
        outs[unroll] = detect(variables, rgb, proposals, prop_mask)
    results["max_abs_score_delta"] = float(
        jnp.max(jnp.abs(outs[True]["frame_scores"]
                        - outs[False]["frame_scores"])))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
