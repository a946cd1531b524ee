"""A/B the conv3d lowering variants at the FULL detect-program level.

The standalone conv microbenchmarks (bench_conv3d.py/bench_conv1x1.py) are
untrustworthy on the relay transport: their bf16 perturbation
(1 + tanh(mean)*1e-3) rounds to exactly 1.0, so every chained dispatch is
bit-identical and the relay memoizes it. This harness reuses bench.py's
genuinely data-dependent chain (refined tubes feed back as proposals).
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import time

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import PRESETS
from step_tpu.inference import detect_clip
from step_tpu.models.detector import STEPDetector
from step_tpu.utils.compile_cache import enable_compile_cache
from step_tpu.utils.init import init_detector_cpu

enable_compile_cache()

BATCH = 64
ITERS = 20

VARIANTS = [
    ("base(scan-nms)", dict()),
    ("pallas-nms", dict(nms_impl="pallas")),
]


def run(cfg):
    model = STEPDetector(cfg)
    device = jax.devices()[0]
    variables = init_detector_cpu(cfg, jax.random.PRNGKey(0), model,
                                  device=device)
    T = cfg.total_frames
    rng = np.random.RandomState(0)
    rgb = jax.device_put(
        jnp.asarray(rng.rand(BATCH, T, cfg.image_size, cfg.image_size, 3),
                    jnp.float32), device)
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, BATCH)
    proposals, prop_mask = jax.device_put((proposals, prop_mask), device)

    @jax.jit
    def detect(variables, rgb, proposals, prop_mask):
        return detect_clip(variables, rgb, proposals, prop_mask, cfg, model)

    out = detect(variables, rgb, proposals, prop_mask)
    _ = float(jnp.sum(out["tube_scores"]))
    props = proposals
    t0 = time.time()
    for _ in range(ITERS):
        out = detect(variables, rgb, props, prop_mask)
        props = out["tubes"]
    _ = float(jnp.sum(out["tube_scores"]))
    return (time.time() - t0) / ITERS


def main():
    base = PRESETS["ucf_3step"]
    for name, kw in VARIANTS:
        cfg = base.replace(**kw)
        try:
            dt = run(cfg)
            print(f"{name:14s}: {dt*1e3:8.2f} ms/batch "
                  f"({BATCH/dt:7.1f} clips/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
