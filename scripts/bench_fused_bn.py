"""Measure the Pallas fused BN+ReLU against XLA's epilogue fusion on the
real chip (full detect program, ucf_3step shapes, chained timing)."""

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


def run(cfg, label, variables=None):
    model = STEPDetector(cfg)
    device = jax.devices()[0]
    if variables is None:
        variables = init_detector_cpu(cfg, jax.random.PRNGKey(0), model,
                                      device=device)
    rng = np.random.RandomState(0)
    rgb = jax.device_put(
        jnp.asarray(rng.rand(BATCH, cfg.total_frames, cfg.image_size,
                             cfg.image_size, 3), jnp.float32), device)
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, BATCH)
    proposals, prop_mask = jax.device_put((proposals, prop_mask), device)

    @jax.jit
    def detect(variables, rgb, props, prop_mask):
        return detect_clip(variables, rgb, props, prop_mask, cfg, model)["tubes"]

    props = proposals
    jax.block_until_ready(detect(variables, rgb, props, prop_mask))
    t0 = time.time()
    for _ in range(ITERS):
        props = detect(variables, rgb, props, prop_mask)
    jax.block_until_ready(props)
    dt = (time.time() - t0) / ITERS
    print(f"{label:28s}: {dt*1e3:8.2f} ms/batch ({BATCH/dt:7.1f} clips/s)",
          flush=True)
    return variables


def main():
    base = PRESETS["ucf_3step"]
    v = run(base, "fused_bn_relu=False")
    run(base.replace(fused_bn_relu=True), "fused_bn_relu=True", variables=v)


if __name__ == "__main__":
    main()
