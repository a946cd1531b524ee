"""Parameter initialization on the host CPU backend.

Initializing the 22M-param detector directly on the TPU pays a full remote
compile of the init program (~7 min measured); tracing init on the local CPU
backend and transferring the pytree takes seconds and produces identical
values (same PRNG, same shapes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from step_tpu.config import StepConfig
from step_tpu.models.detector import STEPDetector


def init_detector_cpu(
    cfg: StepConfig,
    rng: jax.Array,
    model: Optional[STEPDetector] = None,
    device=None,
):
    """Init detector variables on CPU, optionally transfer to `device`."""
    model = model or STEPDetector(cfg)
    cpu = jax.local_devices(backend="cpu")[0]
    B, T = 1, cfg.total_frames
    # a flow-stream detector (late-fusion protocol) takes 2-channel flow
    # as its PRIMARY input — init must match or restored params mismatch
    in_ch = 3 if cfg.input_stream == "rgb" else 2
    with jax.default_device(cpu):
        rgb = jnp.zeros((B, T, cfg.image_size, cfg.image_size, in_ch), jnp.float32)
        flow = (
            jnp.zeros((B, T, cfg.image_size, cfg.image_size, 2), jnp.float32)
            if cfg.two_stream
            else None
        )
        props, _ = STEPDetector.initial_proposals(cfg, B)
        variables = jax.jit(model.init, static_argnames=())(rng, rgb, props, flow)
    if device is not None:
        variables = jax.device_put(variables, device)
    return variables
