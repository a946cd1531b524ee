"""On-device input preprocessing (north star: decode → sample → resize →
normalize staged on device).

Decode/resize happen on host (cv2 or the native C++ loader — JPEG decode is
not a TPU op); normalization lives INSIDE the compiled detector so the
host→device transfer can stay in uint8 (4x less bandwidth) or [0,1] float,
and XLA fuses the affine into the first conv's input.
"""

from __future__ import annotations

import jax.numpy as jnp

# ImageNet/Kinetics statistics in [0,1] scale (matches the reference's
# data/augmentations.py normalization (recon)).
RGB_MEAN = (0.485, 0.456, 0.406)
RGB_STD = (0.229, 0.224, 0.225)


def device_preprocess(rgb: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] or float [0,1] RGB → normalized float32."""
    x = rgb.astype(jnp.float32)
    if rgb.dtype == jnp.uint8:
        x = x / 255.0
    mean = jnp.asarray(RGB_MEAN, jnp.float32)
    std = jnp.asarray(RGB_STD, jnp.float32)
    return (x - mean) / std
