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


def device_preprocess_flow(flow: jnp.ndarray) -> jnp.ndarray:
    """int8 [-127,127] (quantized transfer) or float [-1,1] flow → float32.

    Flow frames come from uint8 images on disk (brox-images JPEGs mapped to
    [-1,1] at 1/127.5 resolution), so the int8 wire format is
    near-lossless for real datasets (<=1/254 round-off; u8 levels 127/128
    share a code) — the flow analog of the rgb uint8_transfer path, 4x
    less relay/PCIe bandwidth than f32.
    """
    x = flow.astype(jnp.float32)
    if flow.dtype == jnp.int8:
        x = x / 127.0
    return x
