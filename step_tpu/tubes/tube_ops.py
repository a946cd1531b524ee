"""Tube-level operations: tube IoU, temporal extrapolation, validity.

Reference parity: ``utils/tube_utils.py::compute_tube_iou / extrapolate_tubes /
valid_tubes`` (recon). The reference runs these on host numpy between torch
calls; here they are pure jnp with per-frame validity masks so the whole
progressive loop stays inside one compiled XLA program (static shapes, no
data-dependent control flow).

Conventions:
  tubes:      [..., P, T, 4]  per-frame boxes, x1y1x2y2 pixels
  frame_mask: [..., T] or [T] bool/float — which frames of the tube are live
              (temporal extension activates more frames at later steps)
"""

from __future__ import annotations

import jax.numpy as jnp

from step_tpu.tubes.boxes import elementwise_iou, clip_boxes

EPS = 1e-8


def tube_iou(
    tubes_a: jnp.ndarray,
    tubes_b: jnp.ndarray,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean per-frame IoU between tube sets.

    Args:
      tubes_a: [..., P, T, 4]
      tubes_b: [..., G, T, 4]
      frame_mask: optional [T] (or broadcastable) weights; invalid frames are
        excluded from the mean — matching the reference's behavior of scoring
        tubes only over annotated frames.

    Returns: [..., P, G] mean IoU.
    """
    a = tubes_a[..., :, None, :, :]  # [..., P, 1, T, 4]
    b = tubes_b[..., None, :, :, :]  # [..., 1, G, T, 4]
    per_frame = elementwise_iou(a, b)  # [..., P, G, T]
    if frame_mask is None:
        return jnp.mean(per_frame, axis=-1)
    w = jnp.asarray(frame_mask, per_frame.dtype)
    if w.ndim > 1:
        # Batched mask [..., T]: insert the P and G axes so it broadcasts
        # against per_frame [..., P, G, T]. (The old form multiplied the
        # raw [..., T] in, which misaligned the batch dims against P/G —
        # a shape error, or a silently wrong mean when sizes coincided.)
        w = w[..., None, None, :]
    num = jnp.sum(per_frame * w, axis=-1)
    den = jnp.maximum(jnp.sum(w, axis=-1), EPS)
    return num / den


def valid_tube_mask(tubes: jnp.ndarray, min_size: float = 1.0) -> jnp.ndarray:
    """[..., P, T, 4] → [..., P] — tube is valid if every frame box has
    positive extent (reference's `valid_tubes` drops degenerate tubes)."""
    w = tubes[..., 2] - tubes[..., 0]
    h = tubes[..., 3] - tubes[..., 1]
    return jnp.all((w >= min_size) & (h >= min_size), axis=-1)


def chunk_frame_mask(step: jnp.ndarray | int, num_chunks: int, frames_per_chunk: int,
                     extend: bool = True) -> jnp.ndarray:
    """Frame-validity mask for refinement step `step` (0-indexed).

    Step 0 activates only the central chunk; each later step activates one
    more chunk on each side (the paper's progressive temporal extension,
    6 → 18 frames with 3 chunks). Returns float mask [num_chunks * T].
    """
    center = num_chunks // 2
    if extend:
        reach = jnp.minimum(jnp.asarray(step, jnp.int32), center)
    else:
        reach = jnp.zeros((), jnp.int32)
    chunk_ids = jnp.arange(num_chunks)
    chunk_active = (jnp.abs(chunk_ids - center) <= reach).astype(jnp.float32)
    return jnp.repeat(chunk_active, frames_per_chunk)


def extrapolate_tubes(
    tubes: jnp.ndarray,
    known_mask: jnp.ndarray,
    image_size: float | None = None,
) -> jnp.ndarray:
    """Fill unknown frames of each tube by linear-motion extrapolation.

    Reference parity: ``utils/tube_utils.py::extrapolate_tubes`` (recon) —
    before steps >= 2, tubes regressed on the central chunk are extended into
    neighboring chunks assuming linear motion, so the next ROI pooling has
    boxes on every newly active frame.

    Implemented as a masked least-squares line fit per coordinate over the
    known frames (closed form, static shapes): c(t) ≈ a + b·t, unknown frames
    take the fitted value, known frames are left untouched.

    Args:
      tubes: [..., T, 4]
      known_mask: [T] (or broadcastable to [..., T]) — 1 where boxes are real.
      image_size: optional clamp of extrapolated boxes to [0, image_size].

    Returns tubes with unknown frames filled, same shape.
    """
    T = tubes.shape[-2]
    t = jnp.arange(T, dtype=tubes.dtype)
    w = jnp.broadcast_to(jnp.asarray(known_mask, tubes.dtype), tubes.shape[:-1])

    # Weighted least squares of each of the 4 coords against t.
    sw = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), EPS)        # [..., 1]
    mean_t = jnp.sum(w * t, axis=-1, keepdims=True) / sw             # [..., 1]
    mean_c = jnp.sum(w[..., None] * tubes, axis=-2) / sw             # [..., 4]
    dt = (t - mean_t)                                                # [..., T]
    var_t = jnp.sum(w * dt * dt, axis=-1)[..., None]                 # [..., 1]
    cov = jnp.sum((w * dt)[..., None] * (tubes - mean_c[..., None, :]), axis=-2)
    slope = cov / jnp.maximum(var_t, EPS)                            # [..., 4]
    fitted = mean_c[..., None, :] + slope[..., None, :] * dt[..., None]

    filled = jnp.where(w[..., None] > 0, tubes, fitted)
    if image_size is not None:
        ext = clip_boxes(filled, image_size, image_size)
        filled = jnp.where(w[..., None] > 0, tubes, ext)
    return filled
