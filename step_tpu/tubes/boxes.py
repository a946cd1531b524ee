"""Per-frame box math: IoU, Faster-R-CNN-style delta encode/decode, clipping.

Reference parity: ``utils/tube_utils.py::encode_coef/decode_coef`` (recon) —
the SSD-family parameterization with variances (0.1, 0.2), applied per frame.
Boxes are ``[x1, y1, x2, y2]`` in absolute (float) pixel coordinates; all
functions broadcast over arbitrary leading axes so the same code serves
single frames, tubes ``[P, T, 4]``, and batches.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [..., 4] boxes; degenerate (inverted) boxes get area 0."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between a [..., N, 4] and b [..., M, 4] → [..., N, M]."""
    a_exp = a[..., :, None, :]
    b_exp = b[..., None, :, :]
    lt = jnp.maximum(a_exp[..., :2], b_exp[..., :2])
    rb = jnp.minimum(a_exp[..., 2:], b_exp[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return inter / jnp.maximum(union, EPS)


def elementwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between matching boxes of two [..., 4] arrays → [...]."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    return inter / jnp.maximum(union, EPS)


def _to_cxcywh(boxes: jnp.ndarray):
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], EPS)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], EPS)
    return cx, cy, w, h


def encode_boxes(
    boxes: jnp.ndarray,
    anchors: jnp.ndarray,
    variances=(0.1, 0.2),
) -> jnp.ndarray:
    """Encode target `boxes` relative to `anchors` → deltas [..., 4].

    Anchor extents clamp to 1 px (coordinates are in pixels): a proposal
    that degenerated to zero width/height (e.g. clipped entirely against
    the image border) and then gets force-matched would otherwise produce
    1/EPS-scale regression targets — observed as a transient 3e7 loss
    spike on the synthetic oracle (VALIDATION.md round-3 A/B).
    """
    bcx, bcy, bw, bh = _to_cxcywh(boxes)
    acx, acy, aw, ah = _to_cxcywh(anchors)
    aw = jnp.maximum(aw, 1.0)
    ah = jnp.maximum(ah, 1.0)
    dx = (bcx - acx) / (aw * variances[0])
    dy = (bcy - acy) / (ah * variances[0])
    dw = jnp.log(bw / aw) / variances[1]
    dh = jnp.log(bh / ah) / variances[1]
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    variances=(0.1, 0.2),
    max_scale_delta: float = 4.0,
) -> jnp.ndarray:
    """Apply deltas [..., 4] to anchors [..., 4] → boxes [x1,y1,x2,y2].

    `max_scale_delta` clamps log-space growth so an unlucky early-training
    regression can't produce astronomically large boxes inside the compiled
    progressive loop (static-shape analog of the reference clipping decoded
    boxes to the image on the host).
    """
    acx, acy, aw, ah = _to_cxcywh(anchors)
    cx = deltas[..., 0] * variances[0] * aw + acx
    cy = deltas[..., 1] * variances[0] * ah + acy
    scale = jnp.clip(deltas[..., 2:4] * variances[1], -max_scale_delta, max_scale_delta)
    w = jnp.exp(scale[..., 0]) * aw
    h = jnp.exp(scale[..., 1]) * ah
    return jnp.stack(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1
    )


def clip_boxes(boxes: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    """Clamp boxes to the image rectangle [0, width] x [0, height]."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width)
    y1 = jnp.clip(boxes[..., 1], 0.0, height)
    x2 = jnp.clip(boxes[..., 2], 0.0, width)
    y2 = jnp.clip(boxes[..., 3], 0.0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
