"""Greedy NMS as a fixed-iteration on-device scan.

Reference parity: ``external/maskrcnn_benchmark/csrc/cuda/nms.cu`` (recon) —
greedy IoU suppression, identical keep ordering. The CUDA kernel computes a
suppression bitmask in parallel; on TPU we run `max_keep` argmax+suppress
iterations inside `lax.scan` (static trip count, no host sync). At STEP's box
counts (tens per frame) this is far from the bottleneck; a Pallas variant is
only warranted if profiling says otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from step_tpu.tubes.boxes import pairwise_iou

NEG = -1e9


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    max_keep: int = 32,
    score_threshold: float = 0.0,
    valid: jnp.ndarray | None = None,
):
    """Greedy non-maximum suppression.

    Args:
      boxes: [N, 4] x1y1x2y2.
      scores: [N].
      iou_threshold: suppress boxes overlapping a kept box above this.
      max_keep: static number of keep slots (fixed trip count).
      score_threshold: boxes below this are never kept.
      valid: optional [N] mask for padded slots.

    Returns:
      keep_idx: [max_keep] int32 — indices into `boxes` (ordered by score).
      keep_mask: [max_keep] float — 1 where the slot holds a real detection.
    """
    n = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes)  # [N, N]
    live = scores.astype(jnp.float32)
    if valid is not None:
        live = jnp.where(valid > 0, live, NEG)
    live = jnp.where(live > score_threshold, live, NEG)

    def body(live_scores, _):
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        ok = best_score > NEG / 2
        # Suppress overlapping boxes. The selected index is knocked out
        # EXPLICITLY: a zero-area box (decoded box clipped fully outside
        # the image) has IoU 0 with everything INCLUDING itself, so
        # relying on the IoU diagonal would re-select it every iteration
        # and fill all keep slots with duplicates of a degenerate box.
        suppress = iou[best] > iou_threshold
        nxt = jnp.where(suppress, NEG, live_scores)
        nxt = nxt.at[best].set(NEG)
        # If nothing is live anymore, freeze the state.
        nxt = jnp.where(ok, nxt, live_scores)
        return nxt, (best.astype(jnp.int32), ok.astype(jnp.float32))

    _, (keep_idx, keep_mask) = jax.lax.scan(body, live, None, length=max_keep)
    return keep_idx, keep_mask


def batched_nms(
    boxes: jnp.ndarray,
    class_scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    max_keep: int = 32,
    score_threshold: float = 0.0,
    valid: jnp.ndarray | None = None,
):
    """Per-class NMS over one frame (reference: test.py per-class loop).

    Args:
      boxes: [N, 4] — shared across classes (STEP regresses class-agnostic
        boxes; classes share geometry).
      class_scores: [N, C].
      valid: optional [N].

    Returns:
      keep_idx: [C, max_keep] int32, keep_mask: [C, max_keep] float.
    """
    C = class_scores.shape[-1]
    v = valid if valid is not None else jnp.ones(boxes.shape[0], class_scores.dtype)

    def per_class(scores_c):
        return nms(boxes, scores_c, iou_threshold, max_keep, score_threshold, v)

    return jax.vmap(per_class, in_axes=1)(class_scores)
