"""Cross-clip tube linking — on device.

Reference parity: ``utils/tube_utils.py`` linking + ``test.py`` (recon) —
after per-clip detection, the reference links per-clip tubes into video-long
tubes on the host with a greedy/DP pass maximizing score + overlap. The
BASELINE north star requires linking **on device**; we express it as a
Viterbi dynamic program over the clip axis with `lax.scan` (static shapes:
a fixed per-clip tube capacity P).

Edge weight between tube i of clip t and tube j of clip t+1:
    w = score_j + link_iou_weight * IoU(last_box_i, first_box_j)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from step_tpu.tubes.boxes import pairwise_iou

NEG = -1e9


def link_tubes(
    tubes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    link_iou_weight: float = 1.0,
):
    """Link per-clip tubes into video tubes by per-class Viterbi.

    Args:
      tubes:  [L, P, T, 4] — per-clip candidate tubes (L clips, P per clip).
      scores: [L, P] — per-tube class score (run once per class).
      valid:  [L, P] — optional validity mask for padded tube slots.
      link_iou_weight: weight of temporal-overlap IoU in the edge score.

    Returns:
      path:   [L] int32 — chosen tube index per clip (the best video tube).
      value:  scalar — total path score (sum of chosen scores + weighted IoUs).
    """
    L, P = scores.shape
    if valid is None:
        valid = jnp.ones((L, P), scores.dtype)
    masked_scores = jnp.where(valid > 0, scores, NEG)

    last_boxes = tubes[:, :, -1, :]   # [L, P, 4]
    first_boxes = tubes[:, :, 0, :]   # [L, P, 4]
    # Transition IoU between consecutive clips: [L-1, P, P]
    trans = jax.vmap(pairwise_iou)(last_boxes[:-1], first_boxes[1:])

    def step(carry, inp):
        prev_val = carry                       # [P] best value ending at each tube
        sc, tr = inp                           # sc: [P], tr: [P, P] (prev x cur)
        cand = prev_val[:, None] + link_iou_weight * tr  # [P, P]
        best_prev = jnp.argmax(cand, axis=0)             # [P]
        val = jnp.max(cand, axis=0) + sc                 # [P]
        return val, best_prev

    init = masked_scores[0]
    final_val, backptrs = jax.lax.scan(step, init, (masked_scores[1:], trans))
    # backptrs: [L-1, P]

    end = jnp.argmax(final_val)
    value = final_val[end]

    def backtrack(carry, bp):
        idx = carry
        prev = bp[idx]
        return prev, idx

    start_idx, rest = jax.lax.scan(backtrack, end, backptrs, reverse=True)
    path = jnp.concatenate([start_idx[None], rest])
    return path.astype(jnp.int32), value


def link_tubes_multiclass(tubes, class_scores, valid=None, link_iou_weight: float = 1.0):
    """Vectorize `link_tubes` over a class axis.

    Args:
      tubes: [L, P, T, 4]; class_scores: [L, P, C]; valid: [L, P] or None.
    Returns: paths [C, L] int32, values [C].
    """
    C = class_scores.shape[-1]
    scores_cf = jnp.moveaxis(class_scores, -1, 0)  # [C, L, P]
    v = valid if valid is not None else jnp.ones(class_scores.shape[:2], class_scores.dtype)
    return jax.vmap(lambda s: link_tubes(tubes, s, v, link_iou_weight))(scores_cf)
