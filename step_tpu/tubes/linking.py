"""Cross-clip tube linking — on device.

Reference parity: ``utils/tube_utils.py`` linking + ``test.py`` (recon) —
after per-clip detection, the reference links per-clip tubes into video-long
tubes on the host with a greedy/DP pass maximizing score + overlap. The
BASELINE north star requires linking **on device**; we express it as a
Viterbi dynamic program over the clip axis with `lax.scan` (static shapes:
a fixed per-clip tube capacity P).

Edge weight between tube i of clip t and tube j of clip t+1:
    w = score_j + link_iou_weight * transition_IoU(i, j)

`transition_IoU` depends on how the clips tile the video (`stride`, in
video frames between consecutive clips' first frames):
  - stride=None (default): IoU(last box of i, first box of j) — correct
    only for NON-overlapping tilings (stride == T, e.g. demo.py), where
    those two boxes are temporally adjacent.
  - stride=s < T (sliding windows, e.g. `evaluate.collect_video_tubes`'s
    one-chunk stride): frame d of clip t+1 shows the SAME video frame as
    frame d+s of clip t, so the transition is the mean pairwise IoU over
    all T-s temporally ALIGNED frame pairs. The last-vs-first form is
    meaningless here — the boxes are 2s-T+... frames apart in video time
    (11 frames at the ucf_3step geometry), so for any moving actor it
    under-scores the true continuation (measured: video-mAP@0.2 0.65 vs
    the host greedy linker's 0.97 on the synthetic oracle before this
    fix).

Production form (`link_tubes_k` / `link_tubes_multiclass_k`): K paths per
class by ITERATIVE Viterbi — extract the best path, suppress its (clip,
tube) nodes, repeat (static trip count K) — plus temporal termination:
each path is trimmed to its maximum-sum run of per-clip scores above
`trim_thresh` (Kadane over the clip axis), so tubes can start and end
mid-video instead of being forced to span it. Padded clip slots
(`clip_mask`) contribute zero score and zero transition weight, which
keeps bucketed-length videos exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from step_tpu.tubes.boxes import pairwise_iou

NEG = -1e9


def _transition_iou(tubes: jnp.ndarray, stride: int | None = None) -> jnp.ndarray:
    """[L, P, T, 4] → [L-1, P, P] cross-clip transition IoU.

    `stride` (video frames between consecutive clips) selects the
    convention — see the module docstring. None/<=0 → last-vs-first
    (non-overlapping tiling); 0 < stride < T → mean IoU over the T-stride
    temporally aligned frame pairs of the window overlap.
    """
    T = tubes.shape[2]
    if stride and 0 < stride < T:
        a = jnp.moveaxis(tubes[:-1, :, stride:, :], 1, 2)   # [L-1, D, P, 4]
        b = jnp.moveaxis(tubes[1:, :, : T - stride, :], 1, 2)
        return pairwise_iou(a, b).mean(axis=1)              # [L-1, P, P]
    last_boxes = tubes[:, :, -1, :]
    first_boxes = tubes[:, :, 0, :]
    return jax.vmap(pairwise_iou)(last_boxes[:-1], first_boxes[1:])


def _viterbi(masked_scores: jnp.ndarray, trans: jnp.ndarray,
             link_iou_weight: float):
    """Best single path through [L, P] node scores with [L-1, P, P]
    transition weights. Returns (path [L] int32, value)."""

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


def link_tubes(
    tubes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    link_iou_weight: float = 1.0,
    stride: int | None = None,
):
    """Link per-clip tubes into ONE video tube by Viterbi (the k=1 core).

    Args:
      tubes:  [L, P, T, 4] — per-clip candidate tubes (L clips, P per clip).
      scores: [L, P] — per-tube class score (run once per class).
      valid:  [L, P] — optional validity mask for padded tube slots.
      link_iou_weight: weight of temporal-overlap IoU in the edge score.
      stride: video-frame stride of the clip tiling (see `_transition_iou`).

    Returns:
      path:   [L] int32 — chosen tube index per clip (the best video tube).
      value:  scalar — total path score (sum of chosen scores + weighted IoUs).
    """
    L, P = scores.shape
    if valid is None:
        valid = jnp.ones((L, P), scores.dtype)
    masked_scores = jnp.where(valid > 0, scores, NEG)
    trans = _transition_iou(tubes, stride)
    return _viterbi(masked_scores, trans, link_iou_weight)


def max_subarray_mask(x: jnp.ndarray):
    """Kadane over [L]: the contiguous run with maximal sum.

    Returns (mask [L] float — 1 inside the best run, value — the run's sum).
    With all-negative input the run is the single largest element.
    """
    L = x.shape[0]

    def fwd(carry, inp):
        t, xt = inp
        cur, cur_start, best, best_start, best_end = carry
        ext = cur + xt
        restart = ext < xt
        cur2 = jnp.where(restart, xt, ext)
        start2 = jnp.where(restart, t, cur_start)
        better = cur2 > best
        return (
            cur2, start2,
            jnp.where(better, cur2, best),
            jnp.where(better, start2, best_start),
            jnp.where(better, t, best_end),
        ), None

    init = (jnp.float32(NEG), jnp.int32(0),
            jnp.float32(NEG), jnp.int32(0), jnp.int32(0))
    (_, _, best, bs, be), _ = jax.lax.scan(
        fwd, init, (jnp.arange(L), x.astype(jnp.float32)))
    idx = jnp.arange(L)
    return ((idx >= bs) & (idx <= be)).astype(jnp.float32), best


def link_tubes_k(
    tubes: jnp.ndarray,          # [L, P, T, 4]
    scores: jnp.ndarray,         # [L, P]
    valid: jnp.ndarray | None = None,
    link_iou_weight: float = 1.0,
    k: int = 4,
    trim_thresh: float = 0.05,
    clip_mask: jnp.ndarray | None = None,   # [L] — 0 for padded clip slots
    stride: int | None = None,              # clip-tiling stride (video frames)
    suppress_iou: float | None = None,
):
    """K video tubes per class by iterative Viterbi with node suppression.

    After each extraction the used (clip, tube) nodes are invalidated, so
    the K paths are node-disjoint (the multi-instance behavior of the
    reference's host linker: each detection joins one tube).

    `suppress_iou`: on-device tube NMS at the SOURCE — after each
    extraction, additionally invalidate every node whose per-clip tube
    overlaps the chosen node above this mean-IoU threshold, so later paths
    route through genuinely different actors instead of re-linking a
    neighboring near-duplicate proposal of the same one. Node-disjointness
    alone is NOT enough: P per-clip proposals typically hold several
    refined copies of each actor, and the duplicate video tubes they yield
    are guaranteed false positives at matching (measured on the synthetic
    oracle: video-mAP@0.2 0.65 without vs 0.95+ with suppression).

    Temporal termination: each path's per-clip score sequence minus
    `trim_thresh` is trimmed to its maximal-sum contiguous run, so a tube
    occupies only the clips where its evidence exceeds the threshold.
    Clips whose valid tubes were exhausted by earlier paths/suppression
    are trimmed the same way (the forced re-used node there is never
    emitted), so a second actor survives a single collapsed clip instead
    of the whole path being killed; only a path with NO fresh clip at all
    scores 0.

    Returns dict:
      paths  [K, L] int32 — tube index per clip
      values [K]          — the path objective over the EMITTED (trimmed)
        run: sum of chosen scores + weighted transition IoUs between
        consecutive active clips. NOT the raw Viterbi accumulator, which is
        NEG-contaminated (~-1e9) whenever any clip's valid nodes were
        exhausted by earlier paths/suppression — a state the trim machinery
        recovers from but a raw-value ranking would falsely discard (e.g. a
        real second actor whose proposals collapsed in one clip).
      trim   [K, L] float — 1 where the tube is active
      tube_scores [K]     — mean per-clip score over the active run
    """
    L, P = scores.shape
    if valid is None:
        valid = jnp.ones((L, P), scores.dtype)
    if clip_mask is None:
        clip_mask = jnp.ones((L,), scores.dtype)
    # padded clips: neutral node score, zero transition weight
    scores = scores * clip_mask[:, None]
    trans = _transition_iou(tubes, stride) * jnp.minimum(
        clip_mask[:-1], clip_mask[1:])[:, None, None]
    if suppress_iou is not None:
        # [L, P, P] mean per-frame IoU between same-clip tubes, once
        tt = jnp.moveaxis(tubes, 1, 2)                     # [L, T, P, 4]
        intra = pairwise_iou(tt, tt).mean(axis=1)          # [L, P, P]

    def one(valid_carry, _):
        masked = jnp.where(valid_carry > 0, scores, NEG)
        masked = jnp.where(clip_mask[:, None] > 0, masked, 0.0)
        path, value = _viterbi(masked, trans, link_iou_weight)
        # was THIS clip's chosen node still unused? An exhausted clip (all
        # valid nodes consumed by earlier paths/suppression) forces the
        # path through a used node there — that CLIP must be trimmed out,
        # not the whole path: a real second actor may simply have no free
        # proposal in one clip (e.g. refinement collapsed every cuboid
        # onto the dominant actor for that window).
        sel_fresh = jnp.take_along_axis(
            valid_carry, path[:, None], axis=1)[:, 0] > 0   # [L]
        new_valid = valid_carry.at[jnp.arange(L), path].set(0.0)
        if suppress_iou is not None:
            overlap = intra[jnp.arange(L), path]           # [L, P]
            new_valid = jnp.where(overlap > suppress_iou, 0.0, new_valid)
        chosen = jnp.take_along_axis(scores, path[:, None], axis=1)[:, 0]
        return new_valid, (path, value, chosen, sel_fresh)

    _, (paths, values, chosen, fresh) = jax.lax.scan(one, valid, None,
                                                     length=k)

    # Temporal trim. Padded clips and exhausted-clip selections get a
    # penalty large enough that Kadane can never bridge one between two
    # strong real clips — a re-used node must never be emitted. A path
    # whose every clip is padded/exhausted (k exceeded the clip's valid
    # tube count everywhere) trims to nothing and scores 0.
    DEAD = -1e6
    trim_in = jnp.where((clip_mask[None, :] > 0) & fresh,
                        chosen - trim_thresh, DEAD)
    trim, best = jax.vmap(max_subarray_mask)(trim_in)
    # max_subarray_mask always keeps >= 1 element; zero the row when even
    # its best element is a dead slot
    alive = (best > 0.5 * DEAD).astype(trim.dtype)           # [K]
    trim = trim * alive[:, None]
    n_active = jnp.maximum(jnp.sum(trim, axis=1), 1.0)
    tube_scores = jnp.sum(chosen * trim, axis=1) / n_active

    # Exposed path value = the Viterbi objective restricted to the emitted
    # run (see docstring). `values` from the scan is the raw accumulator
    # and carries NEG through exhausted clips — keep it internal.
    del values

    def _trimmed_value(path, trim_row, chosen_row):
        tsel = trans[jnp.arange(L - 1), path[:-1], path[1:]]   # [L-1]
        pair = trim_row[:-1] * trim_row[1:]
        return (jnp.sum(chosen_row * trim_row)
                + link_iou_weight * jnp.sum(tsel * pair))

    values_out = jax.vmap(_trimmed_value)(paths, trim, chosen)
    return {"paths": paths, "values": values_out, "trim": trim,
            "tube_scores": tube_scores}


def link_tubes_multiclass(tubes, class_scores, valid=None,
                          link_iou_weight: float = 1.0,
                          stride: int | None = None):
    """Vectorize `link_tubes` over a class axis (single best path per class).

    Args:
      tubes: [L, P, T, 4]; class_scores: [L, P, C]; valid: [L, P] or None.
    Returns: paths [C, L] int32, values [C].
    """
    scores_cf = jnp.moveaxis(class_scores, -1, 0)  # [C, L, P]
    v = valid if valid is not None else jnp.ones(class_scores.shape[:2], class_scores.dtype)
    return jax.vmap(
        lambda s: link_tubes(tubes, s, v, link_iou_weight, stride))(scores_cf)


def link_tubes_multiclass_k(
    tubes, class_scores, valid=None, link_iou_weight: float = 1.0,
    k: int = 4, trim_thresh: float = 0.05, clip_mask=None,
    stride: int | None = None, suppress_iou: float | None = None,
):
    """Vectorize `link_tubes_k` over a class axis.

    Args:
      tubes: [L, P, T, 4]; class_scores: [L, P, C]; valid: [L, P] or None;
      clip_mask: [L] or None; stride: clip-tiling stride (video frames);
      suppress_iou: on-device duplicate-tube suppression (see link_tubes_k).
    Returns dict with leading class axis:
      paths [C, K, L], values [C, K], trim [C, K, L], tube_scores [C, K].
    """
    scores_cf = jnp.moveaxis(class_scores, -1, 0)  # [C, L, P]
    v = valid if valid is not None else jnp.ones(
        class_scores.shape[:2], class_scores.dtype)
    return jax.vmap(
        lambda s: link_tubes_k(tubes, s, v, link_iou_weight, k,
                               trim_thresh, clip_mask, stride, suppress_iou)
    )(scores_cf)
