"""Per-step matching and losses for progressive training.

Reference parity: the in-loop matching + loss code of ``train.py`` (recon):
for every refinement step, proposals are matched to GT tubes by tube-IoU
with a per-step threshold (cascade-style), classification is CE over
classes+background (UCF softmax) or per-class BCE (AVA multilabel), and box
regression is smooth-L1 on the encoded deltas of positive proposals over the
step's active frames. Total loss is the per-step weighted sum.

Everything is masked/static-shaped: GT tubes are padded to G_max with a
validity mask, proposals to P_max; no boolean indexing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from step_tpu.config import StepConfig
from step_tpu.tubes.boxes import encode_boxes
from step_tpu.tubes.tube_ops import tube_iou

EPS = 1e-8
NEG_IOU_FOR_INVALID = -1.0


def smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Huber / smooth-L1, elementwise."""
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def match_tubes(
    proposals: jnp.ndarray,   # [P, T, 4]
    gt_tubes: jnp.ndarray,    # [G, T, 4]
    gt_mask: jnp.ndarray,     # [G]
    frame_mask: jnp.ndarray,  # [T]
    iou_threshold: float,
    prop_mask: jnp.ndarray | None = None,
    force_best_match: bool = True,
):
    """Match proposals to GT tubes by masked tube IoU.

    SSD-family bipartite forcing (the reference inherits it): in addition to
    the IoU>=threshold rule, every valid GT claims its single best proposal
    as positive regardless of IoU. Without this, the 11 coarse initial
    cuboids would never be supervised toward small GT boxes and inference
    (which starts from the cuboids alone) would collapse to background —
    observed exactly so before this fix.

    Returns (best_gt [P] int32, best_iou [P], positive [P] float).
    Padded GT slots never match; padded proposal slots never get forced.
    """
    iou = tube_iou(proposals, gt_tubes, frame_mask)          # [P, G]
    iou = jnp.where(gt_mask[None, :] > 0, iou, NEG_IOU_FOR_INVALID)
    if prop_mask is not None:
        iou = jnp.where(prop_mask[:, None] > 0, iou, NEG_IOU_FOR_INVALID)
    best_iou = jnp.max(iou, axis=-1)                         # [P]

    matched = iou
    if force_best_match:
        # Boost each GT's best proposal so it wins the threshold no matter
        # its raw IoU (scatter-add keeps everything static-shaped).
        best_p = jnp.argmax(iou, axis=0)                     # [G]
        boost = 2.0 * gt_mask                                # [G]
        matched = iou.at[best_p, jnp.arange(iou.shape[1])].add(boost)

    best_gt = jnp.argmax(matched, axis=-1).astype(jnp.int32)  # [P]
    match_val = jnp.max(matched, axis=-1)
    positive = (match_val >= iou_threshold).astype(jnp.float32)
    if prop_mask is not None:
        positive = positive * (prop_mask > 0)
    return best_gt, best_iou, positive


def _cls_loss_softmax(cls_logits, best_gt, positive, gt_labels, prop_mask,
                      neg_pos_ratio: float = 0.0):
    """UCF-style: softmax CE over [background + C] classes, with optional
    SSD-style hard-negative mining (keep the `neg_pos_ratio` hardest
    negatives per positive; essential at 11-proposal scale where plain mean
    CE drowns the 1-2 positives).

    gt_labels: [G] int32 foreground class in [0, C); background column is 0.
    """
    target_fg = jnp.take(gt_labels, best_gt) + 1             # [P]
    target = jnp.where(positive > 0, target_fg, 0)           # bg = 0
    logp = jax.nn.log_softmax(cls_logits, axis=-1)           # [P, C+1]
    ce = -jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]
    if neg_pos_ratio <= 0:
        return jnp.sum(ce * prop_mask) / jnp.maximum(jnp.sum(prop_mask), EPS)

    pos = positive * prop_mask                               # [P]
    neg = (1.0 - positive) * prop_mask
    num_pos = jnp.sum(pos)
    neg_ce = ce * neg
    # rank negatives by CE (hardest first) with pairwise comparisons
    harder = (neg_ce[None, :] > neg_ce[:, None]).astype(jnp.float32)
    rank = jnp.sum(harder * neg[None, :], axis=-1)           # [P]
    num_keep = neg_pos_ratio * jnp.maximum(num_pos, 1.0)
    keep_neg = neg * (rank < num_keep).astype(jnp.float32)
    total = jnp.sum(ce * pos) + jnp.sum(ce * keep_neg)
    return total / jnp.maximum(num_pos + jnp.sum(keep_neg), EPS)


def _cls_loss_sigmoid(cls_logits, best_gt, positive, gt_labels, prop_mask,
                      focal_gamma: float = 2.0, focal_alpha: float = 0.25):
    """AVA-style: per-class sigmoid BCE; positives take their GT multi-hot
    vector, negatives an all-zero target. gt_labels: [G, C] multi-hot float.

    Focal modulation + positive normalization (RetinaNet): plain
    mean-over-(P,C) BCE lets the all-zeros predictor nearly minimize the
    loss once C is large (at C=60 the 1-2 positive terms are diluted by
    P*C=660 — measured mAP collapse to 0.0 on the synthetic oracle,
    VALIDATION.md round 3). Loss = sum over (P, C) of (optionally focal)
    BCE, divided by the number of positive proposals (clamped to 1), the
    standard dense-sigmoid-detection normalization. focal_gamma=0 disables
    the modulation but keeps the normalization.
    """
    target = jnp.take(gt_labels, best_gt, axis=0)            # [P, C]
    target = target * positive[:, None]
    bce = jnp.maximum(cls_logits, 0) - cls_logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(cls_logits))
    )
    if focal_gamma > 0:
        p = jax.nn.sigmoid(cls_logits)
        p_t = p * target + (1.0 - p) * (1.0 - target)
        alpha_t = focal_alpha * target + (1.0 - focal_alpha) * (1.0 - target)
        bce = alpha_t * jnp.power(1.0 - p_t, focal_gamma) * bce
    per_prop = jnp.sum(bce, axis=-1)                         # [P]
    num_pos = jnp.maximum(jnp.sum(positive * prop_mask), 1.0)
    return jnp.sum(per_prop * prop_mask) / num_pos


def _reg_loss(deltas, proposals, best_gt, positive, gt_tubes, frame_mask,
              prop_mask, variances):
    """Smooth-L1 on encoded per-frame deltas of positive proposals."""
    matched_gt = jnp.take(gt_tubes, best_gt, axis=0)         # [P, T, 4]
    target = encode_boxes(matched_gt, proposals, variances)  # [P, T, 4]
    l1 = smooth_l1(deltas - target).sum(-1)                  # [P, T]
    w = positive * prop_mask                                  # [P]
    per_prop = jnp.sum(l1 * frame_mask[None, :], axis=-1) / jnp.maximum(
        jnp.sum(frame_mask), EPS
    )
    return jnp.sum(per_prop * w) / jnp.maximum(jnp.sum(w), EPS)


def step_losses(
    outputs: dict,
    gt_tubes: jnp.ndarray,    # [B, G, T, 4]
    gt_labels: jnp.ndarray,   # [B, G] int (softmax) or [B, G, C] (multilabel)
    gt_mask: jnp.ndarray,     # [B, G]
    prop_mask: jnp.ndarray,   # [B, P]
    cfg: StepConfig,
):
    """Total progressive loss + metrics over all refinement steps.

    `outputs` is the STEPDetector output dict (leading step axis S).
    """
    S = cfg.num_steps
    thresholds = jnp.asarray(cfg.iou_thresholds[:S], jnp.float32)
    weights = jnp.asarray(cfg.step_loss_weights[:S], jnp.float32)

    if cfg.multilabel:
        cls_fn = functools.partial(
            _cls_loss_sigmoid, focal_gamma=cfg.focal_gamma,
            focal_alpha=cfg.focal_alpha,
        )
    else:
        cls_fn = functools.partial(
            _cls_loss_softmax, neg_pos_ratio=cfg.neg_pos_ratio
        )

    def one_example_one_step(cls_logits, deltas, proposals, frame_mask, thr,
                             gt_t, gt_l, gt_m, p_m):
        best_gt, best_iou, positive = match_tubes(
            proposals, gt_t, gt_m, frame_mask, thr, prop_mask=p_m
        )
        # never match when example has no GT at all
        has_gt = (jnp.sum(gt_m) > 0).astype(jnp.float32)
        positive = positive * has_gt
        cls = cls_fn(cls_logits, best_gt, positive, gt_l, p_m)
        reg = _reg_loss(deltas, proposals, best_gt, positive, gt_t, frame_mask,
                        p_m, cfg.box_variances)
        reg = reg * has_gt
        return cls, reg, jnp.sum(positive)

    def one_step(s_out, thr):
        cls_logits, deltas, proposals, frame_mask = s_out
        cls, reg, npos = jax.vmap(
            one_example_one_step, in_axes=(0, 0, 0, None, None, 0, 0, 0, 0)
        )(cls_logits, deltas, proposals, frame_mask, thr,
          gt_tubes, gt_labels, gt_mask, prop_mask)
        return jnp.mean(cls), jnp.mean(reg), jnp.sum(npos)

    cls_l, reg_l, npos = jax.vmap(one_step)(
        (
            outputs["cls_logits"],
            outputs["deltas"],
            outputs["proposals"],
            outputs["frame_mask"],
        ),
        thresholds,
    )
    total = jnp.sum(weights * (cls_l + cfg.reg_loss_weight * reg_l))
    metrics = {
        "loss": total,
        "cls_loss_per_step": cls_l,
        "reg_loss_per_step": reg_l,
        "num_positive_per_step": npos,
    }
    return total, metrics
