"""Inference: clip detection and streaming video detection — one compiled
program each.

Reference parity: ``test.py`` (recon) — run the progressive forward, score,
per-class per-frame NMS, then (for video mAP) link detections across clips.
TPU-native: score transform + NMS + linking all execute on device inside the
same jit as the network forward (the reference crosses host↔GPU between
forward, NMS, and host-side linking).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from step_tpu.config import StepConfig
from step_tpu.models.detector import STEPDetector
from step_tpu.ops.nms import batched_nms
from step_tpu.tubes.linking import link_tubes_multiclass


def class_scores_from_logits(cls_logits: jnp.ndarray, cfg: StepConfig) -> jnp.ndarray:
    """[..., ncls] logits → [..., C] foreground probabilities."""
    if cfg.multilabel:
        return jax.nn.sigmoid(cls_logits)
    probs = jax.nn.softmax(cls_logits, axis=-1)
    return probs[..., 1:]  # drop background column


def nms_surface(
    tubes: jnp.ndarray,        # [B, P, T, 4]
    scores: jnp.ndarray,       # [B, P, C] — already masked to real proposals
    prop_mask: jnp.ndarray,    # [B, P]
    cfg: StepConfig,
):
    """Per-frame per-class NMS over final tubes → the detection surface."""
    # No more than P proposals can survive NMS — never scan past that.
    max_keep = min(cfg.max_detections, tubes.shape[1])

    def per_frame(boxes_t, scores_b, mask_b):
        # boxes_t [P,4], scores_b [P,C]
        keep_idx, keep_mask = batched_nms(
            boxes_t, scores_b, cfg.nms_thresh, max_keep,
            cfg.score_thresh, mask_b,
        )                                            # [C,K]
        kept_boxes = jnp.take(boxes_t, keep_idx.reshape(-1), axis=0).reshape(
            *keep_idx.shape, 4
        )
        kept_scores = jnp.take_along_axis(
            scores_b.T, keep_idx, axis=1
        )                                            # [C,K]
        return kept_boxes, kept_scores * keep_mask, keep_mask

    def per_example(tubes_b, scores_b, mask_b):
        boxes_tf = jnp.swapaxes(tubes_b, 0, 1)       # [T, P, 4]
        return jax.vmap(per_frame, in_axes=(0, None, None))(boxes_tf, scores_b, mask_b)

    frame_boxes, frame_scores, frame_mask = jax.vmap(per_example)(
        tubes, scores, prop_mask
    )
    return {
        "tubes": tubes,
        "tube_scores": scores,
        "frame_boxes": frame_boxes,
        "frame_scores": frame_scores,
        "frame_mask": frame_mask,
    }


def detect_clip(
    variables,
    rgb: jnp.ndarray,          # [B, T, H, W, 3]
    proposals: jnp.ndarray,    # [B, P, T, 4]
    prop_mask: jnp.ndarray,    # [B, P]
    cfg: StepConfig,
    model: Optional[STEPDetector] = None,
    flow: Optional[jnp.ndarray] = None,
):
    """Full detection for a batch of clips.

    Returns dict:
      tubes        [B, P, T, 4] — final refined tubes
      tube_scores  [B, P, C]    — per-tube class probabilities
      frame_boxes  [B, T, C, K, 4], frame_scores [B, T, C, K],
      frame_mask   [B, T, C, K] — per-frame per-class NMS survivors
    """
    model = model or STEPDetector(cfg)
    outputs = model.apply(variables, rgb, proposals, flow, train=False)
    tubes = outputs["tubes"][-1]                     # [B, P, T, 4]
    scores = class_scores_from_logits(outputs["cls_logits"][-1], cfg)  # [B,P,C]
    # Padding proposal slots are never supervised — their logits are
    # arbitrary. Zero them at the surface so every consumer (linking,
    # thresholds, users reading tube_scores) sees only real proposals.
    scores = scores * prop_mask[..., None]
    return nms_surface(tubes, scores, prop_mask, cfg)


def detect_clip_late_fusion(
    variables_rgb,
    variables_flow,
    rgb: jnp.ndarray,          # [B, T, H, W, 3]
    flow: jnp.ndarray,         # [B, T, H, W, 2] in [-1, 1]
    proposals: jnp.ndarray,    # [B, P, T, 4]
    prop_mask: jnp.ndarray,    # [B, P]
    cfg: StepConfig,
    model_rgb: Optional[STEPDetector] = None,
    model_flow: Optional[STEPDetector] = None,
):
    """Reference two-stream protocol (``test.py`` two-stream path (recon)):
    two SEPARATE single-stream detectors, class scores fused pre-NMS.

    Both streams refine the same initial cuboids, so per-proposal score
    correspondence is meaningful; fused score = w * p_rgb + (1-w) * p_flow
    (w = cfg.late_fusion_weight). Boxes come from the appearance (RGB)
    stream, which localizes; flow mainly sharpens classification — the
    paper's own ablation reads the same way. Runs as one compiled program.
    """
    cfg_rgb = cfg.replace(two_stream=False, input_stream="rgb")
    cfg_flow = cfg.replace(two_stream=False, input_stream="flow")
    model_rgb = model_rgb or STEPDetector(cfg_rgb)
    model_flow = model_flow or STEPDetector(cfg_flow)

    out_rgb = model_rgb.apply(variables_rgb, rgb, proposals, None, train=False)
    out_flow = model_flow.apply(variables_flow, flow, proposals, None, train=False)

    w = cfg.late_fusion_weight
    scores = (
        w * class_scores_from_logits(out_rgb["cls_logits"][-1], cfg)
        + (1.0 - w) * class_scores_from_logits(out_flow["cls_logits"][-1], cfg)
    )
    scores = scores * prop_mask[..., None]
    return nms_surface(out_rgb["tubes"][-1], scores, prop_mask, cfg)


def make_detect_fn(cfg: StepConfig, model: Optional[STEPDetector] = None):
    """jit-wrapped `detect_clip` closed over the config."""
    model = model or STEPDetector(cfg)

    @jax.jit
    def _detect(variables, rgb, proposals, prop_mask, flow=None):
        return detect_clip(variables, rgb, proposals, prop_mask, cfg, model, flow)

    return _detect


def detect_video(
    variables,
    clips: jnp.ndarray,        # [L, T, H, W, 3] — a video tiled into L clips
    cfg: StepConfig,
    model: Optional[STEPDetector] = None,
    flow: Optional[jnp.ndarray] = None,
):
    """Streaming inference (BASELINE config 4): detect every clip (batched),
    then link per-clip tubes into video tubes on device.

    Returns dict with per-clip detections plus:
      link_paths  [C, L] int32 — chosen tube index per clip per class
      link_scores [C]          — path score (higher = stronger video tube)
    """
    model = model or STEPDetector(cfg)
    L = clips.shape[0]
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, L)
    det = detect_clip(variables, clips, proposals, prop_mask, cfg, model, flow)
    paths, values = link_tubes_multiclass(
        det["tubes"], det["tube_scores"], prop_mask, cfg.link_iou_weight
    )
    det["link_paths"] = paths
    det["link_scores"] = values
    return det


def make_detect_video_fn(cfg: StepConfig, model: Optional[STEPDetector] = None):
    model = model or STEPDetector(cfg)

    @jax.jit
    def _detect(variables, clips, flow=None):
        return detect_video(variables, clips, cfg, model, flow)

    return _detect
