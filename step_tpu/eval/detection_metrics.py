"""Detection metrics: VOC-style AP, frame-mAP, tube video-mAP.

Reference parity: UCF101-24 frame-mAP@0.5 and video-mAP@{0.2,0.5,0.5:0.95}
(``test.py`` + ``utils`` eval code (recon)). Conventions follow the standard
UCF101-24 protocol:

  * frame-mAP: per-class all-point-interpolated AP over per-frame boxes at
    spatial IoU >= thresh; each GT box matches at most one detection
    (greedy, detections sorted by score).
  * video-mAP: AP over video-long tubes; spatio-temporal tube IoU =
    temporal IoU (frame-span overlap) x mean spatial IoU over the
    intersection frames.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Sequence, Tuple

import numpy as np

Box = np.ndarray  # [4] x1y1x2y2


def _iou_1vsN(box: Box, boxes: np.ndarray) -> np.ndarray:
    if len(boxes) == 0:
        return np.zeros((0,), np.float32)
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(a + b - inter, 1e-8)


def average_precision(scores: np.ndarray, tp: np.ndarray, num_gt: int) -> float:
    """All-point interpolated AP (VOC 2010+ / COCO style, no sampling)."""
    if num_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores)
    tp = tp[order].astype(np.float64)
    fp = 1.0 - tp
    ctp, cfp = np.cumsum(tp), np.cumsum(fp)
    recall = ctp / num_gt
    precision = ctp / np.maximum(ctp + cfp, 1e-8)
    # envelope
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    # integrate over recall deltas
    r = np.concatenate([[0.0], recall])
    return float(np.sum((r[1:] - r[:-1]) * precision))


# ------------------------------------------------------------ greedy matcher

def _class_matches(dets, gt_map, ious_fn):
    """Per-detection GT IoU rows, threshold-independent: for each
    (score, key, payload) in `dets` (sorted by descending score), the IoU
    vector against `gt_map[key]`. Shared by the frame and video matchers
    (and reused across thresholds by `video_map_range`)."""
    return [(key, ious_fn(payload, gt_map.get(key, [])))
            for _score, key, payload in dets]


def _greedy_tp(matches, gt_map, iou_threshold):
    """Official VOC/AVA consumption rule: each detection (descending
    score) matches its SINGLE best-IoU GT; if that best GT is already
    claimed the detection is an FP — no reassignment to the second-best.
    (The lenient best-UNUSED-GT variant systematically inflates TP counts
    vs the official evaluators; fixed round 3.)"""
    used = {k: np.zeros(len(v), bool) for k, v in gt_map.items()}
    tp = np.zeros(len(matches), bool)
    for i, (key, ious) in enumerate(matches):
        if ious.size == 0:
            continue
        j = int(np.argmax(ious))
        if ious[j] >= iou_threshold and not used[key][j]:
            tp[i] = True
            used[key][j] = True
    return tp


def _frame_ious(box, gts):
    return _iou_1vsN(box, np.stack(gts)) if len(gts) else np.zeros(0, np.float32)


def _tube_ious(tube, gts):
    return np.asarray([spatio_temporal_iou(tube, g) for g in gts], np.float32)


# ---------------------------------------------------------------- frame mAP

def match_detections(
    detections: Sequence[Tuple],   # (frame_key, class_id, score, box[4])
    groundtruth: Sequence[Tuple],  # (frame_key, class_id, box[4])
    num_classes: int,
    iou_threshold: float = 0.5,
) -> Dict:
    """Greedy per-class detection↔GT matching (the VOC protocol core).

    Returns {cls: (scores [N], tp [N] bool)} plus the per-class GT counts —
    shared by `frame_map` (AP) and the per-class score calibration fitter
    (eval/calibration.py), so both label TPs identically.
    """
    gt_by_cf = defaultdict(list)
    gt_count = np.zeros(num_classes, np.int64)
    for frame_key, cls, box in groundtruth:
        gt_by_cf[(cls, frame_key)].append(np.asarray(box, np.float32))
        gt_count[cls] += 1

    det_by_class = defaultdict(list)
    for frame_key, cls, score, box in detections:
        det_by_class[cls].append((float(score), frame_key, np.asarray(box, np.float32)))

    matched = {}
    for cls in range(num_classes):
        dets = [(s, (cls, fk), box)
                for s, fk, box in sorted(det_by_class[cls],
                                         key=lambda d: -d[0])]
        gt_map = {k: v for k, v in gt_by_cf.items() if k[0] == cls}
        scores = np.asarray([d[0] for d in dets], np.float32)
        tp = _greedy_tp(_class_matches(dets, gt_map, _frame_ious),
                        gt_map, iou_threshold)
        matched[cls] = (scores, tp)
    return {"matched": matched, "num_gt": gt_count}


def frame_map(
    detections: Sequence[Tuple],   # (frame_key, class_id, score, box[4])
    groundtruth: Sequence[Tuple],  # (frame_key, class_id, box[4])
    num_classes: int,
    iou_threshold: float = 0.5,
) -> Dict:
    """Frame-level mean AP. Returns {'mAP', 'ap_per_class', 'num_gt'}."""
    m = match_detections(detections, groundtruth, num_classes, iou_threshold)
    gt_count = m["num_gt"]
    ap = np.full(num_classes, np.nan, np.float64)
    for cls in range(num_classes):
        scores, tp = m["matched"][cls]
        ap[cls] = average_precision(scores, tp, int(gt_count[cls]))

    valid = ~np.isnan(ap)
    return {
        "mAP": float(np.mean(ap[valid])) if valid.any() else 0.0,
        "ap_per_class": ap,
        "num_gt": gt_count,
    }


# ---------------------------------------------------------------- video mAP

def spatio_temporal_iou(
    tube_a: Dict[int, Box], tube_b: Dict[int, Box]
) -> float:
    """UCF101-24 tube IoU: temporal IoU x mean spatial IoU on shared frames."""
    frames_a, frames_b = set(tube_a), set(tube_b)
    inter_frames = frames_a & frames_b
    union_frames = frames_a | frames_b
    if not inter_frames:
        return 0.0
    t_iou = len(inter_frames) / len(union_frames)
    s_iou = np.mean(
        [float(_iou_1vsN(np.asarray(tube_a[f]), np.asarray(tube_b[f])[None])[0])
         for f in sorted(inter_frames)]
    )
    return float(t_iou * s_iou)


def _video_prep(pred_tubes, gt_tubes, num_classes):
    """Per-class (scores, matches, gt_map) with tube IoUs computed ONCE —
    the IoU rows are threshold-independent, so the 0.5:0.95 sweep reuses
    them instead of recomputing every spatio_temporal_iou 10x."""
    gt_by_cv = defaultdict(list)
    gt_count = np.zeros(num_classes, np.int64)
    for vid, cls, tube in gt_tubes:
        gt_by_cv[(cls, vid)].append(tube)
        gt_count[cls] += 1

    det_by_class = defaultdict(list)
    for vid, cls, score, tube in pred_tubes:
        det_by_class[cls].append((float(score), vid, tube))

    per_class = []
    for cls in range(num_classes):
        dets = [(s, (cls, vid), tube)
                for s, vid, tube in sorted(det_by_class[cls],
                                           key=lambda d: -d[0])]
        gt_map = {k: v for k, v in gt_by_cv.items() if k[0] == cls}
        scores = np.asarray([d[0] for d in dets], np.float32)
        per_class.append(
            (scores, _class_matches(dets, gt_map, _tube_ious), gt_map))
    return per_class, gt_count


def _video_map_at(per_class, gt_count, num_classes, iou_threshold) -> Dict:
    ap = np.full(num_classes, np.nan, np.float64)
    for cls, (scores, matches, gt_map) in enumerate(per_class):
        tp = _greedy_tp(matches, gt_map, iou_threshold)
        ap[cls] = average_precision(scores, tp, int(gt_count[cls]))
    valid = ~np.isnan(ap)
    return {
        "mAP": float(np.mean(ap[valid])) if valid.any() else 0.0,
        "ap_per_class": ap,
        "num_gt": gt_count,
    }


def video_map(
    pred_tubes: Sequence[Tuple],  # (video_id, class_id, score, {frame: box})
    gt_tubes: Sequence[Tuple],    # (video_id, class_id, {frame: box})
    num_classes: int,
    iou_threshold: float = 0.5,
) -> Dict:
    """Video-level tube mAP at a spatio-temporal IoU threshold."""
    per_class, gt_count = _video_prep(pred_tubes, gt_tubes, num_classes)
    return _video_map_at(per_class, gt_count, num_classes, iou_threshold)


def video_map_range(
    pred_tubes, gt_tubes, num_classes,
    thresholds=tuple(np.arange(0.5, 1.0, 0.05)),
) -> float:
    """COCO-style averaged video-mAP (the 0.5:0.95 column)."""
    per_class, gt_count = _video_prep(pred_tubes, gt_tubes, num_classes)
    vals = [_video_map_at(per_class, gt_count, num_classes, float(t))["mAP"]
            for t in thresholds]
    return float(np.mean(vals))
