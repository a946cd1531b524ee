"""AVA v2.1-style frame-mAP evaluator.

Reference parity: the vendored ActivityNet/AVA toolkit evaluator
(``external/ActivityNet`` (recon), ``get_ava_performance``-style). The AVA
protocol is per-class all-point AP over keyframe detections at spatial IoU
0.5, multi-label (every (box, class) GT pair is a separate target), with an
optional excluded-keyframe list. Built on the same matching/AP core as the
UCF evaluator (`detection_metrics.frame_map`) — the protocols only differ in
bookkeeping, not math.

Keyframe keys are `(video_id, timestamp)` tuples; boxes are x1y1x2y2 (any
consistent scale — AVA uses normalized [0,1] coords, which IoU is invariant
to).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence, Set, Tuple

from step_tpu.eval.detection_metrics import frame_map


def ava_frame_map(
    detections: Sequence[Tuple],    # ((video, t), class_id, score, box[4])
    groundtruth: Sequence[Tuple],   # ((video, t), class_id, box[4])
    num_classes: int = 60,
    iou_threshold: float = 0.5,
    excluded_keyframes: Optional[Iterable[Tuple]] = None,
) -> Dict:
    """AVA frame-mAP@IoU. Returns {'mAP', 'ap_per_class', 'num_gt'}."""
    excluded: Set[Tuple] = set(excluded_keyframes or ())
    if excluded:
        detections = [d for d in detections if d[0] not in excluded]
        groundtruth = [g for g in groundtruth if g[0] not in excluded]
    return frame_map(detections, groundtruth, num_classes, iou_threshold)


def parse_ava_csv_rows(rows: Iterable[Sequence], with_scores: bool):
    """Convert AVA CSV rows (video_id, t, x1, y1, x2, y2, action_id[, score])
    to evaluator tuples. Action ids in AVA are 1-based → stored 0-based."""
    out = []
    for r in rows:
        key = (r[0], float(r[1]))
        box = [float(r[2]), float(r[3]), float(r[4]), float(r[5])]
        cls = int(r[6]) - 1
        if with_scores:
            out.append((key, cls, float(r[7]), box))
        else:
            out.append((key, cls, box))
    return out
