"""Evaluation: frame-mAP, video-mAP over linked tubes, AVA-style evaluator.

Reference parity: the vendored official AVA evaluator
(``external/ActivityNet/...`` (recon)) and the UCF101-24 frame-/video-mAP
code (``utils/`` (recon)). Evaluation is host-side numpy here too — it runs
once per epoch on detection dumps, not in the compiled hot path.
"""

from step_tpu.eval.detection_metrics import (  # noqa: F401
    average_precision,
    frame_map,
    video_map,
    spatio_temporal_iou,
)
from step_tpu.eval.ava_eval import ava_frame_map  # noqa: F401
from step_tpu.eval.detection_metrics import match_detections  # noqa: F401
from step_tpu.eval.calibration import (  # noqa: F401
    apply_calibration,
    fit_calibration,
)
