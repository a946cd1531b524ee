"""Tube geometry: box math, tube IoU, temporal extrapolation, linking.

TPU-native rebuild of the reference's ``utils/tube_utils.py`` (recon) — every
function here is pure jnp over static shapes so it traces into the compiled
detector program (no host round-trips, unlike the reference's numpy helpers).
"""

from step_tpu.tubes.boxes import (  # noqa: F401
    box_area,
    pairwise_iou,
    encode_boxes,
    decode_boxes,
    clip_boxes,
)
from step_tpu.tubes.tube_ops import (  # noqa: F401
    tube_iou,
    extrapolate_tubes,
    valid_tube_mask,
)
from step_tpu.tubes.proposals import initial_cuboids  # noqa: F401
from step_tpu.tubes.linking import link_tubes  # noqa: F401
