"""Compute ops: pure-jnp references + Pallas TPU kernels.

TPU-native replacement for the reference's vendored CUDA extension
(``external/maskrcnn_benchmark/csrc/`` (recon)): ROI align becomes a
gather-pool expressed in jnp (XLA) with a Pallas kernel for the hot path,
NMS becomes a fixed-iteration masked scan that runs on device.
"""

from step_tpu.ops.roi_align import roi_align, tube_roi_align  # noqa: F401
from step_tpu.ops.nms import nms, batched_nms  # noqa: F401
from step_tpu.ops.conv3d import conv3d_same  # noqa: F401
