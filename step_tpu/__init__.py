"""step_tpu — a TPU-native spatio-temporal progressive action-detection framework.

Rebuilds the capabilities of NVlabs/STEP (CVPR 2019) as an idiomatic
JAX/XLA/Pallas/pjit design: video clips in, scored per-frame action tubes out.

Layer map (mirrors SURVEY.md §1, TPU-native equivalents):

  L0  ops/            Pallas TPU kernels + pure-jnp references
                      (ROI align gather-pool, batched masked NMS, fused BN+ReLU)
  L2  models/         I3D backbone (flax), detection heads, progressive detector
  L3  data/           datasets (UCF101-24 / AVA / synthetic), tube-aware augs
  L4  train/, eval/   training loop + losses, mAP evaluators
  L5  tubes/          tube IoU, box encode/decode, temporal extrapolation, linking
  L∥  parallel/       device mesh + sharding specs (pjit DP over ICI)

Reference parity notes cite the public NVlabs/STEP layout as
``path/file.py::Symbol (recon)`` — the reference mount was empty during the
survey (see SURVEY.md provenance warning), so line numbers are not available.
"""

__version__ = "0.1.0"

from step_tpu.config import StepConfig, PRESETS  # noqa: F401
