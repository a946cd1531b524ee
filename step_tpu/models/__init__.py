"""Model components: I3D backbone, detection heads, progressive detector.

TPU-native rebuild of the reference's ``models/`` (recon):
  i3d.py       — Inflated-3D Inception backbone (``models/i3dpt.py::I3D``)
  nets.py      — feature extractor / ROI pooling / two-branch heads / context
                 (``models/networks.py::BaseNet/ROINet/TwoBranchNet/ContextNet``)
  detector.py  — the progressive refinement loop as a fixed-trip `lax.scan`
                 (reference: the per-step Python loop in ``train.py``)
"""

from step_tpu.models.i3d import I3DStem, I3DTail, I3DClassifier  # noqa: F401
