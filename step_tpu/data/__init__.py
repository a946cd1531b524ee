"""Data: datasets (synthetic / UCF101-24 / AVA), tube-aware augmentation,
batching pipeline.

Reference parity: ``data/`` (recon) — ``ava.py`` (AVADataset),
``customize.py`` (UCF/custom frame datasets), ``augmentations.py``
(tube-consistent video augmentation). TPU-native notes: the pipeline emits
fixed-capacity padded batches (GT padded to G_max with masks) so the
compiled program never sees a dynamic shape; augmentation is pure-numpy on
host (cheap) while normalization runs on device inside the jitted step.
"""

from step_tpu.data.synthetic import SyntheticConfig, make_clip, make_batch  # noqa: F401
