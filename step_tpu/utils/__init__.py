"""Utilities: CPU-side init, checkpointing, metrics, visualization."""

from step_tpu.utils.init import init_detector_cpu  # noqa: F401
