"""Training: per-step matching/losses, train state, pjit data-parallel trainer.

Reference parity: the loss computation and optimizer loop in ``train.py``
(recon) — S-step supervision with IoU matching per step, CE/BCE cls loss +
smooth-L1 box regression, summed over steps with per-step weights.
"""

from step_tpu.train.losses import step_losses, match_tubes, smooth_l1  # noqa: F401
from step_tpu.train.trainer import (  # noqa: F401
    TrainState,
    create_train_state,
    train_step,
    make_parallel_train_step,
)
