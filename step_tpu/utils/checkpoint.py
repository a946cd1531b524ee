"""Checkpoint save/restore with Orbax.

Reference parity: ``train.py``'s ``torch.save({'epoch', model state_dicts,
'optimizer'})`` + ``--resume`` (recon). TPU-native upgrade: Orbax handles
the full train state (params + BN stats + optimizer + step) **and** the
data-iterator position, so a preempted job resumes exactly — the auxiliary
"checkpoint/resume" subsystem SURVEY §5 requires.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from step_tpu.train.trainer import TrainState


def _normalize_iter_state(data_iter_state: Optional[dict]) -> dict:
    """Fixed data-iterator schema so save/restore templates always match.

    `epoch` + `batch_index` pin the exact position inside the deterministic
    per-epoch batch order (DataLoader shuffles with seed+epoch), so fit()
    resumes mid-epoch without replaying already-seen batches.
    """
    out = {"epoch": 0, "batch_index": 0}
    if data_iter_state:
        for k in out:
            if k in data_iter_state:
                out[k] = int(data_iter_state[k])
    return out


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(
    ckpt_dir: str,
    state: TrainState,
    data_iter_state: Optional[dict] = None,
    max_to_keep: int = 3,
    wait: bool = True,
) -> int:
    """Save train state. Waits for durability by default (each call opens a
    fresh CheckpointManager, so an un-awaited async save could be left
    half-finalized when the manager closes). Returns the step saved."""
    step = int(state.step)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "data_iter": _normalize_iter_state(data_iter_state),
    }
    mngr = _manager(ckpt_dir, max_to_keep)
    mngr.save(step, args=ocp.args.StandardSave(payload))
    if wait:
        mngr.wait_until_finished()
    mngr.close()
    return step


def restore_checkpoint(
    ckpt_dir: str,
    state: TrainState,
    step: Optional[int] = None,
):
    """Restore into a template `state` (from `create_train_state`).

    Returns (state, data_iter_state). Raises FileNotFoundError if empty.
    """
    mngr = _manager(ckpt_dir)
    target_step = step if step is not None else mngr.latest_step()
    if target_step is None:
        mngr.close()
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "data_iter": _normalize_iter_state(None),
    }
    restored = mngr.restore(target_step, args=ocp.args.StandardRestore(template))
    mngr.close()
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, restored["data_iter"]
