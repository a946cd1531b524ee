"""Batch assembly: proposals, GT-jitter augmentation.

Reference parity: the collate fn + in-loop proposal assembly of ``train.py``
(recon). The training trick of adding jittered copies of the GT tubes to the
proposal set (so later steps see near-positive anchors) fills the static
padding slots between the 11 initial cuboids and `max_proposals`.

Batches carry rgb as [0,1] float32 (or uint8 with `emit_uint8=True` for 4x
cheaper transfers); mean/std normalization happens ON DEVICE inside the
compiled detector (`step_tpu/preprocess.py`).
"""

from __future__ import annotations

import numpy as np

from step_tpu.config import StepConfig
from step_tpu.preprocess import RGB_MEAN as _RGB_MEAN
from step_tpu.preprocess import RGB_STD as _RGB_STD
from step_tpu.tubes.proposals import initial_cuboids_np

RGB_MEAN = np.asarray(_RGB_MEAN, np.float32)
RGB_STD = np.asarray(_RGB_STD, np.float32)


def normalize_rgb(rgb: np.ndarray) -> np.ndarray:
    """Host-side normalization — only for consumers that bypass the model's
    on-device preprocessing (kept for tooling/tests)."""
    return (rgb - RGB_MEAN) / RGB_STD


def rgb_to_uint8_wire(rgb: np.ndarray) -> np.ndarray:
    """THE [0,1]-float → uint8 wire quantizer (round half up).

    Single owner of the conversion so every surface that ships uint8
    (train/eval loaders, device-linking collector, serving) quantizes
    bit-identically — np.round's banker's rounding differs on exact .5
    ties and would silently break cross-surface parity."""
    return (np.clip(rgb, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def flow_to_int8_wire(flow: np.ndarray) -> np.ndarray:
    """THE [-1,1]-float → int8 wire quantizer (flow analog of the rgb
    uint8 path; same single-owner rationale). JPEG-sourced flow is already
    quantized at 1/127.5, so int8 is near-lossless (round() costs ≤1/254
    of the range; u8 levels 127/128 collapse to one code) and 4x cheaper
    to ship — dequantized on device by preprocess.device_preprocess_flow."""
    return np.clip(np.round(flow * 127.0), -127, 127).astype(np.int8)


def jitter_gt_proposals(
    gt_tubes: np.ndarray,   # [G, T, 4]
    gt_mask: np.ndarray,    # [G]
    num: int,
    image_size: float,
    rng: np.random.RandomState,
    jitter_frac: float = 0.1,
) -> tuple[np.ndarray, np.ndarray]:
    """Sample `num` jittered copies of valid GT tubes → ([num, T, 4], [num])."""
    T = gt_tubes.shape[1]
    out = np.zeros((num, T, 4), np.float32)
    mask = np.zeros((num,), np.float32)
    valid = np.flatnonzero(gt_mask > 0)
    if len(valid) == 0:
        return out, mask
    for i in range(num):
        g = valid[i % len(valid)]
        tube = gt_tubes[g].copy()
        w = tube[:, 2] - tube[:, 0]
        h = tube[:, 3] - tube[:, 1]
        # one whole-tube offset + scale jitter (keeps tube coherent in time)
        dx = rng.uniform(-jitter_frac, jitter_frac) * w.mean()
        dy = rng.uniform(-jitter_frac, jitter_frac) * h.mean()
        ds = 1.0 + rng.uniform(-jitter_frac, jitter_frac)
        cx = (tube[:, 0] + tube[:, 2]) / 2 + dx
        cy = (tube[:, 1] + tube[:, 3]) / 2 + dy
        nw, nh = w * ds / 2, h * ds / 2
        tube = np.stack([cx - nw, cy - nh, cx + nw, cy + nh], -1)
        out[i] = np.clip(tube, 0.0, image_size)
        mask[i] = 1.0
    return out, mask


def build_model_batch(
    raw: dict,
    cfg: StepConfig,
    train: bool = False,
    seed: int = 0,
    emit_uint8: bool = False,
) -> dict:
    """raw batch (rgb [B,T,H,W,3] in [0,1], gt_*) → model batch.

    Adds `proposals` [B, P, T, 4] (initial cuboids + optional jittered GT in
    the padding slots) and `prop_mask` [B, P]. rgb stays [0,1] float32 (or
    uint8 with `emit_uint8`) — the detector normalizes on device.
    """
    B, T = raw["rgb"].shape[:2]
    # numpy variant: the jnp version makes two host<->device round-trips per
    # call, which serialize behind batch transfers on the relay TPU
    # (measured 3.5 s/batch of pure stall — the round 2 training-throughput
    # bug). Proposal assembly must stay host-side.
    base_tubes, base_mask = initial_cuboids_np(cfg.image_size, T,
                                               cfg.max_proposals,
                                               cfg.cuboid_layout)
    proposals = np.tile(base_tubes[None], (B, 1, 1, 1))
    prop_mask = np.tile(base_mask[None], (B, 1))

    if train and cfg.gt_jitter_proposals > 0:
        rng = np.random.RandomState(seed)
        n_init = int(base_mask.sum())
        n_jit = min(cfg.gt_jitter_proposals, cfg.max_proposals - n_init)
        for b in range(B):
            jt, jm = jitter_gt_proposals(
                raw["gt_tubes"][b], raw["gt_mask"][b], n_jit, cfg.image_size, rng
            )
            proposals[b, n_init : n_init + n_jit] = jt
            prop_mask[b, n_init : n_init + n_jit] = jm

    # Pad (or truncate) GT to the static cfg.max_gt_tubes capacity so batch
    # shapes never depend on the dataset's own box cap.
    gt_tubes, gt_mask, labels = raw["gt_tubes"], raw["gt_mask"], raw["gt_labels"]
    G = cfg.max_gt_tubes
    if gt_tubes.shape[1] != G:
        def fit_g(x):
            if x.shape[1] >= G:
                return x[:, :G]
            pad = [(0, 0)] * x.ndim
            pad[1] = (0, G - x.shape[1])
            return np.pad(x, pad)

        gt_tubes, gt_mask, labels = fit_g(gt_tubes), fit_g(gt_mask), fit_g(labels)

    if emit_uint8:
        rgb_out = rgb_to_uint8_wire(raw["rgb"])
    else:
        rgb_out = raw["rgb"].astype(np.float32)
    batch = {
        "rgb": rgb_out,
        "proposals": proposals.astype(np.float32),
        "prop_mask": prop_mask.astype(np.float32),
        "gt_tubes": gt_tubes.astype(np.float32),
        "gt_mask": gt_mask.astype(np.float32),
    }
    if "flow" in raw:
        if emit_uint8:
            batch["flow"] = flow_to_int8_wire(raw["flow"])
        else:
            batch["flow"] = raw["flow"].astype(np.float32)
    if cfg.multilabel and labels.ndim == 2:
        # convert int labels to multi-hot if a multilabel dataset handed ints
        onehot = np.zeros((*labels.shape, cfg.num_classes), np.float32)
        for b in range(labels.shape[0]):
            for g in range(labels.shape[1]):
                if gt_mask[b, g] > 0:
                    onehot[b, g, int(labels[b, g])] = 1.0
        batch["gt_labels"] = onehot
    elif cfg.multilabel:
        batch["gt_labels"] = labels.astype(np.float32)
    else:
        batch["gt_labels"] = labels.astype(np.int32)
    return batch
