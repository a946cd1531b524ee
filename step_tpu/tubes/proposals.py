"""Initial proposal cuboids.

Reference parity: STEP paper §3.1 / ``train.py`` (recon) — the detector
starts from **11 hand-placed cuboids** that tile the frame and are constant
across time (the headline efficiency claim vs. RPN methods: 11 proposals
instead of thousands). The exact 11 rectangles are a fixed design choice;
we use a deterministic coarse tiling with the same coverage intent:

  1 full-frame box
  4 corner boxes at 0.5 scale (2x2 grid)
  4 edge-centered boxes at 0.5 scale
  2 centered boxes at 0.75 and 0.5 scale
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def initial_cuboids_np(
    image_size: float,
    num_frames: int,
    max_proposals: int | None = None,
    layout: str = "default",
) -> tuple[np.ndarray, np.ndarray]:
    """`initial_cuboids` as host numpy arrays (read-only, memoized).

    The host data pipeline calls this once per batch; returning device
    arrays here was measured to cost ~3.5 s/batch on the relay-tunneled
    TPU (two tiny host<->device round-trips serialized behind the batch
    transfers). Pure numpy keeps proposal assembly off-device entirely.
    """
    s = float(image_size)
    boxes = [(0.0, 0.0, 1.0, 1.0)]  # full frame
    if layout == "grid3":
        # 3x3 half-scale grid + centered 0.75 box (11 total) — the
        # cuboid-layout sensitivity variant (VALIDATION.md A/B; the
        # reference's exact 11 rectangles are a reconstruction risk).
        for cx in (0.25, 0.5, 0.75):
            for cy in (0.25, 0.5, 0.75):
                boxes.append((cx - 0.25, cy - 0.25, cx + 0.25, cy + 0.25))
        boxes.append((0.125, 0.125, 0.875, 0.875))
    elif layout == "default":
        # 2x2 corner grid at 0.5 scale
        for cx in (0.25, 0.75):
            for cy in (0.25, 0.75):
                boxes.append((cx - 0.25, cy - 0.25, cx + 0.25, cy + 0.25))
        # edge-centered half boxes
        for cx, cy in ((0.5, 0.25), (0.5, 0.75), (0.25, 0.5), (0.75, 0.5)):
            boxes.append((cx - 0.25, cy - 0.25, cx + 0.25, cy + 0.25))
        # centered boxes at 0.75 and 0.5 scale
        for half in (0.375, 0.25):
            boxes.append((0.5 - half, 0.5 - half, 0.5 + half, 0.5 + half))
    else:
        raise ValueError(f"unknown cuboid layout {layout!r}")

    arr = np.asarray(boxes, np.float32) * s  # [11, 4]
    P = arr.shape[0]
    cap = max_proposals or P
    if cap < P:
        raise ValueError(f"max_proposals={cap} < {P} initial cuboids")
    padded = np.zeros((cap, 4), np.float32)
    padded[:P] = arr
    # Padding rows get a tiny centered box (valid geometry, masked out).
    padded[P:] = np.asarray([s * 0.49, s * 0.49, s * 0.51, s * 0.51], np.float32)
    mask = np.zeros((cap,), np.float32)
    mask[:P] = 1.0
    tubes = np.broadcast_to(padded[:, None, :], (cap, num_frames, 4)).copy()
    tubes.flags.writeable = False   # memoized — guard against aliasing
    mask.flags.writeable = False
    return tubes, mask


def initial_cuboids(
    image_size: float,
    num_frames: int,
    max_proposals: int | None = None,
    layout: str = "default",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build the 11 initial cuboids, optionally padded to a static capacity.

    Returns:
      tubes: [P, T, 4] — identical box replicated across T frames.
      mask:  [P] float — 1 for the 11 real proposals, 0 for padding.
    """
    tubes, mask = initial_cuboids_np(image_size, num_frames, max_proposals,
                                     layout)
    return jnp.asarray(tubes), jnp.asarray(mask)
