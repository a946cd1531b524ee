"""Space-to-depth stem convolution — MXU-efficient first conv.

Reference parity: the reference's first I3D conv (``models/i3dpt.py::
Unit3Dpy Conv3d_1a_7x7`` (recon)) is a 7x7x7 stride-(2,2,2) conv over a
3-channel input. On the TPU MXU the 3 input channels pad to the 8-lane
tile, wasting >60% of the contraction. The standard TPU fix (used by the
public TPU detection/classification reference models) is an input
space-to-depth transform:

    x[B,T,H,W,C] --2x2 spatial blocks--> x'[B,T,H/2,W/2,4C]

after which the stride-(st,2,2) conv with a k_h x k_w spatial kernel is
EXACTLY a stride-(st,1,1) conv with a ceil(k/2)-tap kernel over 4C input
channels: output o(i) = sum_k x(2i + k - pad) w(k); writing k = 2m + r
maps tap k onto s2d row i+m, phase r, so taps regroup into kernel
positions (m, phase). 12 input channels tile the MXU ~2.7x better than 3.

The parameter keeps the ORIGINAL [kt, kh, kw, C, F] layout (checkpoint-
and converter-compatible); the rearrangement happens on the fly (a
constant-shaped transpose XLA hoists out of the conv's hot path).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# one definition of the TF-SAME rule — the s2d bit-equivalence proof
# below depends on matching conv3d.py exactly
from step_tpu.ops.conv3d import tf_same_pads


def space_to_depth_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[kt, kh, kw, C, F] -> [kt, ceil(kh/2), ceil(kw/2), 4C, F] matching the
    2x2 space-to-depth input layout (channel index = dy*2C + dx*C + c)."""
    kt, kh, kw, C, F = kernel.shape
    khp, kwp = (kh + 1) // 2, (kw + 1) // 2
    k = jnp.pad(kernel, ((0, 0), (0, 2 * khp - kh), (0, 2 * kwp - kw),
                         (0, 0), (0, 0)))
    k = k.reshape(kt, khp, 2, kwp, 2, C, F)
    k = k.transpose(0, 1, 3, 2, 4, 5, 6)        # (kt, m, n, dy, dx, C, F)
    return k.reshape(kt, khp, kwp, 4 * C, F)


def space_to_depth_conv3d(
    x: jnp.ndarray,        # [B, T, H, W, C]
    kernel: jnp.ndarray,   # [kt, kh, kw, C, F] — original (pre-s2d) layout
    stride: Tuple[int, int, int],
) -> jnp.ndarray:
    """Bit-equivalent to ``lax.conv_general_dilated(x, kernel,
    (st, 2, 2), 'SAME', NDHWC/DHWIO)`` — spatial stride must be (2, 2) —
    computed as a stride-(st,1,1) conv on the 2x2 space-to-depth input."""
    if stride[1] != 2 or stride[2] != 2:
        raise ValueError("space_to_depth_conv3d requires spatial stride (2, 2)")
    B, T, H, W, C = x.shape
    kt, kh, kw = kernel.shape[:3]
    st = stride[0]

    pl_h, pr_h = tf_same_pads(H, kh, 2)
    pl_w, pr_w = tf_same_pads(W, kw, 2)
    # s2d needs even extents; extra right-pad rows are never read by the
    # VALID conv below (output count stays ceil(H/2)).
    eh = (H + pl_h + pr_h) % 2
    ew = (W + pl_w + pr_w) % 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pl_h, pr_h + eh), (pl_w, pr_w + ew),
                     (0, 0)))
    Hp, Wp = xp.shape[2] // 2, xp.shape[3] // 2
    xs = xp.reshape(B, T, Hp, 2, Wp, 2, C)
    xs = xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, Hp, Wp, 4 * C)

    ks = space_to_depth_kernel(kernel)
    return jax.lax.conv_general_dilated(
        xs, ks,
        window_strides=(st, 1, 1),
        padding=(tf_same_pads(T, kt, st), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
