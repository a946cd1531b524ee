"""Pallas TPU kernel: 3x3x3 stride-1 SAME max pool, VMEM-resident.

Reference parity: the Inception b3-branch pool (``models/i3dpt.py::
MaxPool3dTFPadding(3, 1)`` (recon)).

Why: profiling the detect program (round 2) showed the two b3-branch
pools inside the refinement scan cost ~11 ms/step at B=64 — XLA's
depthwise-conv reduce_window emitter re-reads several times the window
volume from HBM on the [1024, 5, 7, 7, 832] pooled-tube shape. This
kernel reads each input block into VMEM once, takes the 27 shifted maxes
in registers, and writes once: HBM traffic drops to read+write of the
tensor (~5x less).

Scope: window (3,3,3), stride (1,1,1), SAME (-inf padding) over
[N, T, H, W, C] — exactly the in-model b3 pools. Other window/stride
combinations keep the reduce_window path (models/i3d.py::max_pool_3d
dispatches).

MEASURED VERDICT (v5e, full detect program, ucf_3step, B=64, chained
20-iter): pallas pools 252.4 ms/batch vs XLA reduce_window 180.6 ms/batch
— the kernel LOSES end-to-end, same failure mode as fused_bn_relu
(config.py): a pallas_call is a fusion boundary, so XLA can no longer fuse
the pool into its conv/elementwise neighbors, and the pad+slice around the
call adds two HBM round-trips. The standalone HBM-traffic argument above
is real but smaller than the lost fusion. Default stays
STEP_TPU_POOL3D=direct; the kernel remains the parity-tested selectable
alternative for re-measurement on future XLA/Mosaic versions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128
NEG = float("-inf")


def _pool_kernel(x_ref, out_ref):
    """x block [NB, T+2, H+2, W+2, C] (pre-padded with -inf);
    out block [NB, T, H, W, C]."""
    x = x_ref[...]
    NB, Tp, Hp, Wp, C = x.shape
    T, H, W = Tp - 2, Hp - 2, Wp - 2
    acc = None
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                s = x[:, dt : dt + T, dh : dh + H, dw : dw + W, :]
                acc = s if acc is None else jnp.maximum(acc, s)
    out_ref[...] = acc


# Per-input-block VMEM budget. Measured on v5e: Mosaic's scoped-VMEM
# footprint for this kernel is ~6-8x the input block (double-buffered in
# and out blocks PLUS materialized shifted-slice temporaries for the 27-way
# max — a [64,9,28,28,256] bf16 pool with a 2.5 MB input block allocated
# 20.8 MB scoped and OOM'd the 16 MB limit). 1 MB per input block keeps the
# worst case ~8 MB. Shapes where even block_n=1 exceeds it (the backbone's
# 28x28 Mixed_3 pools) return None and callers fall back to reduce_window.
_VMEM_BLOCK_BUDGET = 1024 * 1024


def pick_block_n(shape, dtype, budget: int = _VMEM_BLOCK_BUDGET):
    """Largest block_n in {8,4,2,1} whose padded input block fits the VMEM
    budget, or None if none does."""
    N, T, H, W, C = shape
    itemsize = jnp.dtype(dtype).itemsize
    # the grid splits channels into LANES-wide blocks, so block C == LANES
    per_clip = (T + 2) * (H + 2) * (W + 2) * LANES * itemsize
    for bn in (8, 4, 2, 1):
        if bn * per_clip <= budget:
            return bn
    return None


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def max_pool3x3_same_pallas(
    x: jnp.ndarray,          # [N, T, H, W, C]
    block_n: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """3x3x3 / stride 1 / SAME max pool, bit-identical to
    ``lax.reduce_window(x, -inf, max, (1,3,3,3,1), (1,)*5, 'SAME')``."""
    N, T, H, W, C = x.shape
    pad_n = -N % block_n
    pad_c = -C % LANES
    xp = jnp.pad(
        x,
        ((0, pad_n), (1, 1), (1, 1), (1, 1), (0, pad_c)),
        constant_values=NEG,
    )
    Np, Cp = N + pad_n, C + pad_c
    out = pl.pallas_call(
        _pool_kernel,
        grid=(Np // block_n, Cp // LANES),
        in_specs=[
            pl.BlockSpec((block_n, T + 2, H + 2, W + 2, LANES),
                         lambda i, j: (i, 0, 0, 0, j)),
        ],
        out_specs=pl.BlockSpec((block_n, T, H, W, LANES),
                               lambda i, j: (i, 0, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((Np, T, H, W, Cp), x.dtype),
        interpret=interpret,
    )(xp)
    return out[:N, ..., :C]
