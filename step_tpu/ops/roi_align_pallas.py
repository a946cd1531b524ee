"""Pallas TPU kernel: tube-of-interest ROI-align as one fused MXU matmul.

The north-star TPU-native replacement for the reference's CUDA ROIAlign
(``external/maskrcnn_benchmark/csrc/cuda/ROIAlign_cuda.cu`` (recon)).

A scalar gather-pool kernel is the GPU idiom; on TPU, dynamic scalar
indexing of VMEM sublanes is alignment-restricted (Mosaic rejects it) and
gathers waste the MXU. The bilinear sample at clamped coordinate c is the
hat function (1 - |c - h|)+ over grid points, so ROI-align is exactly a
pair of interpolation matrices (see ``roi_align.roi_align_matmul``).

Kernel history (all timings: v5e, B=8, N=16, T'=5, C=832, bf16, chained
dependency timing — `scripts/bench_roi.py`):
  * v2 kept the feature slice VMEM-resident and `fori`-looped over tubes,
    issuing 2N tiny dots per program (K = H ≈ 14): the MXU idled.
  * v3 (this kernel) folds ALL tubes/bins into ONE contraction per (b, t')
    program over prebuilt Kronecker weights

        K2[(n,p,q), (h,w)] = A_y[n,p,h] * A_x[n,q,w]

    i.e. ``out[(n,p,q), c] = K2 · feat[(h,w), c]`` — an
    [N*P*P, H*W] x [H*W, C] matmul (M=784, K=196, N=832): a well-shaped
    MXU tile instead of 2N K=14 slivers. K2 is built OUTSIDE the kernel in
    XLA (Mosaic rejects the [N,P,P,H,W]→[NPP,HW] trailing-dim reshape and
    multi-dim `dot_general` contractions in-kernel).

    Measured: separable XLA matmul path 41.3 ms; this kernel 3.43 ms
    (12.1x); the SAME Kronecker contraction as a plain XLA einsum
    (`roi_align.batched_tube_roi_align_kron`) 2.34 ms (17.6x) — XLA
    pipelines the batched matmul better than the one-program-per-(b,t')
    grid, so **"kron" is the default `roi_impl`** and this kernel remains
    the selectable, parity-tested alternative.

Semantics match the Detectron reference (same hat weights, clamping,
out-of-range masking); the fused contraction reassociates the (h, w) sum,
so parity vs the two-stage reference is allclose (1e-4 tests), not
bit-exact.

Backward: custom VJP through XLA autodiff of the jnp reference (identical
math → exact gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from step_tpu.ops.roi_align import tube_roi_align as _tube_roi_align_ref


def _kernel_kron_matmul(k2_ref, feat_ref, out_ref):
    """Grid (B, T'): k2 block [1, 1, R, K] (prebuilt Kronecker weights),
    feature block [1, 1, K, C] (flattened (h, w)), output [1, 1, R, C].
    One MXU contraction per program; the weight construction happens
    outside the kernel (XLA), where reshapes are unrestricted."""
    out_ref[0, 0] = jax.lax.dot_general(
        k2_ref[0, 0],
        feat_ref[0, 0].astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _tube_roi_align_pallas_raw(
    features: jnp.ndarray,   # [B, T', H, W, C]
    boxes: jnp.ndarray,      # [B, N, T', 4] — per-slice boxes
    pooled: int,
    scale: float,
    ratio: int,
) -> jnp.ndarray:
    from step_tpu.ops.roi_align import kron_interp_weights

    B, Tp, H, W, C = features.shape
    N = boxes.shape[1]
    R, K = N * pooled * pooled, H * W
    boxes_tn = jnp.swapaxes(boxes, 1, 2)                    # [B, T', N, 4]
    k2 = kron_interp_weights(boxes_tn, pooled, scale, ratio, H, W)  # [B,T',R,K]
    feat2 = features.reshape(B, Tp, K, C)
    out = pl.pallas_call(
        _kernel_kron_matmul,
        grid=(B, Tp),
        in_specs=[
            pl.BlockSpec(
                (1, 1, R, K), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, K, C), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, R, C), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tp, R, C), features.dtype),
    )(k2, feat2)
    out = out.reshape(B, Tp, N, pooled, pooled, C)
    return jnp.swapaxes(out, 1, 2)                          # [B, N, T', P, P, C]


def tube_roi_align_pallas(
    features: jnp.ndarray,   # [B, T', H, W, C]
    tubes: jnp.ndarray,      # [B, N, T, 4] — per-frame boxes
    pooled_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Batched tube-of-interest pooling → [B, N, T', pooled, pooled, C].

    Same semantics as vmapping `roi_align.tube_roi_align` over the batch;
    gradients flow via the jnp reference (custom VJP)."""
    return _tube_roi_align_vjp(
        features, tubes, pooled_size, spatial_scale, sampling_ratio
    )


def _reference_batched(features, tubes, pooled_size, spatial_scale, sampling_ratio):
    return jax.vmap(
        lambda f, t: _tube_roi_align_ref(
            f, t, pooled_size, spatial_scale, sampling_ratio
        )
    )(features, tubes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _tube_roi_align_vjp(features, tubes, pooled_size, spatial_scale, sampling_ratio):
    from step_tpu.ops.roi_align import feature_time_indices

    T, Tp = tubes.shape[2], features.shape[1]
    t_idx = feature_time_indices(T, Tp)
    boxes_per_slice = jnp.take(tubes, t_idx, axis=2)  # [B, N, T', 4]
    return _tube_roi_align_pallas_raw(
        features, boxes_per_slice, pooled_size, spatial_scale, sampling_ratio
    )


def _vjp_fwd(features, tubes, pooled_size, spatial_scale, sampling_ratio):
    out = _tube_roi_align_vjp(
        features, tubes, pooled_size, spatial_scale, sampling_ratio
    )
    return out, (features, tubes)


def _vjp_bwd(pooled_size, spatial_scale, sampling_ratio, res, g):
    features, tubes = res
    _, vjp = jax.vjp(
        lambda f, t: _reference_batched(f, t, pooled_size, spatial_scale, sampling_ratio),
        features,
        tubes,
    )
    return vjp(g)


_tube_roi_align_vjp.defvjp(_vjp_fwd, _vjp_bwd)
