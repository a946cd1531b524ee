"""Pallas TPU kernel: tube-of-interest ROI-align as interpolation matmuls.

The north-star TPU-native replacement for the reference's CUDA ROIAlign
(``external/maskrcnn_benchmark/csrc/cuda/ROIAlign_cuda.cu`` (recon)).

A scalar gather-pool kernel is the GPU idiom; on TPU, dynamic scalar
indexing of VMEM sublanes is alignment-restricted (Mosaic rejects it) and
gathers waste the MXU. Instead we use the separable-bilinear identity (see
``roi_align.roi_align_matmul``): per (clip, slice) — with the feature slice
resident in VMEM once and an in-kernel loop over tubes — build the two
interpolation matrices A_y [P, H], A_x [P, W] from the box scalars with
broadcasted iota (VPU), then pool with two MXU contractions:

    tmp = A_y · feat      [P, W, C]
    out = A_x · tmpᵀ      [P, P, C]

Semantics match the Detectron reference bit-for-bit (same hat-function
weights, clamping, and out-of-range masking) — enforced by parity tests in
interpret mode and on hardware.

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


def _kernel_all_tubes(boxes_smem, feat_ref, out_ref, *, pooled: int, ratio: int,
                      scale: float, H: int, W: int, N: int):
    """Grid (B, T'): the feature slice lands in VMEM once and an in-kernel
    loop pools all N tubes from it.

    Measured on v5e (B=8, N=16, T'=5, C=832, bf16): 2.17 ms vs 1.12 ms for
    the pure-XLA matmul formulation — the serial per-tube fori is the limit;
    XLA batches the interpolation contractions across (N, T') into large
    MXU matmuls. The XLA path is therefore the default (`roi_impl="matmul"`)
    and this kernel is the parity-exact selectable alternative; beating XLA
    would need the tube axis folded into one batched contraction, which
    Mosaic's dot_general support doesn't cover today (see TODO.md)."""
    b = pl.program_id(0)
    t = pl.program_id(1)

    p_ids = jax.lax.broadcasted_iota(jnp.int32, (pooled, ratio), 0).astype(jnp.float32)
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (pooled, ratio), 1).astype(jnp.float32)
    off = p_ids + (s_ids + 0.5) / ratio

    def interp(coords_ps, limit):
        ok = ((coords_ps >= -1.0) & (coords_ps <= limit)).astype(jnp.float32)
        c = jnp.clip(coords_ps, 0.0, limit - 1.0)
        grid = jax.lax.broadcasted_iota(
            jnp.int32, (pooled, ratio, limit), 2
        ).astype(jnp.float32)
        hat = jnp.maximum(1.0 - jnp.abs(c[..., None] - grid), 0.0)
        return jnp.sum(hat * ok[..., None], axis=1)  # [P, limit]

    feat = feat_ref[0, 0].astype(jnp.float32)  # [H, W, C] — loaded once

    def tube_body(n, _):
        x1 = boxes_smem[b, n, t, 0] * scale
        y1 = boxes_smem[b, n, t, 1] * scale
        x2 = boxes_smem[b, n, t, 2] * scale
        y2 = boxes_smem[b, n, t, 3] * scale
        bin_w = jnp.maximum(x2 - x1, 1.0) / pooled
        bin_h = jnp.maximum(y2 - y1, 1.0) / pooled
        Ay = interp(y1 + off * bin_h, H)
        Ax = interp(x1 + off * bin_w, W)
        tmp = jax.lax.dot_general(
            Ay, feat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        out = jax.lax.dot_general(
            Ax, tmp, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        out_ref[0, n, 0] = (jnp.swapaxes(out, 0, 1) / (ratio * ratio)).astype(
            out_ref.dtype
        )
        return ()

    jax.lax.fori_loop(0, N, tube_body, ())


def _tube_roi_align_pallas_raw(
    features: jnp.ndarray,   # [B, T', H, W, C]
    boxes: jnp.ndarray,      # [B, N, T', 4] — per-slice boxes
    pooled: int,
    scale: float,
    ratio: int,
) -> jnp.ndarray:
    B, Tp, H, W, C = features.shape
    N = boxes.shape[1]
    # Lane-align the channel axis: Mosaic's (W, C) -> (W*C) relayout inside
    # the rank-3 contraction is only a no-op when C is a multiple of 128.
    C_pad = (-C) % 128
    if C_pad:
        features = jnp.pad(features, ((0, 0),) * 4 + ((0, C_pad),))
        C = C + C_pad
    kernel = functools.partial(
        _kernel_all_tubes, pooled=pooled, ratio=ratio, scale=scale, H=H, W=W, N=N
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Tp),
        in_specs=[
            pl.BlockSpec(
                (1, 1, H, W, C),
                lambda b, t, *refs: (b, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, N, 1, pooled, pooled, C),
            lambda b, t, *refs: (b, 0, t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, Tp, pooled, pooled, C), features.dtype),
    )(boxes.astype(jnp.float32), features)
    return out[..., : C - C_pad] if C_pad else out


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
    T, Tp = tubes.shape[2], features.shape[1]
    if T == Tp:
        t_idx = jnp.arange(Tp)
    else:
        t_idx = ((jnp.arange(Tp) + 0.5) * (T / Tp)).astype(jnp.int32)
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
