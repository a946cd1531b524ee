"""ROI align as a pure-jnp gather-pool (the numerics reference).

Reference parity: ``external/maskrcnn_benchmark/csrc/cuda/ROIAlign_cuda.cu``
(recon) — Detectron-style ROIAlign, legacy (aligned=False) coordinate
convention as used by 2019-era maskrcnn-benchmark:

  * box coords scaled by `spatial_scale`, **no** half-pixel offset;
  * roi width/height floored at 1 feature cell;
  * each pooled bin averages `sampling_ratio**2` bilinear samples placed at
    the centers of a regular sub-grid;
  * bilinear boundary handling: a sample at (y, x) returns 0 if
    y < -1 or y > H or x < -1 or x > W; otherwise coords are clamped to
    [0, H-1] / [0, W-1] and the 4-corner weighted sum is taken.

The backward pass is XLA autodiff of this expression (gathers differentiate
to scatter-adds), which is exact. The Pallas TPU kernel in
``roi_align_pallas.py`` must match this function bit-for-bit on its tests.

Layout is channels-last ([H, W, C]) throughout — the TPU-preferred layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def feature_time_indices(T: int, Tp: int) -> jnp.ndarray:
    """Map each strided feature slice t' to the input frame at its center —
    THE canonical slice→frame convention, shared by every ROI impl and the
    detector (one definition; a divergent copy would silently pool
    different frames' boxes while T==Tp parity tests keep passing)."""
    if T == Tp:
        return jnp.arange(Tp)
    # Feature slice t' covers input frames [t'*T/Tp, (t'+1)*T/Tp); use center.
    return ((jnp.arange(Tp) + 0.5) * (T / Tp)).astype(jnp.int32)


def _bilinear_weights(coord, limit):
    """Detectron bilinear: returns (lo_idx, hi_idx, lo_w, hi_w, in_range).

    `coord` may be any shape; `limit` is the axis size (H or W).
    """
    in_range = (coord >= -1.0) & (coord <= limit)
    c = jnp.clip(coord, 0.0, None)
    lo = jnp.floor(c).astype(jnp.int32)
    lo = jnp.minimum(lo, limit - 1)
    at_edge = lo >= limit - 1
    hi = jnp.where(at_edge, limit - 1, lo + 1)
    c = jnp.where(at_edge, lo.astype(c.dtype), c)
    frac = c - lo.astype(c.dtype)
    return lo, hi, 1.0 - frac, frac, in_range


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    pooled_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROI-align `boxes` out of a single feature map.

    Args:
      features: [H, W, C] feature map (channels last).
      boxes: [N, 4] x1y1x2y2 in image coordinates.
      pooled_size: output grid side (7 → 7x7 bins).
      spatial_scale: image→feature coordinate scale (1/stride).
      sampling_ratio: bilinear samples per bin per axis; `<= 0` selects the
        maskrcnn-benchmark adaptive branch (per-ROI `ceil(roi/bin)` grid,
        see `roi_sample_coords`).

    Returns: [N, pooled_size, pooled_size, C].
    """
    H, W, C = features.shape
    P = pooled_size
    dtype = features.dtype

    # Sample coordinates: [N, P, S] per axis → broadcast to [N, P, S, P, S].
    ys, xs, count = roi_sample_coords(
        boxes, P, spatial_scale, sampling_ratio,
        adaptive_max=adaptive_max_ratio(H, W, P))

    y_lo, y_hi, wy_lo, wy_hi, y_ok = _bilinear_weights(ys, H)
    x_lo, x_hi, wx_lo, wx_hi, x_ok = _bilinear_weights(xs, W)

    # Cross the y and x sample axes: y indexes [N, Py, Sy], x indexes [N, Px, Sx].
    def expand_y(a):
        return a[:, :, :, None, None]  # [N, P, S, 1, 1]

    def expand_x(a):
        return a[:, None, None, :, :]  # [N, 1, 1, P, S]

    ok = (expand_y(y_ok) & expand_x(x_ok))                 # [N, P, S, P, S]
    flat = features.reshape(H * W, C)

    def gather(yi, xi):
        idx = expand_y(yi) * W + expand_x(xi)              # [N, P, S, P, S]
        return flat[idx.reshape(-1)].reshape(*idx.shape, C)

    val = (
        gather(y_lo, x_lo) * (expand_y(wy_lo) * expand_x(wx_lo))[..., None]
        + gather(y_lo, x_hi) * (expand_y(wy_lo) * expand_x(wx_hi))[..., None]
        + gather(y_hi, x_lo) * (expand_y(wy_hi) * expand_x(wx_lo))[..., None]
        + gather(y_hi, x_hi) * (expand_y(wy_hi) * expand_x(wx_hi))[..., None]
    )
    val = jnp.where(ok[..., None], val, 0.0)
    # Average the samples of each bin: fixed grid → mean over S*S; adaptive
    # → sum over the static grid (padded samples contribute 0) divided by
    # the per-ROI count g_y*g_x, exactly like the CUDA kernel.
    if isinstance(count, float):
        out = jnp.mean(val, axis=(2, 4))                   # [N, P, P, C]
    else:
        out = jnp.sum(val, axis=(2, 4)) / count[:, None, None, None]
    return out.astype(dtype)


def interp_matrix(
    coords: jnp.ndarray,  # [..., P, S] sample coordinates along one axis
    limit: int,           # H or W
) -> jnp.ndarray:
    """Bilinear-interpolation matrix: [..., P, limit] row weights.

    The Detectron bilinear sample at clamped coordinate c is exactly the hat
    function (1 - |c - h|)+ over grid points h — so summing the S sample
    hats per bin yields a matrix A with  pooled = A @ feature  along that
    axis. Out-of-range samples (c < -1 or c > limit) contribute zero.
    """
    ok = (coords >= -1.0) & (coords <= limit)
    c = jnp.clip(coords, 0.0, limit - 1.0)
    grid = jnp.arange(limit, dtype=coords.dtype)
    hat = jnp.maximum(1.0 - jnp.abs(c[..., None] - grid), 0.0)  # [..., P, S, limit]
    hat = hat * ok[..., None].astype(coords.dtype)
    return jnp.sum(hat, axis=-2)  # [..., P, limit]


def adaptive_max_ratio(H: int, W: int, pooled: int) -> int:
    """Static cap on the adaptive per-ROI sample count for the
    `sampling_ratio <= 0` branch: ceil(roi/bin) = ceil(roi_extent/pooled)
    <= ceil(max(H, W)/pooled) once boxes are clamped to the image (which
    `tubes/boxes.py::valid_tubes` guarantees upstream). ROIs that somehow
    exceed the feature map clamp their sample count to this cap — a
    documented deviation only reachable with un-clamped out-of-image boxes.
    """
    return max(1, -(-max(H, W) // pooled))


# Sample coordinate parked far outside the valid range [-1, limit]: both
# mask conventions (`_bilinear_weights.in_range`, `interp_matrix.ok`) zero
# its contribution, which is how padded adaptive samples are disabled
# without dynamic shapes.
_INVALID_COORD = -10.0


def roi_sample_coords(boxes: jnp.ndarray, pooled: int, scale: float,
                      ratio: int, adaptive_max: int | None = None):
    """Per-axis sample coordinates for boxes [..., 4].

    With `ratio > 0` (fixed grid — the historical path): coordinates are
    `[..., pooled, ratio]` and `count` is the python float `ratio**2`.

    With `ratio <= 0` (maskrcnn-benchmark's adaptive branch,
    ``csrc/cuda/ROIAlign_cuda.cu`` (recon): ``roi_bin_grid = ceil(roi_extent
    / pooled)`` per ROI per axis): `adaptive_max` must be given (use
    `adaptive_max_ratio(H, W, pooled)`); coordinates are
    `[..., pooled, adaptive_max]` with the per-ROI invalid tail parked at
    `_INVALID_COORD` so downstream masks drop it, and `count` is the
    per-ROI array `g_y * g_x` of shape `boxes.shape[:-1]` (the CUDA kernel
    divides each bin's sample sum by exactly this product).

    Returns (ys, xs, count) in feature coordinates.
    """
    b = boxes.astype(jnp.float32) * scale
    x1, y1 = b[..., 0], b[..., 1]
    roi_w = jnp.maximum(b[..., 2] - x1, 1.0)
    roi_h = jnp.maximum(b[..., 3] - y1, 1.0)
    grid = jnp.arange(pooled, dtype=jnp.float32)
    if ratio > 0:
        off = (
            grid[:, None]
            + (jnp.arange(ratio, dtype=jnp.float32)[None, :] + 0.5) / ratio
        )  # [pooled, ratio]
        ys = y1[..., None, None] + off * (roi_h / pooled)[..., None, None]
        xs = x1[..., None, None] + off * (roi_w / pooled)[..., None, None]
        return ys, xs, float(ratio * ratio)
    if adaptive_max is None:
        raise ValueError("ratio <= 0 (adaptive sampling) requires "
                         "adaptive_max (use adaptive_max_ratio(H, W, P))")
    S = adaptive_max
    sub = jnp.arange(S, dtype=jnp.float32)                    # [S]
    gy = jnp.clip(jnp.ceil(roi_h / pooled), 1.0, float(S))    # [...]
    gx = jnp.clip(jnp.ceil(roi_w / pooled), 1.0, float(S))

    def _axis(start, extent, g):
        # off[..., p, s] = p + (s + 0.5)/g   (per-ROI sub-grid density)
        off = grid[:, None] + (sub[None, :] + 0.5) / g[..., None, None]
        coords = start[..., None, None] + off * (extent / pooled)[..., None, None]
        valid = sub[None, :] < g[..., None, None]             # [..., 1, S]
        return jnp.where(valid, coords, _INVALID_COORD)

    ys = _axis(y1, roi_h, gy)
    xs = _axis(x1, roi_w, gx)
    return ys, xs, gy * gx


def roi_align_matmul(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    pooled_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROI align as two interpolation matmuls (TPU-native formulation).

    Numerically identical to `roi_align` (same Detectron semantics — the
    parity tests enforce it) but contraction-shaped: the bilinear gather
    becomes `A_y @ feat @ A_xᵀ`, which XLA tiles onto the MXU with no
    gathers. Preferred on TPU; `roi_align` remains the scalar-semantics
    reference.

    features [H, W, C]; boxes [N, 4] → [N, pooled, pooled, C].

    `sampling_ratio <= 0` selects the adaptive per-ROI sample grid (see
    `roi_sample_coords`).
    """
    H, W, C = features.shape
    ys, xs, count = roi_sample_coords(
        boxes, pooled_size, spatial_scale, sampling_ratio,
        adaptive_max=adaptive_max_ratio(H, W, pooled_size))
    Ay = interp_matrix(ys, H)                      # [N, P, H]
    Ax = interp_matrix(xs, W)                      # [N, P, W]
    f32 = features.astype(jnp.float32)
    tmp = jnp.einsum("nph,hwc->npwc", Ay, f32)     # contract H
    out = jnp.einsum("nqw,npwc->npqc", Ax, tmp)    # contract W
    if not isinstance(count, float):
        count = count[:, None, None, None]         # per-ROI adaptive counts
    return (out / count).astype(features.dtype)


def kron_interp_weights(
    boxes: jnp.ndarray,   # [..., N, 4]
    pooled: int,
    scale: float,
    ratio: int,
    H: int,
    W: int,
) -> jnp.ndarray:
    """Fused Kronecker interpolation weights: [..., N*P*P, H*W].

    K2[(n,p,q), (h,w)] = A_y[n,p,h] * A_x[n,q,w] — ROI-align of ALL tubes
    and bins becomes ONE matmul against the flattened feature slice
    ([N*P*P, H*W] x [H*W, C]), an MXU-shaped contraction (K = H*W ≈ 196)
    instead of per-tube K = H ≈ 14 slivers. The 1/count averaging is folded
    in (count = ratio**2, or the per-ROI g_y*g_x when ratio <= 0 selects
    the adaptive branch).
    """
    N = boxes.shape[-2]
    ys, xs, count = roi_sample_coords(
        boxes, pooled, scale, ratio,
        adaptive_max=adaptive_max_ratio(H, W, pooled))        # [..., N, P, S]
    Ay = interp_matrix(ys, H)                                 # [..., N, P, H]
    Ax = interp_matrix(xs, W)                                 # [..., N, P, W]
    if not isinstance(count, float):
        count = count[..., None, None, None, None]            # [..., N,1,1,1,1]
    k = (Ay[..., :, :, None, :, None] * Ax[..., :, None, :, None, :]
         / count)                                             # [..., N,P,P,H,W]
    return k.reshape(*k.shape[:-5], N * pooled * pooled, H * W)


def batched_tube_roi_align_kron(
    features: jnp.ndarray,   # [B, T', H, W, C]
    tubes: jnp.ndarray,      # [B, N, T, 4]
    pooled_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
    time_indices: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched tube ROI-align via the fused Kronecker contraction (pure
    XLA). Same semantics as vmapping `tube_roi_align`; the single (h, w)
    sum reassociates floats vs the separable two-stage path (allclose, not
    bit-exact). → [B, N, T', pooled, pooled, C]."""
    B, Tp, H, W, C = features.shape
    N, T = tubes.shape[1], tubes.shape[2]
    if time_indices is None:
        time_indices = feature_time_indices(T, Tp)
    boxes = jnp.take(tubes, time_indices, axis=2)             # [B, N, T', 4]
    boxes = jnp.swapaxes(boxes, 1, 2)                         # [B, T', N, 4]
    k2 = kron_interp_weights(
        boxes, pooled_size, spatial_scale, sampling_ratio, H, W
    )                                                          # [B, T', R, K]
    # Contract in the FEATURE dtype: the interpolation weights are computed
    # in f32 (cheap, [B,T',R,K]) but the big einsum runs bf16-in/bf16-out
    # when the model is bf16 — upcasting to f32 made XLA materialize and
    # then convert a 1.67 GB f32 intermediate (trace r3: copy.407/408,
    # ~17 ms/batch at B=128). MXU accumulation is f32 either way; only the
    # stored output rounds, which the bf16 model does everywhere else too.
    # On f32 inputs (CPU tests, reference parity) nothing changes.
    feat2 = features.reshape(B, Tp, H * W, C)
    k2 = k2.astype(features.dtype)
    # (An epilogue-transposed "->brtc" output order was A/B-measured
    # neutral at B=128 — trace r3 — and removed; the einsum below is the
    # one production form.)
    out = jnp.einsum("btrk,btkc->btrc", k2, feat2)            # [B, T', R, C]
    out = out.reshape(B, Tp, N, pooled_size, pooled_size, C)
    return jnp.swapaxes(out, 1, 2).astype(features.dtype)


def roi_pool(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    pooled_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
) -> jnp.ndarray:
    """ROI max-pool (reference parity: ``csrc/cuda/ROIPool_cuda.cu`` (recon),
    the legacy Fast-R-CNN quantized variant — secondary to ROI align in the
    reference and kept for op-inventory completeness).

    Semantics: boxes are rounded to integer feature cells, each of the
    pooled_size**2 bins takes the max over its (ceil-divided) cell range;
    empty bins yield 0.

    TPU formulation: instead of dynamic per-bin slices, build per-bin
    {0,1} membership matrices over rows/cols (static shapes) and reduce with
    masked maxes — the max-pool analog of the interpolation-matmul trick.

    features [H, W, C]; boxes [N, 4] → [N, pooled, pooled, C].
    """
    H, W, C = features.shape
    P = pooled_size
    b = jnp.round(boxes.astype(jnp.float32) * spatial_scale)
    x1, y1 = b[:, 0], b[:, 1]
    roi_w = jnp.maximum(b[:, 2] - x1 + 1.0, 1.0)   # [N]
    roi_h = jnp.maximum(b[:, 3] - y1 + 1.0, 1.0)
    bin_w = roi_w / P
    bin_h = roi_h / P

    grid = jnp.arange(P, dtype=jnp.float32)

    def axis_membership(start, bin_sz, limit):
        # bin p covers [floor(p*bin), ceil((p+1)*bin)) offset by start, clamped
        lo = jnp.clip(jnp.floor(grid[None, :] * bin_sz[:, None]) + start[:, None], 0, limit)
        hi = jnp.clip(jnp.ceil((grid[None, :] + 1) * bin_sz[:, None]) + start[:, None], 0, limit)
        cells = jnp.arange(limit, dtype=jnp.float32)
        member = (cells[None, None, :] >= lo[..., None]) & (cells[None, None, :] < hi[..., None])
        return member  # [N, P, limit] bool

    rows = axis_membership(y1, bin_h, H)           # [N, P, H]
    cols = axis_membership(x1, bin_w, W)           # [N, P, W]
    f32 = features.astype(jnp.float32)
    NEG = jnp.float32(-3.4e38)
    # masked max over H then W
    rowed = jnp.max(
        jnp.where(rows[:, :, :, None, None], f32[None, None], NEG), axis=2
    )                                              # [N, P, W, C]
    out = jnp.max(
        jnp.where(cols[:, None, :, :, None], rowed[:, :, None], NEG), axis=3
    )                                              # [N, P, P, C]
    out = jnp.where(out <= NEG / 2, 0.0, out)      # empty bins → 0
    return out.astype(features.dtype)


def tube_roi_align(
    features: jnp.ndarray,
    tubes: jnp.ndarray,
    pooled_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
    time_indices: jnp.ndarray | None = None,
    impl: str = "matmul",
) -> jnp.ndarray:
    """Tube-of-interest pooling: per-frame ROI align stacked over time.

    Reference parity: ``models/networks.py::ROINet`` (recon) — each temporal
    slice of the backbone feature map is pooled with that frame's box of each
    tube, producing a tube feature.

    Args:
      features: [T', H, W, C] — temporally-strided backbone features.
      tubes: [N, T, 4] per-frame boxes. If T != T', supply `time_indices`
        mapping each feature slice t' to the tube frame it corresponds to
        (the backbone's temporal stride means several input frames share one
        feature slice); default maps proportionally.
      Returns: [N, T', pooled, pooled, C].
    """
    Tp = features.shape[0]
    T = tubes.shape[1]
    if time_indices is None:
        time_indices = feature_time_indices(T, Tp)
    boxes_per_slice = jnp.take(tubes, time_indices, axis=1)  # [N, T', 4]
    align = roi_align_matmul if impl == "matmul" else roi_align

    def pool_slice(feat_t, boxes_t):
        return align(feat_t, boxes_t, pooled_size, spatial_scale, sampling_ratio)

    out = jax.vmap(pool_slice, in_axes=(0, 1), out_axes=1)(features, boxes_per_slice)
    return out  # [N, T', P, P, C]
