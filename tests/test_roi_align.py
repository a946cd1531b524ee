"""ROI-align parity vs. a scalar numpy oracle of the Detectron semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from step_tpu.ops.roi_align import roi_align, tube_roi_align


def np_bilinear(feat, y, x):
    """Detectron bilinear_interpolate semantics (scalar)."""
    H, W = feat.shape[:2]
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(feat.shape[-1], feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_lo, x_lo = int(y), int(x)
    if y_lo >= H - 1:
        y_hi = y_lo = H - 1
        y = float(y_lo)
    else:
        y_hi = y_lo + 1
    if x_lo >= W - 1:
        x_hi = x_lo = W - 1
        x = float(x_lo)
    else:
        x_hi = x_lo + 1
    ly, lx = y - y_lo, x - x_lo
    return (
        feat[y_lo, x_lo] * (1 - ly) * (1 - lx)
        + feat[y_lo, x_hi] * (1 - ly) * lx
        + feat[y_hi, x_lo] * ly * (1 - lx)
        + feat[y_hi, x_hi] * ly * lx
    )


def np_roi_align(feat, boxes, pooled, scale, ratio):
    """Scalar-loop oracle for Detectron-style (aligned=False) ROI align."""
    N = boxes.shape[0]
    C = feat.shape[-1]
    out = np.zeros((N, pooled, pooled, C), np.float32)
    for n in range(N):
        x1, y1, x2, y2 = boxes[n] * scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / pooled, rh / pooled
        for py in range(pooled):
            for px in range(pooled):
                acc = np.zeros(C, np.float32)
                for sy in range(ratio):
                    for sx in range(ratio):
                        y = y1 + (py + (sy + 0.5) / ratio) * bh
                        x = x1 + (px + (sx + 0.5) / ratio) * bw
                        acc += np_bilinear(feat, y, x)
                out[n, py, px] = acc / (ratio * ratio)
    return out


@pytest.mark.parametrize("pooled,ratio", [(7, 2), (3, 1), (5, 3)])
def test_roi_align_matches_oracle(pooled, ratio):
    rng = np.random.RandomState(0)
    H, W, C = 14, 14, 8
    feat = rng.randn(H, W, C).astype(np.float32)
    boxes = np.array(
        [
            [0, 0, 224, 224],       # full image
            [32, 48, 160, 200],     # interior
            [-10, -10, 100, 100],   # spills past the top-left
            [200, 200, 230, 230],   # spills past the bottom-right
            [50, 50, 52, 52],       # tiny box (< 1 feature cell)
        ],
        np.float32,
    )
    scale = 1.0 / 16.0
    got = roi_align(jnp.asarray(feat), jnp.asarray(boxes), pooled, scale, ratio)
    want = np_roi_align(feat, boxes, pooled, scale, ratio)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_roi_align_degenerate_box():
    feat = jnp.ones((8, 8, 4), jnp.float32)
    boxes = jnp.array([[64.0, 64.0, 64.0, 64.0]])  # zero-area box
    out = roi_align(feat, boxes, 7, 1.0 / 16.0, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_roi_align_differentiable():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(10, 10, 4).astype(np.float32))
    boxes = jnp.array([[16.0, 16.0, 120.0, 120.0]])

    def loss(f):
        return jnp.sum(roi_align(f, boxes, 5, 1.0 / 16.0, 2) ** 2)

    g = jax.grad(loss)(feat)
    assert g.shape == feat.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_tube_roi_align_shapes_and_slices():
    rng = np.random.RandomState(2)
    Tp, H, W, C = 3, 12, 12, 6
    feat = rng.randn(Tp, H, W, C).astype(np.float32)
    # 2 tubes over 6 frames, features strided 2x in time.
    tubes = np.tile(
        np.array([[10, 10, 100, 100], [30, 30, 150, 150]], np.float32)[:, None, :],
        (1, 6, 1),
    )
    out = tube_roi_align(jnp.asarray(feat), jnp.asarray(tubes), 7, 1.0 / 16.0, 2)
    assert out.shape == (2, 3, 7, 7, C)
    # With identical boxes across frames, each temporal slice pools feat[t]
    # with the same box; check slice t=1 against single-frame roi_align.
    single = roi_align(jnp.asarray(feat[1]), jnp.asarray(tubes[:, 0]), 7, 1.0 / 16.0, 2)
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(single),
                               rtol=1e-4, atol=1e-5)


def test_tube_roi_align_time_mapping():
    # T == T' should map identity: per-frame boxes hit their own slice.
    rng = np.random.RandomState(3)
    T, H, W, C = 4, 10, 10, 2
    feat = rng.randn(T, H, W, C).astype(np.float32)
    tubes = np.zeros((1, T, 4), np.float32)
    for t in range(T):
        tubes[0, t] = [t * 10, 0, t * 10 + 80, 80]
    out = tube_roi_align(jnp.asarray(feat), jnp.asarray(tubes), 3, 1.0 / 16.0, 1)
    for t in range(T):
        single = roi_align(jnp.asarray(feat[t]), jnp.asarray(tubes[:, t]), 3, 1.0 / 16.0, 1)
        np.testing.assert_allclose(np.asarray(out[:, t]), np.asarray(single),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pooled,ratio", [(7, 2), (3, 1), (5, 3)])
def test_roi_align_matmul_matches_gather(pooled, ratio):
    """The MXU contraction formulation is numerically the gather semantics."""
    from step_tpu.ops.roi_align import roi_align_matmul

    rng = np.random.RandomState(7)
    feat = rng.randn(14, 14, 8).astype(np.float32)
    boxes = np.array(
        [
            [0, 0, 224, 224],
            [32, 48, 160, 200],
            [-10, -10, 100, 100],
            [200, 200, 230, 230],
            [50, 50, 52, 52],
            [225, 225, 256, 256],   # fully out of range
        ],
        np.float32,
    )
    a = roi_align(jnp.asarray(feat), jnp.asarray(boxes), pooled, 1 / 16.0, ratio)
    b = roi_align_matmul(jnp.asarray(feat), jnp.asarray(boxes), pooled, 1 / 16.0, ratio)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pooled,ratio", [(7, 2), (3, 1)])
def test_batched_kron_matches_reference(pooled, ratio):
    """The fused Kronecker contraction (default roi_impl) == the per-tube
    gather semantics, including time mapping, spills, and tiny boxes."""
    from step_tpu.ops.roi_align import batched_tube_roi_align_kron, tube_roi_align

    rng = np.random.RandomState(3)
    B, Tp, H, W, C = 2, 3, 10, 12, 8
    N, T = 5, 6
    feat = jnp.asarray(rng.randn(B, Tp, H, W, C).astype(np.float32))
    base = np.asarray(
        [[10, 10, 100, 100], [-20, -20, 60, 60], [120, 120, 170, 170],
         [40, 40, 42, 42], [150, 100, 260, 260]],
        np.float32,
    )
    tubes = np.tile(base[None, :, None, :], (B, 1, T, 1))
    tubes += rng.randn(*tubes.shape).astype(np.float32) * 3
    tubes = jnp.asarray(tubes)

    got = batched_tube_roi_align_kron(feat, tubes, pooled, 1 / 16.0, ratio)
    want = jax.vmap(
        lambda f, t: tube_roi_align(f, t, pooled, 1 / 16.0, ratio, impl="gather")
    )(feat, tubes)
    assert got.shape == want.shape == (B, N, Tp, pooled, pooled, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_batched_kron_differentiable():
    """Gradients flow to both features and boxes through the kron path
    (it is the training-time pooling when roi_impl='kron')."""
    from step_tpu.ops.roi_align import batched_tube_roi_align_kron

    rng = np.random.RandomState(4)
    feat = jnp.asarray(rng.randn(1, 2, 8, 8, 4).astype(np.float32))
    tubes = jnp.asarray(
        np.tile(np.asarray([[30, 20, 90, 110]], np.float32)[None, :, None],
                (1, 1, 2, 1))
    )

    def loss(f, t):
        return jnp.sum(batched_tube_roi_align_kron(f, t, 3, 1 / 16.0, 2) ** 2)

    gf, gt = jax.grad(loss, argnums=(0, 1))(feat, tubes)
    assert np.isfinite(np.asarray(gf)).all() and np.abs(np.asarray(gf)).max() > 0
    assert np.isfinite(np.asarray(gt)).all() and np.abs(np.asarray(gt)).max() > 0


def np_roi_pool(feat, boxes, pooled, scale):
    """Scalar oracle: legacy Fast-R-CNN quantized ROI max-pool."""
    N, C = boxes.shape[0], feat.shape[-1]
    H, W = feat.shape[:2]
    out = np.zeros((N, pooled, pooled, C), np.float32)
    for n in range(N):
        x1, y1, x2, y2 = np.round(boxes[n] * scale)
        rw = max(x2 - x1 + 1, 1.0)
        rh = max(y2 - y1 + 1, 1.0)
        for py in range(pooled):
            for px in range(pooled):
                ys = int(np.clip(np.floor(py * rh / pooled) + y1, 0, H))
                ye = int(np.clip(np.ceil((py + 1) * rh / pooled) + y1, 0, H))
                xs = int(np.clip(np.floor(px * rw / pooled) + x1, 0, W))
                xe = int(np.clip(np.ceil((px + 1) * rw / pooled) + x1, 0, W))
                if ye > ys and xe > xs:
                    out[n, py, px] = feat[ys:ye, xs:xe].max(axis=(0, 1))
    return out


@pytest.mark.parametrize("pooled", [7, 3])
def test_roi_pool_matches_oracle(pooled):
    from step_tpu.ops.roi_align import roi_pool

    rng = np.random.RandomState(11)
    feat = rng.randn(14, 14, 5).astype(np.float32)
    boxes = np.array(
        [[0, 0, 224, 224], [32, 48, 160, 200], [-10, -10, 100, 100],
         [200, 200, 230, 230], [50, 50, 52, 52]],
        np.float32,
    )
    got = roi_pool(jnp.asarray(feat), jnp.asarray(boxes), pooled, 1 / 16.0)
    want = np_roi_pool(feat, boxes, pooled, 1 / 16.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def np_roi_align_adaptive(feat, boxes, pooled, scale):
    """Scalar oracle for the maskrcnn-benchmark `sampling_ratio <= 0`
    branch: per-ROI per-axis grid g = ceil(roi_extent / pooled); each bin
    sums g_y*g_x samples and divides by exactly that count."""
    N = boxes.shape[0]
    C = feat.shape[-1]
    out = np.zeros((N, pooled, pooled, C), np.float32)
    for n in range(N):
        x1, y1, x2, y2 = boxes[n] * scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / pooled, rh / pooled
        gy = int(np.ceil(rh / pooled))
        gx = int(np.ceil(rw / pooled))
        for py in range(pooled):
            for px in range(pooled):
                acc = np.zeros(C, np.float32)
                for sy in range(gy):
                    for sx in range(gx):
                        y = y1 + py * bh + (sy + 0.5) * bh / gy
                        x = x1 + px * bw + (sx + 0.5) * bw / gx
                        acc += np_bilinear(feat, y, x)
                out[n, py, px] = acc / (gy * gx)
    return out


_ADAPTIVE_BOXES = np.array(
    [
        [0, 0, 224, 224],       # full image: g = ceil(14/7) = 2 per axis
        [32, 48, 160, 200],     # interior, anisotropic: gy != gx
        [-10, -10, 100, 100],   # spill (clamped samples)
        [50, 50, 52, 52],       # tiny box: g = 1 both axes
        [10, 10, 80, 220],      # tall: gy=2, gx=1 — exercises the per-axis split
    ],
    np.float32,
)


@pytest.mark.parametrize("pooled", [7, 3])
def test_roi_align_adaptive_matches_oracle(pooled):
    """sampling_ratio=0 → per-ROI adaptive grid (VERDICT r3 Missing #4)."""
    rng = np.random.RandomState(21)
    feat = rng.randn(14, 14, 6).astype(np.float32)
    got = roi_align(jnp.asarray(feat), jnp.asarray(_ADAPTIVE_BOXES),
                    pooled, 1 / 16.0, 0)
    want = np_roi_align_adaptive(feat, _ADAPTIVE_BOXES, pooled, 1 / 16.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pooled", [7, 3])
def test_roi_align_matmul_adaptive_matches_gather(pooled):
    from step_tpu.ops.roi_align import roi_align_matmul

    rng = np.random.RandomState(22)
    feat = rng.randn(14, 14, 6).astype(np.float32)
    a = roi_align(jnp.asarray(feat), jnp.asarray(_ADAPTIVE_BOXES),
                  pooled, 1 / 16.0, 0)
    b = roi_align_matmul(jnp.asarray(feat), jnp.asarray(_ADAPTIVE_BOXES),
                         pooled, 1 / 16.0, 0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_batched_kron_adaptive_matches_reference():
    from step_tpu.ops.roi_align import batched_tube_roi_align_kron, tube_roi_align

    rng = np.random.RandomState(23)
    B, Tp, H, W, C = 2, 3, 10, 12, 8
    T = 6
    feat = jnp.asarray(rng.randn(B, Tp, H, W, C).astype(np.float32))
    tubes = np.tile(_ADAPTIVE_BOXES[None, :, None, :], (B, 1, T, 1))
    tubes += rng.randn(*tubes.shape).astype(np.float32) * 3
    tubes = jnp.asarray(tubes)

    got = batched_tube_roi_align_kron(feat, tubes, 7, 1 / 16.0, 0)
    want = jax.vmap(
        lambda f, t: tube_roi_align(f, t, 7, 1 / 16.0, 0, impl="gather")
    )(feat, tubes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_roi_align_adaptive_differentiable():
    rng = np.random.RandomState(24)
    feat = jnp.asarray(rng.randn(10, 10, 4).astype(np.float32))
    boxes = jnp.array([[16.0, 16.0, 120.0, 200.0]])

    def loss(f):
        return jnp.sum(roi_align(f, boxes, 5, 1.0 / 16.0, 0) ** 2)

    g = jax.grad(loss)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
