"""Pallas kernels vs jnp references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from step_tpu.ops.fused_bn_relu import bn_relu_inference, fused_scale_bias_relu
from step_tpu.ops.roi_align import tube_roi_align
from step_tpu.ops import roi_align_pallas as rap


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    """Force interpret=True in pallas_call on CPU test runs."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(rap.pl, "pallas_call", patched)
    yield


def _ref_batched(feat, tubes, pooled, scale, ratio):
    return jax.vmap(lambda f, t: tube_roi_align(f, t, pooled, scale, ratio))(feat, tubes)


@pytest.mark.parametrize("pooled,ratio", [(7, 2), (3, 1)])
def test_pallas_roi_matches_reference(pooled, ratio):
    rng = np.random.RandomState(0)
    B, Tp, H, W, C = 2, 3, 10, 10, 8
    N, T = 4, 6
    feat = jnp.asarray(rng.randn(B, Tp, H, W, C).astype(np.float32))
    # boxes spanning interior, spill, tiny
    base = np.asarray(
        [[10, 10, 100, 100], [-20, -20, 60, 60], [120, 120, 170, 170], [40, 40, 42, 42]],
        np.float32,
    )
    tubes = np.tile(base[None, :, None, :], (B, 1, T, 1))
    tubes += rng.randn(*tubes.shape).astype(np.float32) * 2
    tubes = jnp.asarray(tubes)
    scale = 1.0 / 16.0

    got = rap.tube_roi_align_pallas(feat, tubes, pooled, scale, ratio)
    want = _ref_batched(feat, tubes, pooled, scale, ratio)
    assert got.shape == want.shape == (B, N, Tp, pooled, pooled, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_pallas_roi_bf16():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(1, 2, 8, 8, 4).astype(np.float32), jnp.bfloat16)
    tubes = jnp.asarray(
        np.tile(np.asarray([[16, 16, 96, 96]], np.float32)[None, :, None], (1, 1, 4, 1))
    )
    got = rap.tube_roi_align_pallas(feat, tubes, 3, 1 / 16, 2)
    want = _ref_batched(feat, tubes, 3, 1 / 16, 2)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


def test_pallas_roi_gradients_flow():
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(1, 2, 8, 8, 4).astype(np.float32))
    tubes = jnp.asarray(
        np.tile(np.asarray([[10, 10, 90, 90]], np.float32)[None, :, None], (1, 1, 4, 1))
    )

    def loss_pallas(f):
        return jnp.sum(rap.tube_roi_align_pallas(f, tubes, 3, 1 / 16, 2) ** 2)

    def loss_ref(f):
        return jnp.sum(_ref_batched(f, tubes, 3, 1 / 16, 2) ** 2)

    g_p = jax.grad(loss_pallas)(feat)
    g_r = jax.grad(loss_ref)(feat)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), rtol=1e-4, atol=1e-5)


def test_fused_scale_bias_relu():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(6, 5, 16).astype(np.float32))
    scale = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(16).astype(np.float32))
    got = fused_scale_bias_relu(x, scale, bias, block_rows=8, interpret=True)
    want = jnp.maximum(x * scale + bias, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_bn_relu_inference_matches_flax_math():
    rng = np.random.RandomState(4)
    C = 8
    x = jnp.asarray(rng.randn(4, 3, C).astype(np.float32))
    gamma = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    mean = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    var = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    eps = 1e-3
    got = bn_relu_inference(x, gamma, beta, mean, var, eps, interpret=True)
    want = jnp.maximum((x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_max_pool3x3_pallas_bitexact():
    """Pallas 3x3x3/stride-1/SAME max pool == reduce_window, bit-exact,
    including channel/batch padding remainders and bf16."""
    from step_tpu.ops.pool_pallas import max_pool3x3_same_pallas

    rng = np.random.RandomState(0)
    for shape, dtype in [((6, 5, 7, 7, 12), jnp.float32),
                         ((3, 2, 4, 9, 130), jnp.float32),
                         ((4, 5, 7, 7, 32), jnp.bfloat16)]:
        x = jnp.asarray(rng.randn(*shape), dtype)
        ref = jax.lax.reduce_window(
            x, jnp.asarray(-jnp.inf, dtype), jax.lax.max,
            (1, 3, 3, 3, 1), (1, 1, 1, 1, 1), "SAME")
        out = max_pool3x3_same_pallas(x, block_n=4, interpret=True)
        assert out.shape == ref.shape
        assert bool(jnp.all(out == ref)), (shape, dtype)


def test_max_pool_3d_pallas_dispatch(monkeypatch):
    """models.i3d.max_pool_3d routes 3x3x3/s1 pools through the Pallas
    kernel when STEP_TPU_POOL3D=pallas, with identical results."""
    import step_tpu.models.i3d as i3d

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 5, 7, 7, 16), jnp.float32)
    ref = i3d.max_pool_3d(x, (3, 3, 3), (1, 1, 1))
    # the env var is read PER CALL (advisor fix: setting it after import
    # must take effect)
    monkeypatch.setenv("STEP_TPU_POOL3D", "pallas")
    out = i3d.max_pool_3d(x, (3, 3, 3), (1, 1, 1))
    assert bool(jnp.all(out == ref))
    # non-matching window keeps the reduce_window path
    monkeypatch.setenv("STEP_TPU_POOL3D", "direct")
    ref2 = i3d.max_pool_3d(x, (1, 3, 3), (1, 2, 2))
    monkeypatch.setenv("STEP_TPU_POOL3D", "pallas")
    assert bool(jnp.all(ref2 == i3d.max_pool_3d(x, (1, 3, 3), (1, 2, 2))))


def test_pool_pallas_block_n_vmem_guard(monkeypatch):
    """pick_block_n shrinks block_n for big spatial extents and returns None
    when even one clip's halo block exceeds the VMEM budget (the backbone's
    Mixed_3 shape), so max_pool_3d falls back to reduce_window."""
    from step_tpu.ops.pool_pallas import pick_block_n

    # pooled-tube shape: small halo → large block_n
    assert pick_block_n((1024, 5, 7, 7, 832), jnp.bfloat16) == 4
    # backbone Mixed_3 b3-pool shape: 11*30*30*128*2B ≈ 2.5 MB/clip → None
    assert pick_block_n((64, 9, 28, 28, 256), jnp.bfloat16) is None
    import step_tpu.models.i3d as i3d

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 11, 30, 30, 8), jnp.float32)
    big = jnp.tile(x, (1, 1, 1, 1, 32))  # 256 channels
    ref = i3d.max_pool_3d(big, (3, 3, 3), (1, 1, 1))
    monkeypatch.setenv("STEP_TPU_POOL3D", "pallas")
    out = i3d.max_pool_3d(big, (3, 3, 3), (1, 1, 1))
    assert bool(jnp.all(out == ref))


def test_fused_conv3d_bn_relu_parity():
    """Implicit-GEMM fused conv+BN+ReLU kernel (a measured-negative study —
    see its docstring) matches XLA conv + epilogue, incl. Cin/K/N padding
    remainders and the f32-accumulate contract."""
    from step_tpu.ops.conv3d_pallas import conv3x3x3_bn_relu

    rng = np.random.RandomState(0)
    for (N, T, H, W, C, K) in [(3, 5, 7, 7, 160, 96), (2, 3, 5, 5, 40, 130)]:
        x = jnp.asarray(rng.randn(N, T, H, W, C), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 3, C, K) * 0.05, jnp.float32)
        scale = jnp.asarray(rng.rand(K) + 0.5, jnp.float32)
        bias = jnp.asarray(rng.randn(K) * 0.1, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        ref = jnp.maximum(ref * scale + bias, 0.0)
        out = conv3x3x3_bn_relu(x, w, scale, bias, block_n=2, block_c=64,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
