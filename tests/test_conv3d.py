"""Parity tests for the 2D-decomposed 3D conv lowerings (ops/conv3d.py).

Every impl must match lax's direct 3D conv bit-for-bit up to float
reassociation, across kernel sizes, strides, and TF-SAME's asymmetric
padding edge cases (odd extents), plus through the Unit3D module path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from step_tpu.ops.conv3d import conv3d_same

CASES = [
    # (B, T, H, W, C, F, kernel, stride)
    (2, 7, 9, 9, 5, 6, (3, 3, 3), (1, 1, 1)),
    (2, 6, 8, 8, 4, 5, (1, 1, 1), (1, 1, 1)),
    (2, 7, 9, 9, 3, 4, (3, 3, 3), (1, 2, 2)),
    (2, 7, 9, 9, 3, 4, (1, 1, 1), (2, 2, 2)),   # strided pointwise
    (1, 5, 6, 6, 2, 3, (5, 3, 3), (2, 1, 1)),   # odd k_t + temporal stride
    (1, 4, 5, 7, 3, 2, (3, 1, 1), (1, 1, 1)),   # temporal-only kernel
]


@pytest.mark.parametrize("impl", ["tcat", "sum3"])
@pytest.mark.parametrize("case", CASES, ids=[str(c[6]) + str(c[7]) for c in CASES])
def test_conv3d_same_parity(impl, case):
    B, T, H, W, C, F, k, s = case
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, H, W, C), jnp.float32)
    w = jnp.asarray(rng.randn(*k, C, F) * 0.1, jnp.float32)
    ref = conv3d_same(x, w, s, impl="direct")
    out = conv3d_same(x, w, s, impl=impl)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["tcat", "sum3"])
def test_unit3d_conv_impl_parity(impl):
    """Unit3D(conv_impl=...) matches the nn.Conv direct path with the SAME
    parameter tree (so checkpoints transfer between impls)."""
    from step_tpu.models.i3d import Unit3D

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 5, 8, 8, 6), jnp.float32)
    direct = Unit3D(10, (3, 3, 3), (1, 1, 1), conv_impl="direct")
    fast = Unit3D(10, (3, 3, 3), (1, 1, 1), conv_impl=impl)
    variables = direct.init(jax.random.PRNGKey(0), x)
    y_ref = direct.apply(variables, x)
    y = fast.apply(variables, x)  # same variable tree drives both
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_fastconv_bias_parity():
    """_FastConv(use_bias=True) matches nn.Conv with bias under a shared
    parameter tree (the reg_reduce / logits 1x1x1 path)."""
    import flax.linen as nn

    from step_tpu.models.i3d import _FastConv

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 4, 5, 5, 7), jnp.float32)
    ref_mod = nn.Conv(9, kernel_size=(1, 1, 1), padding="SAME", use_bias=True)
    variables = ref_mod.init(jax.random.PRNGKey(0), x)
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape), jnp.float32) * 0.1, variables
    )
    y_ref = ref_mod.apply(variables, x)
    y = _FastConv(9, (1, 1, 1), (1, 1, 1), impl="tcat", use_bias=True).apply(
        variables, x
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_detector_forward_conv_impl_invariance():
    """The full tiny detector forward is numerically invariant to
    conv3d_impl (same init seed, same variables)."""
    from step_tpu.config import StepConfig
    from step_tpu.models.detector import STEPDetector
    from step_tpu.utils.init import init_detector_cpu

    base = StepConfig(
        dataset="synthetic", num_classes=4, frames_per_chunk=2, num_chunks=3,
        num_steps=2, iou_thresholds=(0.4, 0.5), step_loss_weights=(1.0, 1.0),
        image_size=32, backbone_depth="tiny", feature_stride=8, pooled_size=4,
        max_proposals=12, compute_dtype="float32", conv3d_impl="direct",
    )
    model_d = STEPDetector(base)
    variables = init_detector_cpu(base, jax.random.PRNGKey(0), model_d)
    rgb = jnp.asarray(
        np.random.RandomState(3).rand(1, base.total_frames, 32, 32, 3),
        jnp.float32)
    props, _ = STEPDetector.initial_proposals(base, 1)
    out_d = model_d.apply(variables, rgb, props)
    for impl in ("tcat", "sum3"):
        model_f = STEPDetector(base.replace(conv3d_impl=impl))
        out_f = model_f.apply(variables, rgb, props)
        np.testing.assert_allclose(
            np.asarray(out_f["cls_logits"]), np.asarray(out_d["cls_logits"]),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out_f["tubes"]), np.asarray(out_d["tubes"]),
            rtol=1e-4, atol=1e-3)
