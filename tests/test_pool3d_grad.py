"""Custom max-pool backwards (ops/pool3d_grad.py) vs XLA select-and-scatter.

The value is identical by construction (same reduce_window / separable
max); the gradient must match jax.grad of the raw reduce_window to fp
accumulation order on tie-free inputs (tie semantics differ deliberately:
all tied maxima are credited — any subgradient of max is valid).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from step_tpu.ops.pool3d_grad import (_reduce_window_max,
                                      max_pool_3d_cheapgrad,
                                      max_pool_3d_s1_sepgrad)


CASES = [
    ((3, 3, 3), (1, 1, 1), (2, 5, 7, 7, 8)),
    ((3, 3, 3), (2, 2, 2), (1, 7, 14, 14, 4)),   # strided + asymmetric SAME
    ((1, 3, 3), (1, 2, 2), (2, 6, 9, 11, 3)),
    ((2, 2, 2), (2, 2, 2), (1, 8, 8, 8, 5)),
    ((3, 3, 3), (1, 1, 1), (1, 1, 7, 7, 2)),     # tail-pool-like tiny dims
]


@pytest.mark.parametrize("window,stride,shape", CASES)
def test_cheapgrad_matches_select_and_scatter(window, stride, shape):
    rng = np.random.RandomState(hash((window, shape)) % 2**31)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    ref_y, ref_vjp = jax.vjp(
        lambda a: _reduce_window_max(a, window, stride), x)
    new_y, new_vjp = jax.vjp(
        lambda a: max_pool_3d_cheapgrad(a, window, stride), x)
    np.testing.assert_array_equal(np.asarray(ref_y), np.asarray(new_y))
    g = jnp.asarray(rng.randn(*ref_y.shape).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ref_vjp(g)[0]),
                               np.asarray(new_vjp(g)[0]), atol=5e-6)


@pytest.mark.parametrize("window,stride,shape",
                         [c for c in CASES if c[1] == (1, 1, 1)])
def test_sepgrad_matches_select_and_scatter(window, stride, shape):
    rng = np.random.RandomState(hash(("sep", window, shape)) % 2**31)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    ref_y, ref_vjp = jax.vjp(
        lambda a: _reduce_window_max(a, window, stride), x)
    new_y, new_vjp = jax.vjp(
        lambda a: max_pool_3d_s1_sepgrad(a, window), x)
    np.testing.assert_array_equal(np.asarray(ref_y), np.asarray(new_y))
    g = jnp.asarray(rng.randn(*ref_y.shape).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ref_vjp(g)[0]),
                               np.asarray(new_vjp(g)[0]), atol=5e-6)


def test_sepgrad_primal_is_single_reduce_window():
    # inference programs must stay single-op: the separable stages exist
    # only under differentiation (the custom_vjp fwd rule)
    x = jnp.zeros((1, 4, 8, 8, 3), jnp.float32)
    hlo = jax.jit(
        lambda a: max_pool_3d_s1_sepgrad(a, (3, 3, 3))
    ).lower(x).as_text()
    assert hlo.count("reduce_window") == 1   # StableHLO spelling
