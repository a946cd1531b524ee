"""int8 blockwise Adam moments (train/optim_int8.py): log-code error
bounds, update parity vs fp32 scale_by_adam, optimization quality, state
size accounting, and trainer integration via cfg.adam_moments="int8"."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from step_tpu.train.optim_int8 import (DEFAULT_BLOCK, R_SIGNED, R_UNSIGNED,
                                       adamw_int8, dequantize_blockwise,
                                       quantize_blockwise,
                                       scale_by_adam_int8)


def _blockmax(x):
    flat = np.abs(np.asarray(x, np.float32)).reshape(-1)
    pad = (-flat.size) % DEFAULT_BLOCK
    return np.pad(flat, (0, pad)).reshape(-1, DEFAULT_BLOCK).max(axis=1)


@pytest.mark.parametrize("signed,R,L", [(True, R_SIGNED, 127),
                                        (False, R_UNSIGNED, 255)])
def test_quantize_roundtrip_relative_bound(signed, R, L):
    """The log code's contract: every element whose magnitude is within
    the per-block range (>= absmax*exp(-R)) round-trips with relative
    error <= half a log step (e^(R/(2(L-1))) - 1); below-range values
    clamp UP to the range floor (never to zero — Adam denominators must
    not collapse); exact zeros round-trip exactly."""
    rng = np.random.RandomState(0)
    half_step = np.exp(R / (2 * (L - 1))) - 1.0 + 1e-6
    for shape in [(300,), (256,), (513,), (3, 5, 17)]:
        mag = 10.0 ** rng.uniform(-9, 1, size=shape)   # 10 decades
        x = mag if not signed else mag * rng.choice([-1.0, 1.0], size=shape)
        x = jnp.asarray(x, jnp.float32)
        back = np.asarray(dequantize_blockwise(
            quantize_blockwise(x, signed=signed), x.shape))
        xn = np.asarray(x)
        bm = np.repeat(_blockmax(x), DEFAULT_BLOCK)[:xn.size].reshape(shape)
        floor = bm * np.exp(-R)
        in_range = np.abs(xn) >= floor
        rel = np.abs(back - xn) / np.maximum(np.abs(xn), 1e-37)
        assert (rel[in_range] <= half_step).all(), rel[in_range].max()
        # below-range: clamped up to ~the floor, same sign, never zero
        below = ~in_range & (xn != 0)
        if below.any():
            assert (np.sign(back[below]) == np.sign(xn[below])).all()
            assert (np.abs(back[below]) >= np.abs(xn[below])).all()
            assert (np.abs(back[below]) <= floor[below] * (1 + half_step)).all()


def test_quantize_zeros_exact():
    z = jnp.zeros((100, 7), jnp.float32)
    for signed in (True, False):
        np.testing.assert_array_equal(
            dequantize_blockwise(quantize_blockwise(z, signed=signed),
                                 z.shape), 0.0)


def test_scale_by_adam_int8_tracks_fp32_updates():
    """Over several steps on random gradients, the int8-state updates stay
    within ~8% of fp32 scale_by_adam's update scale — the log code's
    bounded per-element relative error, NOT the unbounded small-denominator
    explosion linear int8 suffered (2.7x the update scale, the bug this
    module's docstring records)."""
    rng = np.random.RandomState(42)
    params = {"w": jnp.asarray(rng.randn(517), jnp.float32),
              "b": jnp.asarray(rng.randn(30), jnp.float32)}
    ref = optax.scale_by_adam()
    q8 = scale_by_adam_int8()
    s_ref, s_q8 = ref.init(params), q8.init(params)
    for _ in range(8):
        g = jax.tree.map(
            lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)
        u_ref, s_ref = ref.update(g, s_ref)
        u_q8, s_q8 = q8.update(g, s_q8)
        for k in params:
            a, b = np.asarray(u_ref[k]), np.asarray(u_q8[k])
            scale = np.abs(a).max() + 1e-8
            assert np.abs(a - b).max() <= 0.08 * scale, (
                k, np.abs(a - b).max() / scale)


def test_adamw_int8_optimizes_quadratic():
    """Both optimizers drive ||x - target||^2 to near zero in 200 steps;
    int8 must land within the same quality regime as fp32 (the ~7%
    per-element LR perturbation must not stall convergence)."""
    target = jnp.asarray(np.random.RandomState(3).randn(400), jnp.float32)

    def run(opt):
        x = jnp.zeros_like(target)
        state = opt.init(x)

        @jax.jit
        def step(x, state):
            loss, g = jax.value_and_grad(
                lambda x: jnp.sum((x - target) ** 2))(x)
            updates, state = opt.update(g, state, x)
            return optax.apply_updates(x, updates), state, loss

        for _ in range(200):
            x, state, loss = step(x, state)
        return float(loss)

    loss8 = run(adamw_int8(1e-1, weight_decay=0.0))
    loss32 = run(optax.adamw(1e-1, weight_decay=0.0))
    # initial loss is ~400; both must collapse it by >1e4x
    assert loss8 < 1e-2, (loss8, loss32)


def test_int8_state_is_quarter_size():
    """Resident optimizer-moment bytes ~2.03/param vs 8 fp32 (both moments,
    block scales included): assert < 0.3x."""
    params = {"a": jnp.zeros((1024, 64)), "b": jnp.zeros((999,))}
    s8 = scale_by_adam_int8().init(params)
    s32 = optax.scale_by_adam().init(params)
    nbytes = lambda t: sum(x.size * x.dtype.itemsize
                           for x in jax.tree.leaves(t))
    assert nbytes((s8.mu, s8.nu)) < 0.3 * nbytes((s32.mu, s32.nu))


def test_trainer_int8_moments_end_to_end():
    """cfg.adam_moments='int8' trains the tiny detector: loss finite and
    decreasing over 3 steps, and the moment leaves are int8/uint8
    resident."""
    from tests.test_train import CFG, _accum_batch

    cfg = CFG.replace(adam_moments="int8", dropout_rate=0.0)
    from step_tpu.models.detector import STEPDetector
    from step_tpu.train.trainer import create_train_state, train_step

    model = STEPDetector(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    from step_tpu.train.optim_int8 import ScaleByAdamInt8State
    q_states = [s for s in jax.tree.leaves(
        state.opt_state,
        is_leaf=lambda x: isinstance(x, ScaleByAdamInt8State))
        if isinstance(s, ScaleByAdamInt8State)]
    assert q_states, "int8 moment state not found in opt_state"
    dtypes = {x.dtype for qs in q_states
              for x in jax.tree.leaves((qs.mu, qs.nu))}
    assert jnp.dtype(jnp.int8) in dtypes and jnp.dtype(jnp.uint8) in dtypes
    batch = _accum_batch(cfg, cfg.batch_size)
    losses = []
    for i in range(3):
        state, m = train_step(state, batch, jax.random.PRNGKey(i), cfg, model)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses


def test_adam_moments_config_validation():
    from tests.test_train import CFG

    with pytest.raises(ValueError, match="adam_moments"):
        CFG.replace(adam_moments="int4")
    with pytest.raises(ValueError, match="adam_mu_dtype"):
        CFG.replace(adam_moments="int8", adam_mu_dtype="bfloat16")


def test_int8_opt_state_checkpoint_roundtrip(tmp_path):
    """orbax save/restore preserves the int8/uint8 moment blocks and
    scales exactly (resume must not perturb the quantized trajectory)."""
    from tests.test_train import CFG, _accum_batch
    from step_tpu.models.detector import STEPDetector
    from step_tpu.train.trainer import create_train_state, train_step
    from step_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    cfg = CFG.replace(adam_moments="int8", dropout_rate=0.0)
    model = STEPDetector(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    batch = _accum_batch(cfg, cfg.batch_size)
    state, _ = train_step(state, batch, jax.random.PRNGKey(1), cfg, model)
    save_checkpoint(str(tmp_path), state)
    fresh = create_train_state(cfg, jax.random.PRNGKey(9), model)
    restored, _ = restore_checkpoint(str(tmp_path), fresh)
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
