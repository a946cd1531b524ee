"""Microbenchmark: XLA conv3d vs temporal-decomposed formulations on TPU.

Hypothesis: a k_t x k_h x k_w conv3d can be recast as a single 2D conv over
the (B*T) batch with the temporal taps folded into input channels
(x_cat[t] = concat(x[t-1], x[t], x[t+1]) on the channel axis, kernel
reshaped to [k_h, k_w, 3*C, F]).  More input channels => better MXU
utilization; one big conv2d instead of a 3-spatial-dim convolution the TPU
backend may tile worse.

Also measures the "sum of 3 shifted conv2d" variant (no 3x activation blowup,
relies on XLA fusing the adds).

Chained timing only (relay transport memoizes / early-acks: see
utils/profiling.py).
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

ITERS = 30
DN3 = ("NDHWC", "DHWIO", "NDHWC")
DN2 = ("NHWC", "HWIO", "NHWC")


def conv3d_direct(x, w, stride=(1, 1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="SAME", dimension_numbers=DN3
    )


def conv3d_tcat(x, w, stride=(1, 1, 1)):
    """Temporal taps -> channels, then one 2D conv over (B*T)."""
    B, T, H, W, C = x.shape
    kt, kh, kw, _, F = w.shape
    assert stride[0] == 1, "temporal stride folded variant not needed here"
    pads = kt // 2
    xp = jnp.pad(x, ((0, 0), (pads, pads), (0, 0), (0, 0), (0, 0)))
    taps = [xp[:, i : i + T] for i in range(kt)]
    xc = jnp.concatenate(taps, axis=-1)                   # [B,T,H,W,kt*C]
    xc = xc.reshape(B * T, H, W, kt * C)
    wc = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(kh, kw, kt * C, F)
    y = jax.lax.conv_general_dilated(
        xc, wc, window_strides=stride[1:], padding="SAME",
        dimension_numbers=DN2,
    )
    return y.reshape(B, T, y.shape[1], y.shape[2], F)


def conv3d_sum3(x, w, stride=(1, 1, 1)):
    """Sum of kt shifted 2D convs over (B*T)."""
    B, T, H, W, C = x.shape
    kt, kh, kw, _, F = w.shape
    pads = kt // 2
    xp = jnp.pad(x, ((0, 0), (pads, pads), (0, 0), (0, 0), (0, 0)))
    y = None
    for i in range(kt):
        xi = xp[:, i : i + T].reshape(B * T, H, W, C)
        yi = jax.lax.conv_general_dilated(
            xi, w[i], window_strides=stride[1:], padding="SAME",
            dimension_numbers=DN2,
        )
        y = yi if y is None else y + yi
    return y.reshape(B, T, y.shape[1], y.shape[2], F)


def chained(fn, x, w, iters=ITERS):
    """x is HELD IN FLOAT32 and perturbed in float32 between iterations —
    a bf16 perturbation of 1 + O(1e-3) rounds back to exactly 1.0 (bf16 eps
    7.8e-3), making every dispatch bit-identical; the relay transport
    memoizes identical dispatches and the timing collapses to garbage."""
    @jax.jit
    def f(x32, w, i):
        y = fn(x32.astype(jnp.bfloat16), w)
        scale = 1.0 + jnp.tanh(jnp.mean(y.astype(jnp.float32))) * 1e-4 + i * 1e-6
        return x32 * scale

    x = f(x, w, jnp.float32(0.5))
    jax.block_until_ready(x)
    t0 = time.time()
    for i in range(iters):
        x = f(x, w, jnp.float32(i))
    jax.block_until_ready(x)
    return (time.time() - t0) / iters


SHAPES = [
    # (label, B, T, H, W, Cin, Cout, kt)
    ("conv2c_3x3x3", 64, 9, 56, 56, 64, 192, 3),
    ("m3b_b1b", 64, 9, 28, 28, 96, 128, 3),
    ("m3c_b1b", 64, 9, 28, 28, 128, 192, 3),
    ("m4f_b1b", 64, 5, 14, 14, 160, 320, 3),
    ("tail5b_b1b", 1024, 5, 7, 7, 160, 320, 3),
    ("tail5c_b1b", 1024, 5, 7, 7, 192, 384, 3),
]


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    for label, B, T, H, W, Cin, Cout, kt in SHAPES:
        rng = np.random.RandomState(0)
        x = jax.device_put(
            jnp.asarray(rng.rand(B, T, H, W, Cin), jnp.float32), dev)
        w = jax.device_put(
            jnp.asarray(rng.rand(kt, 3, 3, Cin, Cout) * 0.05, jnp.bfloat16),
            dev)
        gflop = 2 * B * T * H * W * Cin * Cout * kt * 9 / 1e9
        res = {}
        for name, fn in [("direct", conv3d_direct), ("tcat", conv3d_tcat),
                         ("sum3", conv3d_sum3)]:
            try:
                # parity first
                ya = conv3d_direct(x, w)
                yb = jax.jit(fn)(x, w)
                err = float(jnp.max(jnp.abs(
                    ya.astype(jnp.float32) - yb.astype(jnp.float32))))
                t = chained(fn, x, w)
                res[name] = (t, err)
            except Exception as e:  # noqa: BLE001
                res[name] = (float("nan"), str(e)[:60])
        line = f"{label:14s} {gflop:8.1f} GF "
        for name in ("direct", "tcat", "sum3"):
            t, err = res[name]
            mfu = gflop / 197e3 / t * 100 if t == t else float("nan")
            line += f"| {name} {t*1e3:7.2f} ms {mfu:5.1f}% MFU "
        print(line, flush=True)
        # parity notes
        for name in ("tcat", "sum3"):
            _, err = res[name]
            if isinstance(err, float) and err > 1.0:
                print(f"  WARNING {label}/{name} parity err {err}", flush=True)


if __name__ == "__main__":
    main()
