"""Microbenchmark: 1x1x1 conv3d vs 2D-conv-over-(B*T) vs reshape+matmul,
plus the s2d stem conv (temporal stride 2) vs its temporal-taps-to-channels
2D form. Companion to bench_conv3d.py (which covers 3x3x3)."""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import time

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

ITERS = 30
DN3 = ("NDHWC", "DHWIO", "NDHWC")
DN2 = ("NHWC", "HWIO", "NHWC")


def chained(fn, x, w, iters=ITERS):
    f = jax.jit(fn)
    y = f(x, w)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(iters):
        y = f(x, w)
        x = x * (1.0 + jnp.tanh(jnp.mean(y)).astype(x.dtype) * 1e-3)
    jax.block_until_ready(x)
    return (time.time() - t0) / iters


def c3d(x, w):
    return jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                        dimension_numbers=DN3)


def c2d(x, w):
    B, T, H, W, C = x.shape
    y = jax.lax.conv_general_dilated(
        x.reshape(B * T, H, W, C), w[0], (1, 1), "SAME",
        dimension_numbers=DN2)
    return y.reshape(B, T, H, W, -1)


def mm(x, w):
    B, T, H, W, C = x.shape
    y = x.reshape(-1, C) @ w.reshape(C, -1)
    return y.reshape(B, T, H, W, -1)


SHAPES = [
    ("m4f_b0", 64, 5, 14, 14, 528, 256),
    ("tail5c_b0", 1024, 5, 7, 7, 832, 384),
    ("conv2b", 64, 9, 56, 56, 64, 64),
    ("m3b_b1a", 64, 9, 28, 28, 192, 96),
]


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    for label, B, T, H, W, Cin, Cout in SHAPES:
        rng = np.random.RandomState(0)
        x = jax.device_put(jnp.asarray(rng.rand(B, T, H, W, Cin),
                                       jnp.bfloat16), dev)
        w = jax.device_put(jnp.asarray(rng.rand(1, 1, 1, Cin, Cout) * 0.05,
                                       jnp.bfloat16), dev)
        gflop = 2 * B * T * H * W * Cin * Cout / 1e9
        line = f"{label:11s} {gflop:7.1f} GF "
        for name, fn in [("c3d", c3d), ("c2d", c2d), ("mm", mm)]:
            t = chained(fn, x, w)
            mfu = gflop / 197e3 / t * 100
            line += f"| {name} {t*1e3:7.2f} ms {mfu:5.1f}% "
        print(line, flush=True)

    # ---- s2d stem conv: current conv3d form vs tcat-2D form ----
    from step_tpu.ops.stem_conv import space_to_depth_conv3d, \
        space_to_depth_kernel, tf_same_pads

    B, T, H, W, C, F = 64, 18, 224, 224, 3, 64
    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(rng.rand(B, T, H, W, C), jnp.bfloat16), dev)
    w = jax.device_put(jnp.asarray(rng.rand(7, 7, 7, C, F) * 0.05,
                                   jnp.bfloat16), dev)

    def s2d_cur(x, w):
        return space_to_depth_conv3d(x, w, (2, 2, 2))

    def s2d_tcat(x, w):
        # s2d input as today, then temporal taps -> channels, 2D conv.
        B, T, H, W, C = x.shape
        kt = w.shape[0]
        st = 2
        pl_h, pr_h = tf_same_pads(H, 7, 2)
        xp = jnp.pad(x, ((0, 0), (0, 0), (pl_h, pr_h + (H + pl_h + pr_h) % 2),
                         (pl_h, pr_h + (W + pl_h + pr_h) % 2), (0, 0)))
        Hp, Wp = xp.shape[2] // 2, xp.shape[3] // 2
        xs = xp.reshape(B, T, Hp, 2, Wp, 2, C)
        xs = xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, Hp, Wp, 4 * C)
        ks = space_to_depth_kernel(w)          # [7, 4, 4, 12, F]
        pt = tf_same_pads(T, kt, st)
        xt = jnp.pad(xs, ((0, 0), pt, (0, 0), (0, 0), (0, 0)))
        To = -(-T // st)
        taps = [xt[:, i : i + To * st : st] for i in range(kt)]
        xc = jnp.concatenate(taps, axis=-1)     # [B,To,Hp,Wp,kt*12]
        wc = jnp.transpose(ks, (1, 2, 0, 3, 4)).reshape(4, 4, kt * 4 * C, F)
        y = jax.lax.conv_general_dilated(
            xc.reshape(B * To, Hp, Wp, kt * 4 * C), wc, (1, 1), "VALID",
            dimension_numbers=DN2)
        return y.reshape(B, To, y.shape[1], y.shape[2], F)

    ya = jax.jit(s2d_cur)(x, w)
    yb = jax.jit(s2d_tcat)(x, w)
    print("s2d shapes:", ya.shape, yb.shape, flush=True)
    if ya.shape == yb.shape:
        err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) -
                                    yb.astype(jnp.float32))))
        print(f"s2d tcat parity err: {err}", flush=True)
    gflop = 2 * B * 9 * 112 * 112 * 7 * 7 * 7 * C * F / 1e9
    for name, fn in [("cur", s2d_cur), ("tcat", s2d_tcat)]:
        t = chained(fn, x, w)
        print(f"stem_s2d {name}: {t*1e3:7.2f} ms {gflop/197e3/t*100:5.1f}% MFU",
              flush=True)


if __name__ == "__main__":
    main()
