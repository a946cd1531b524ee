"""ROI-align impl shootout on the real TPU (the VERDICT r1 benchmark shape).

Chained timing (dependency through the boxes) — per-call timings lie on the
relay transport. Prints ms per call for the XLA matmul path and the Pallas
kernel; the faster one should be the default `roi_impl`.
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import time

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.ops.roi_align import tube_roi_align
from step_tpu.ops.roi_align_pallas import tube_roi_align_pallas
from step_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, N, T, Tp, H, W, C = 8, 16, 18, 5, 14, 14, 832
POOLED, SCALE, RATIO = 7, 1.0 / 16.0, 2
ITERS = 50


def chained(fn, feat, tubes, iters=ITERS):
    out = fn(feat, tubes)
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(iters):
        out = fn(feat, tubes)
        # Perturbation must be LARGE enough to change tubes in f32 — a
        # +1e-9 on O(100) coordinates rounds away entirely, every dispatch
        # is bit-identical, and the relay memoizes it (garbage timings).
        tubes = tubes * (1.0 + 1e-4) + jnp.mean(
            out.astype(jnp.float32)) * 1e-3 + i * 1e-3
    jax.block_until_ready(tubes)
    return (time.time() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(B, Tp, H, W, C), jnp.bfloat16)
    base = rng.rand(B, N, T, 4).astype(np.float32) * 180
    tubes = jnp.asarray(
        np.concatenate([base[..., :2], base[..., :2] + 20 + base[..., 2:]], -1)
    )

    @jax.jit
    def xla_matmul(f, t):
        return jax.vmap(
            lambda ff, tt: tube_roi_align(ff, tt, POOLED, SCALE, RATIO,
                                          impl="matmul")
        )(f, t)

    @jax.jit
    def pallas(f, t):
        return tube_roi_align_pallas(f, t, POOLED, SCALE, RATIO)

    from step_tpu.ops.roi_align import batched_tube_roi_align_kron

    @jax.jit
    def xla_kron(f, t):
        return batched_tube_roi_align_kron(f, t, POOLED, SCALE, RATIO)

    a = np.asarray(xla_matmul(feat, tubes), np.float32)
    b = np.asarray(pallas(feat, tubes), np.float32)
    c = np.asarray(xla_kron(feat, tubes), np.float32)
    print("max |pallas - xla| =", float(np.abs(a - b).max()), flush=True)
    print("max |kron   - xla| =", float(np.abs(a - c).max()), flush=True)

    t_x = chained(xla_matmul, feat, tubes)
    print(f"xla matmul : {t_x*1e3:7.3f} ms", flush=True)
    t_k = chained(xla_kron, feat, tubes)
    print(f"xla kron   : {t_k*1e3:7.3f} ms  ({t_x/t_k:.2f}x vs xla)", flush=True)
    t_p = chained(pallas, feat, tubes)
    print(f"pallas v3  : {t_p*1e3:7.3f} ms  ({t_x/t_p:.2f}x vs xla)", flush=True)


if __name__ == "__main__":
    main()
