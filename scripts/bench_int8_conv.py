"""Does XLA-TPU lower int8 conv3d at the MXU's double int8 rate?

Probe for a quantized serving mode: the v5e MXU advertises 2x int8
throughput vs bf16 (394 vs 197 TOP/s). If ``lax.conv_general_dilated``
with int8 operands + int32 accumulation hits anywhere near that, a
post-training-quantized detect path is worth building; if XLA upcasts
(or lowers off the MXU), this records the negative result.

Shapes: one mid-net Inception conv (14x14 spatial, full batch) and one
refinement-tail conv (pooled-tube batch, 7x7 spatial) — the two families
that bound the optimized program per VALIDATION.md's trace study.

Relay-safe timing: every iteration feeds the previous output back into
the input (true data dependency; int8 wraparound keeps values live), one
readback at the end.
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from step_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

ITERS = 20


def bench(label, B, D, H, W, Cin, Cout, k, dtype):
    rng = np.random.RandomState(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.randint(-127, 127, (B, D, H, W, Cin)), jnp.int8)
        w = jnp.asarray(rng.randint(-127, 127, (k, k, k, Cin, Cout)), jnp.int8)
        acc = jnp.int32
    else:
        x = jnp.asarray(rng.rand(B, D, H, W, Cin), dtype)
        w = jnp.asarray(rng.rand(k, k, k, Cin, Cout) * 0.01, dtype)
        acc = jnp.float32

    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NDHWC", "DHWIO", "NDHWC"))

    @jax.jit
    def step(x):
        y = lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                     dimension_numbers=dn,
                                     preferred_element_type=acc)
        reps = -(-Cin // Cout)
        y = jnp.tile(y, (1, 1, 1, 1, reps))[..., :Cin]
        if dtype == jnp.int8:
            # wrap back to int8: keep the chain data-dependent
            return (y & 0x7F).astype(jnp.int8) - 64
        return (y * 1e-2).astype(dtype)

    x = jax.device_put(x)
    out = step(x)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(ITERS):
        out = step(out)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS
    flops = 2 * B * D * H * W * Cout * Cin * k ** 3
    print(f"{label:26s} {np.dtype(dtype).name:8s}: {dt*1e3:8.2f} ms  "
          f"{flops/dt/1e12:6.1f} T{'OP' if dtype==jnp.int8 else 'FLOP'}/s",
          flush=True)


def main():
    shapes = [
        ("mixed4-like 14x14", 128, 9, 14, 14, 480, 256, 3),
        ("tail 7x7 (B*P=2048)", 2048, 2, 7, 7, 832, 256, 3),
    ]
    for label, B, D, H, W, Cin, Cout, k in shapes:
        for dtype in (jnp.bfloat16, jnp.int8):
            bench(label, B, D, H, W, Cin, Cout, k, dtype)


if __name__ == "__main__":
    main()
