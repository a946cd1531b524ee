"""Measured per-program XLA compiler options for serving.

The round-4 serving sweeps (`scripts/bench_sweep.py`, VALIDATION.md) A/B'd
``xla_tpu_scoped_vmem_limit_kib`` on the optimized B=128 detect program —
coarse pass, then the fine interior sweep once 65536 won:

    default        456.8 clips/s
    32768 KiB      507.8 clips/s
    65536 KiB      517.7 clips/s   (518.0 / 518.0 in the interleaved pair)
    73728 KiB      138.8 clips/s   <- same cliff as 98304
    81920 KiB      355.1 clips/s
    90112 KiB      520.7-528.9 clips/s  <- shipped (interleaved pair run,
                                           wins every measurement)
    98304 KiB      138.8 clips/s   <- catastrophic (3.3x regression)

The response is spiky, not monotone: the fusion emitter's choices flip
discretely with the assumed per-fusion VMEM budget, and two interior
points sit on a 3.3x cliff. 90112 KiB also won the B=1 latency program's
in-context A/B (chained 6.11 vs 6.39 ms at 65536, −4.4%; p50 31.9 vs
41.2 ms through the relay). Because adjacent values CAN regress 3.3x, the
flag is applied only where measured: the optimized serving program at
B=128 and B=1 (bench.py, serve.py). Unmeasured program/batch combinations
stay on compiler defaults — bench_train measured it as noise-or-worse on
the train step, so training never sets it.

Options are passed per-compile via ``jax.jit(f).lower(*args).compile(
compiler_options=...)`` — they survive the relay's remote-compile path,
which process-level XLA_FLAGS may not.
"""

from __future__ import annotations

from typing import Optional

SERVING_VMEM_LIMIT_KIB = 90112


def serving_compiler_options(device=None,
                             vmem_limit_kib: Optional[int] = None
                             ) -> Optional[dict]:
    """The measured serving options for `device`, or None off-TPU.

    XLA:CPU (tests, the multichip dryrun) rejects TPU-only flags, so the
    helper gates on the device platform rather than letting callers guess.
    `vmem_limit_kib` overrides the measured default (serve.py exposes it
    as an explicit CLI arm).
    """
    import jax

    if device is None:
        devices = jax.devices()
        if not devices:
            return None
        device = devices[0]
    platform = getattr(device, "platform", "")
    if platform != "tpu" and "tpu" not in str(device).lower():
        return None
    limit = SERVING_VMEM_LIMIT_KIB if vmem_limit_kib is None else vmem_limit_kib
    return {"xla_tpu_scoped_vmem_limit_kib": str(limit)}


def compile_with_serving_options(jitted, *args,
                                 vmem_limit_kib: Optional[int] = None):
    """AOT-compile `jitted` for `args` with the serving options when on TPU.

    Returns ``(fn, applied)``:

    - ``(compiled, True)`` — the optioned program.
    - ``(jitted, None)`` — no options apply here (CPU/tests); the plain
      jitted callable keeps lazy per-shape specialization.
    - ``(jitted, False)`` — the backend REJECTED the options and the
      default-compiled program is running instead. Benchmark callers must
      record this (null/annotate the option fields in their JSON artifact):
      a silently-substituted default program would book a compiler-option
      A/B arm that never ran — exactly the measurement corruption the
      chained-timing rules exist to prevent.
    """
    opts = serving_compiler_options(vmem_limit_kib=vmem_limit_kib)
    if not opts:
        return jitted, None
    try:
        return jitted.lower(*args).compile(compiler_options=opts), True
    except Exception as e:  # noqa: BLE001 — fail open: a rejected option
        # must never take down the caller (bench.py is a driver artifact);
        # the un-optioned program is always valid.
        import sys

        print(f"serving compiler options rejected ({type(e).__name__}: {e});"
              " falling back to default compile", file=sys.stderr, flush=True)
        return jitted, False
