"""Tracing / profiling utilities (SURVEY §5: the reference has none; we add
first-class observability).

- `trace(...)`: context manager around `jax.profiler` writing a Perfetto/
  TensorBoard trace directory.
- `program_report(fn, *args)`: compile a jitted fn and report XLA's own cost
  analysis (FLOPs, bytes accessed) plus measured wall time — the quick "is
  this op MXU-bound or HBM-bound" check.
- `chained_timer(...)`: wall-time of N data-dependent executions with one
  readback — the only timing methodology that survives transports which ack
  block_until_ready early or memoize identical dispatches (see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/step_tpu_trace"):
    """Capture a profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def program_report(fn: Callable, *args, n_timed: int = 10) -> dict:
    """Compile `fn(*args)` and report cost analysis + measured time."""
    jitted = jax.jit(fn)
    t0 = time.time()
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    compile_s = time.time() - t0

    cost = compiled.cost_analysis() or {}
    if isinstance(cost, list):  # older jax returns a per-device list
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_timed):
        jax.block_until_ready(compiled(*args))
    wall = (time.time() - t0) / n_timed

    report = {
        "compile_s": compile_s,
        "wall_s": wall,
        "flops": flops,
        "bytes_accessed": bytes_accessed,
        "tflops_per_s": flops / wall / 1e12 if wall > 0 else 0.0,
        "gbytes_per_s": bytes_accessed / wall / 1e9 if wall > 0 else 0.0,
    }
    return report


def chained_timer(
    step_fn: Callable,
    init_carry,
    iters: int = 30,
    readback: Optional[Callable] = None,
):
    """Time `iters` data-dependent applications of `step_fn(carry) -> carry`
    with one final readback. Returns seconds per iteration."""
    carry = step_fn(init_carry)
    _ = jax.block_until_ready(carry)
    if readback:
        readback(carry)
    # Continue the timed chain from the WARMUP OUTPUT: restarting from
    # init_carry would make iteration 1 byte-identical to the warmup
    # dispatch, which the relay transport memoizes (CLAUDE.md) — biasing
    # the mean low by ~1/iters.
    t0 = time.time()
    for _ in range(iters):
        carry = step_fn(carry)
    if readback:
        readback(carry)
    else:
        jax.block_until_ready(carry)
    return (time.time() - t0) / iters


def summarize_trace(log_dir: str, top: int = 25):
    """Aggregate device-op durations from a `trace(...)` capture.

    Round-2 finding: jax.profiler DOES capture the TPU device lane through
    the axon relay — per-fusion events with real durations. This parses the
    Perfetto JSON and returns [(op_name, total_ms, count)] sorted by time,
    device ops only. Note the root jit event and `while` bodies NEST their
    children, so the top entries overlap (root ≈ whole program, while.N ≈
    the scan); read them as a hierarchy, not a sum.
    """
    import collections
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pids.items() if "TPU" in str(n)}
    agg, cnt = collections.Counter(), collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e["pid"] in dev_pids:
            name = e["name"].split("(")[0]
            agg[name] += e.get("dur", 0)
            cnt[name] += 1
    return [(name, d / 1e3, cnt[name]) for name, d in agg.most_common(top)]
