"""Trace-profile the full train step (fwd+bwd+optimizer) on the TPU.

The inference program got a trace-guided glue hunt in round 3 (449.7
clips/s); the TRAIN step (MFU 0.14 at B=16) never did. Captures a
jax.profiler trace of 3 chained steps over distinct batches and ranks
device-op time via utils/profiling.summarize_trace.

Run alone on the chip (the relay serializes clients; a concurrent TPU
process hangs the profiler).
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import argparse

import jax
import numpy as np

from step_tpu.config import PRESETS
from step_tpu.models.detector import STEPDetector
from step_tpu.utils.compile_cache import enable_compile_cache
from step_tpu.utils.profiling import summarize_trace, trace

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--log-dir", default="/tmp/step_tpu_train_trace")
    args = ap.parse_args()

    from bench_train import make_batches
    from step_tpu.parallel.distributed import make_global_batch
    from step_tpu.parallel.mesh import create_mesh, replicated_sharding
    from step_tpu.train.trainer import (create_train_state,
                                        make_parallel_train_step)

    cfg = PRESETS["ucf_3step"].replace(batch_size=args.batch)
    model = STEPDetector(cfg)
    mesh = create_mesh((1,), cfg.mesh_axes)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    state = jax.device_put(state, replicated_sharding(mesh))
    pstep = make_parallel_train_step(cfg, model, mesh)
    rng = jax.random.PRNGKey(1)

    batches = [make_global_batch({k: v for k, v in b.items() if k != "meta"},
                                 mesh)
               for b in make_batches(cfg, 6)]
    # warm: compile + settle uploads (value readbacks keep the relay honest)
    for i in range(2):
        state, m = pstep(state, batches[i], rng)
        _ = float(m["loss"])

    with trace(args.log_dir):
        for i in range(2, 5):
            state, m = pstep(state, batches[i], rng)
            _ = float(m["loss"])

    for name, ms, cnt in summarize_trace(args.log_dir, top=args.top):
        print(f"{ms / 3:10.2f} ms/step  x{cnt:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
