"""Trace the production TRAIN step and rank device-op time.

The inference program got a trace-ranked glue study in round 3 (413 → 450
clips/s); the train step (fwd+bwd+AdamW, MFU 0.136 at B=16) never did.
Capture a jax.profiler trace of `make_parallel_train_step` on fresh
synthetic batches and rank per-fusion device time — candidates are bwd
conv emitters, the ROI-align custom VJP, loss-matching glue, and the
optimizer update. Never run while another process uses the chip (the
relay serializes; a concurrent client hangs the profiler).

Usage: python scripts/trace_train.py [--batch 16] [--top 40] [--remat]
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import argparse

import jax
import jax.numpy as jnp
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
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--remat", action="store_true",
                    help="trace the remat_steps=True lowering instead")
    args = ap.parse_args()

    from step_tpu.data.pipeline import build_model_batch
    from step_tpu.data.synthetic import SyntheticConfig, make_batch
    from step_tpu.parallel.distributed import make_global_batch
    from step_tpu.parallel.mesh import create_mesh, replicated_sharding
    from step_tpu.train.trainer import (create_train_state,
                                        make_parallel_train_step)

    cfg = PRESETS["ucf_3step"].replace(batch_size=args.batch,
                                       remat_steps=args.remat)
    model = STEPDetector(cfg)
    mesh = create_mesh((1,), cfg.mesh_axes)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    state = jax.device_put(state, replicated_sharding(mesh))
    pstep = make_parallel_train_step(cfg, model, mesh)
    rng = jax.random.PRNGKey(1)

    syn = SyntheticConfig(image_size=cfg.image_size,
                          num_frames=cfg.total_frames,
                          num_classes=cfg.num_classes,
                          max_boxes=cfg.max_gt_tubes)
    batches = []
    for i in range(args.iters + 1):
        raw = build_model_batch(make_batch(i * cfg.batch_size, cfg.batch_size,
                                           syn),
                                cfg, train=True, seed=i,
                                emit_uint8=cfg.uint8_transfer)
        batches.append(make_global_batch(
            {k: v for k, v in raw.items() if k != "meta"}, mesh))

    state, m = pstep(state, batches[-1], rng)        # compile + settle
    _ = float(m["loss"])

    log_dir = "/tmp/step_tpu_trace_train"
    with trace(log_dir):
        for i in range(args.iters):
            # per-step VALUE readback keeps the relay honest (CLAUDE.md)
            state, m = pstep(state, batches[i], rng)
            _ = float(m["loss"])

    rows = summarize_trace(log_dir, top=args.top)
    total = sum(ms for name, ms, n in rows
                if not name.startswith(("jit_", "while")))
    print(f"{'op':60s} {'ms':>9s} {'n':>5s}")
    for name, ms, n in rows:
        print(f"{name[:60]:60s} {ms:9.2f} {n:5d}")
    print(f"\n(visible leaf-op total ~{total:.1f} ms over {args.iters} iters)")


if __name__ == "__main__":
    main()
