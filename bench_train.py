"""Training benchmark: clips/sec/chip for the full train step (fwd + bwd +
optimizer), plus the production fit() loop with its double-buffered input
pipeline.

Prints ONE JSON line, e.g.:
  {"metric": "train_clips_per_sec_per_chip", "value": N, "unit": "clips/s",
   "step_ms": N, "mfu": N, "fit_clips_per_sec": N, ...}

Methodology (CLAUDE.md): the relay transport memoizes identical dispatches
and acks uploads early, so (a) every timed step consumes a DISTINCT
pre-uploaded batch, (b) steps chain through the donated train state, (c)
one scalar readback closes the chain. The `fit_clips_per_sec` field runs
the real fit() loop (loader threads + double-buffered device_put) over an
in-memory synthetic dataset and reports its flush-windowed average — the
number users see in training logs.
"""

import argparse
import json
import os
import sys
import tempfile
import time


def _phase(msg):
    """Progress marker on stderr (the JSON contract owns stdout) — phase
    timings are the first diagnostic when the relay stalls mid-benchmark."""
    print(f"[bench_train {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import PRESETS
from step_tpu.models.detector import STEPDetector
from step_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

PEAK_BF16_FLOPS = 197e12
# B=32 won the round-4 batch sweep (87.03 clips/s with remat+dots vs 78.82
# at B=16); B=64 OOMs even with remat=dots (see .sweeps/train_r4.jsonl).
BATCH = 32
ITERS = 10
# 30 steps = one 20-step flush window (absorbs the compile) + a clean
# 10-step window; the parser keeps the LAST window's clips/s.
FIT_STEPS = 30


def make_batches(cfg, n, seed=0):
    from step_tpu.data.pipeline import build_model_batch
    from step_tpu.data.synthetic import SyntheticConfig, make_batch

    syn = SyntheticConfig(image_size=cfg.image_size,
                          num_frames=cfg.total_frames,
                          num_classes=cfg.num_classes,
                          max_boxes=cfg.max_gt_tubes)
    out = []
    for i in range(n):
        raw = make_batch(seed + i * cfg.batch_size, cfg.batch_size, syn)
        out.append(build_model_batch(raw, cfg, train=True, seed=i,
                                     emit_uint8=cfg.uint8_transfer))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unroll", action="store_true",
                    help="time the scan_unroll=True lowering of the train "
                         "step (identical math; A/B vs the rolled scan)")
    ap.add_argument("--batch", type=int, default=BATCH,
                    help="train batch size (default %(default)s)")
    ap.add_argument("--remat", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="rematerialize the refinement scan body "
                         "(cfg.remat_steps; default: the config default, "
                         "now ON) — --no-remat times the stored-activation "
                         "lowering")
    ap.add_argument("--freeze", nargs="*", default=(),
                    help="freeze_submodules names (finetune policy) — "
                         "measures the skipped-backward saving, e.g. "
                         "--freeze features")
    ap.add_argument("--skip-fit", action="store_true",
                    help="device-step timing only (skip the fit() loop "
                         "arms — for quick A/Bs)")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    help="comma-separated cfg overrides, e.g. "
                         "scan_broadcast_inputs=True (repeatable, matching "
                         "every other CLI's --set — a plain store silently "
                         "dropped all but the last flag, mislabeling "
                         "composed arms)")
    ap.add_argument("--vmem-limit-kib", type=int, default=None,
                    help="A/B arm: compile the train step with "
                         "xla_tpu_scoped_vmem_limit_kib=<N>. MEASURED on "
                         "the train step in the r4c queue: 32768 is noise "
                         "(88.25 clips/s, inside the ±2%% spread) and "
                         "65536's compile blew the 1500 s arm timeout — "
                         "the serving win does not transfer, so this "
                         "stays an explicit arm for future hardware "
                         "(VALIDATION.md queue-v3 follow-ups).")
    ap.add_argument("--donate-batch", action="store_true",
                    help="also donate the batch buffers to the step "
                         "(each uploaded batch is consumed exactly once)")
    ap.add_argument("--iters", type=int, default=None,
                    help="timed steps (default: 10, auto-reduced for "
                         "large batches to cap resident input HBM at "
                         "~2 GB)")
    args = ap.parse_args()
    cfg = PRESETS["ucf_3step"].replace(batch_size=args.batch,
                                       scan_unroll=args.unroll,
                                       freeze_submodules=tuple(args.freeze))
    if args.remat is not None:
        cfg = cfg.replace(remat_steps=args.remat)
    if args.overrides:
        from step_tpu.utils.cli import apply_overrides

        # apply_overrides itself splits comma-joined pairs (and, unlike a
        # naive split here, keeps tuple literals intact).
        cfg = apply_overrides(cfg, args.overrides)
    from step_tpu.parallel.mesh import create_mesh, replicated_sharding
    from step_tpu.parallel.distributed import make_global_batch
    from step_tpu.train.trainer import (create_train_state,
                                        make_parallel_train_step)

    model = STEPDetector(cfg)
    mesh = create_mesh((1,), cfg.mesh_axes)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    state = jax.device_put(state, replicated_sharding(mesh))
    pstep = make_parallel_train_step(cfg, model, mesh,
                                     donate_batch=args.donate_batch)
    rng = jax.random.PRNGKey(1)

    # ---- device-chained step throughput over distinct uploaded batches ----
    # Every timed step needs a DISTINCT resident batch (relay memoization,
    # module docstring), so HBM pays (iters+1) x batch bytes up front. At
    # B=128/224px that is 332 MB/batch — 11 resident batches (3.7 GB) OOM'd
    # a program whose own footprint fits, so large-batch arms scale the
    # step count down to cap input residency at ~2 GB (still >= 4 timed
    # steps; the JSON carries the actual count as "timed_steps").
    batch_bytes = int(cfg.batch_size * cfg.total_frames
                      * cfg.image_size * cfg.image_size * 3
                      * (1 if cfg.uint8_transfer else 4))
    if args.iters is None:
        iters = max(4, min(ITERS, int(2e9 // max(batch_bytes, 1)) - 1))
    elif args.iters < 3:
        # the first 2 timed steps are discarded as settle (np.mean(times[2:])
        # would be NaN) — reject rather than emit an invalid JSON record
        ap.error("--iters must be >= 3 (steps 1-2 are discarded as settle)")
    else:
        iters = args.iters
    _phase(f"making host batches ({iters} timed steps)")
    host_batches = make_batches(cfg, iters + 1)
    _phase("uploading batches")
    dev_batches = [make_global_batch(
        {k: v for k, v in b.items() if k != "meta"}, mesh)
        for b in host_batches]
    _phase("compiling train step")
    t0 = time.time()
    vmem_applied = None
    # `is not None`: 0 is an explicit compiler-defaults arm (bench.py's
    # documented --latency-vmem-kib semantics), not an absent flag — a
    # truthiness test silently dropped it (ADVICE r4). 0 compiles nothing
    # extra here because the default program IS the compiler-defaults arm.
    if args.vmem_limit_kib == 0:
        vmem_applied = True     # the default program IS the 0 (defaults) arm
    elif args.vmem_limit_kib is not None:
        # Per-program compiler option (survives the relay's remote-compile
        # path, unlike process-level XLA_FLAGS). The shared helper gates on
        # TPU and fails open if the backend rejects the flag, so a bad arm
        # still produces a benchmark line — with vmem_applied=False in the
        # JSON so the line cannot be booked as the optioned arm.
        from step_tpu.utils.compile_opts import compile_with_serving_options

        pstep, vmem_applied = compile_with_serving_options(
            pstep, state, dev_batches[-1], rng,
            vmem_limit_kib=args.vmem_limit_kib)
    state, m = pstep(state, dev_batches[-1], rng)   # compile + settle
    _ = float(m["loss"])                             # real value readback
    compile_s = time.time() - t0
    _phase(f"compiled in {compile_s:.1f}s; timing {iters} steps")

    # Per-step VALUE readbacks: the relay acks block_until_ready early and
    # stalls pathologically on deep dispatch queues (measured 52-106 s/step
    # artifacts with 10 queued steps), but it cannot fake a concrete value.
    # The readback round-trip adds ~ms against ~1s steps; drop the first
    # two steps (they absorb the still-in-flight batch uploads).
    times = []
    for i in range(iters):
        t0 = time.time()
        state, metrics = pstep(state, dev_batches[i], rng)
        _ = float(metrics["loss"])
        times.append(time.time() - t0)
    dt = float(np.mean(times[2:]))
    clips_per_sec = cfg.batch_size / dt

    # ---- MFU from XLA cost analysis (exact: unrolled lowering) ----
    # cost_analysis counts a scanned body once regardless of trip count, so
    # the FLOP denominator comes from a scan_unroll=True lowering of the
    # same train step (identical math — tests/test_models.py) which counts
    # every refinement step's fwd AND bwd exactly. Replaces the former
    # (S-1)x3x-tail correction estimate. Compile is cached; nothing timed
    # here.
    _phase(f"steps done ({dt*1000:.0f} ms/step); MFU lowering")
    # Denominator = USEFUL model FLOPs: remat recompute must not count as
    # utilization (remat_steps=False in the costed lowering), else remat
    # arms report inflated MFU for doing redundant work. The non-remat
    # program does not even COMPILE at B>=32 (OOM), so the cost analysis
    # runs at a reference batch and scales linearly (every op in the step
    # is batch-linear).
    mfu = None
    try:
        bref = min(cfg.batch_size, 16)
        # grad_accum_steps=1: the micro-batch accumulation scan is ALSO a
        # lax.scan cost_analysis counts once — the accum-free program at
        # the same (reference) batch has identical USEFUL FLOPs, and the
        # linear batch scaling below recovers the effective batch's count
        ucfg = cfg.replace(scan_unroll=True, remat_steps=False,
                           batch_size=bref, grad_accum_steps=1)
        upstep = make_parallel_train_step(ucfg, STEPDetector(ucfg), mesh)

        def _ref_leaf(x):
            shape = jnp.shape(x)
            if shape and shape[0] == cfg.batch_size:
                shape = (bref, *shape[1:])
            return jax.ShapeDtypeStruct(shape, x.dtype)

        abstract_batch = jax.tree.map(_ref_leaf, dev_batches[0])
        cost = (upstep.lower(state, abstract_batch, rng).compile()
                .cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) * (cfg.batch_size / bref)
        if flops > 0:
            mfu = flops / dt / PEAK_BF16_FLOPS
    except Exception:
        pass

    # ---- fit() loop throughput (loader + double-buffered upload) ----
    from step_tpu.data.synthetic import SyntheticConfig, make_clip
    from step_tpu.data.loader import DataLoader
    from step_tpu.train.fit import fit

    syn = SyntheticConfig(image_size=cfg.image_size,
                          num_frames=cfg.total_frames,
                          num_classes=cfg.num_classes,
                          max_boxes=cfg.max_gt_tubes)
    cache = [make_clip(i, syn) for i in range(4 * cfg.batch_size)]

    class _Cached:
        def __len__(self):
            return len(cache)

        def __getitem__(self, i):
            return cache[i]

    fit_cfg = cfg.replace(total_steps=FIT_STEPS, warmup_steps=2)

    def run_fit(prefetch_upload):
        loader = DataLoader(_Cached(), fit_cfg, num_workers=2, prefetch=3)
        with tempfile.TemporaryDirectory() as log_dir:
            fit(fit_cfg, loader, num_epochs=100, log_dir=log_dir,
                handle_signals=False, prefetch_upload=prefetch_upload)
            cps = None
            with open(os.path.join(log_dir, "metrics.jsonl")) as f:
                for line in f:
                    rec = json.loads(line)
                    if "clips_per_sec" in rec and rec["step"] > 20:
                        cps = rec["clips_per_sec"]  # last (clean) window avg
            return cps

    if args.skip_fit:
        fit_cps = fit_cps_pf = None
    else:
        _phase("fit() arm: prefetch_upload=False")
        fit_cps = run_fit(False)   # production default (prefetch_upload off)
        _phase("fit() arm: prefetch_upload=True")
        fit_cps_pf = run_fit(True)
    _phase("done")

    print(json.dumps({
        "metric": "train_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "step_ms": round(dt * 1000, 1),
        "timed_steps": iters,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "fit_clips_per_sec": round(fit_cps, 2) if fit_cps else None,
        "fit_step_ms": round(1000 * cfg.batch_size / fit_cps, 1) if fit_cps else None,
        "fit_clips_per_sec_prefetch": (round(fit_cps_pf, 2)
                                       if fit_cps_pf else None),
        "batch": cfg.batch_size,
        "overrides": ",".join(args.overrides) or None,
        "scan_unroll": cfg.scan_unroll,
        "remat_steps": cfg.remat_steps,
        "freeze_submodules": list(cfg.freeze_submodules),
        "vmem_limit_kib": args.vmem_limit_kib,
        # False = the backend rejected the option; step_ms above is the
        # DEFAULT program's, not the requested arm's
        "vmem_applied": vmem_applied,
        "compile_s": round(compile_s, 1),
        "config": "ucf_3step train (3 steps, 18 frames, 224px, I3D, AdamW)",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
