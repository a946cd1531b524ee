#!/usr/bin/env python
"""XLA:TPU compiler-option sweep beyond scoped VMEM (VERDICT r4 next #4).

Round 3-4 explored exactly ONE option family (xla_tpu_scoped_vmem_limit_kib)
and it produced the single biggest serving win (+13.3%) — evidence the flag
space is live. This script widens the axis on the shipped B=128 optimized
serving program:

  phase 1 (probe): lower+compile the program once per CANDIDATE option to
     learn which names this backend accepts (rejections are recorded, not
     fatal — compile_with_serving_options' fail-open contract);
  phase 2 (A/B): accepted options are measured with the chained
     full-program methodology (data-dependent proposal chain, ONE
     readback — per-call timings are garbage through the relay,
     CLAUDE.md), interleaved against the SHIPPED baseline (scoped VMEM
     90112) so drift shows up as baseline spread.

VERDICT r4 asks for the A/B on all THREE shipped programs; --program
selects which one this run measures:
  serving — B=128 optimized throughput program (default; baseline =
            shipped scoped VMEM 90112);
  latency — B=1 optimized program (same shipped baseline; the decision
            metric is chained ms, lower is better);
  train   — B=32 train step (baseline = compiler DEFAULTS: the r4 queue
            measured scoped VMEM as noise-or-worse on this program, so
            nothing is composed in). Train compiles cost 180-540 s each
            through the relay's remote-compile service, so train runs use
            --candidates to name a rationale-chosen shortlist.

Every arm appends one JSON line to --out. Run serially on the chip — no
other TPU process may run.

Usage:
    python scripts/bench_flags_r5.py --out .sweeps/flags_r5.jsonl
    python scripts/bench_flags_r5.py --program latency --out ...
    python scripts/bench_flags_r5.py --only xla_tpu_rwb_fusion=false
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import PRESETS
from step_tpu.inference import detect_clip
from step_tpu.models.detector import STEPDetector
from step_tpu.models.optimize import optimize_for_inference
from step_tpu.utils.compile_cache import enable_compile_cache
from step_tpu.utils.compile_opts import SERVING_VMEM_LIMIT_KIB
from step_tpu.utils.init import init_detector_cpu

enable_compile_cache()

BATCH = 128
ITERS = 20

# Shipped baseline: the measured scoped-VMEM value. Every candidate is
# measured BOTH alone and composed with it (the families may interact
# through the fusion emitter's memory budget).
SHIPPED = {"xla_tpu_scoped_vmem_limit_kib": str(SERVING_VMEM_LIMIT_KIB)}

# Candidate XLA:TPU options (names from public XLA flag dumps; acceptance
# is decided by the probe, not assumed). Values chosen to FLIP a default.
CANDIDATES = [
    {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    {"xla_tpu_rwb_fusion": "false"},
    {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"},
    {"xla_tpu_scavenge_vmem_for_fusions": "false"},
    {"xla_tpu_enable_dot_strength_reduction": "false"},
    {"xla_tpu_enable_multi_level_nested_loop_fusion": "false"},
    {"xla_tpu_vector_load_fusion_window": "2048"},
    {"xla_tpu_vector_store_fusion_window": "512"},
    {"xla_tpu_reduce_loop_fusion_dup_with_unfusable_user": "true"},
    {"xla_tpu_licm_size_inflation_ratio": "2"},
    {"xla_tpu_allocate_scoped_vmem_at_same_offset": "false"},
    {"xla_tpu_copy_fusion_pad_unpad_ratio": "10"},
    {"xla_tpu_dot_dot_fusion": "false"},
    {"xla_tpu_dot_dot_fusion_duplicated": "true"},
    {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.5"},
    {"xla_tpu_memory_bound_loop_optimizer_options": "enabled:true"},
    {"xla_tpu_nd_short_transfer_max_chunks": "4096"},
    {"xla_tpu_use_repeated_instance_for_preferred_prefetch_time": "true"},
    {"xla_tpu_perform_spmd_cse_prevention": "true"},
    {"xla_jf_rematerialization_percent_shared_memory_limit": "99"},
]


def build_program(batch):
    cfg = PRESETS["ucf_3step"]
    variables = init_detector_cpu(cfg, jax.random.PRNGKey(0),
                                  STEPDetector(cfg))
    cfg, variables = optimize_for_inference(cfg, variables)
    model = STEPDetector(cfg)
    dev = jax.devices()[0]
    rng = np.random.RandomState(0)
    rgb = jax.device_put(
        jnp.asarray(rng.rand(batch, cfg.total_frames, cfg.image_size,
                             cfg.image_size, 3), jnp.float32), dev)
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, batch)
    proposals = jax.device_put(proposals, dev)
    prop_mask = jax.device_put(prop_mask, dev)
    variables = jax.device_put(variables, dev)

    @jax.jit
    def detect(variables, rgb, proposals, prop_mask):
        return detect_clip(variables, rgb, proposals, prop_mask, cfg, model)

    return detect, (variables, rgb, proposals, prop_mask), cfg


def chained_time(fn, variables, rgb, proposals, prop_mask, iters):
    out = fn(variables, rgb, proposals, prop_mask)
    _ = float(jnp.sum(out["tube_scores"]))          # warm + settle
    t0 = time.time()
    props = proposals
    for _ in range(iters):
        out = fn(variables, rgb, props, prop_mask)
        props = out["tubes"]                        # data dependence
    _ = float(jnp.sum(out["tube_scores"]))          # ONE readback
    return (time.time() - t0) / iters


def build_train_measure(iters, smoke=False):
    """Return (measure_builder) for the B=32 train step: each arm compiles
    the SAME lowered step with its compiler_options and chains `iters`
    steps over distinct pre-uploaded batches with per-step value readbacks
    (bench_train.py's methodology — the relay memoizes identical dispatches
    and stalls on deep readback-free queues; a loss VALUE cannot be faked).
    """
    from bench_train import make_batches
    from step_tpu.parallel.distributed import make_global_batch
    from step_tpu.parallel.mesh import create_mesh, replicated_sharding
    from step_tpu.train.trainer import (create_train_state,
                                        make_parallel_train_step)

    cfg = PRESETS["ucf_3step"].replace(batch_size=32)
    if smoke:  # CPU-runnable structural check of this exact code path
        cfg = cfg.replace(batch_size=2, image_size=32, backbone_depth="tiny",
                          feature_stride=8, pooled_size=4,
                          compute_dtype="float32")
    model = STEPDetector(cfg)
    mesh = create_mesh((1,), cfg.mesh_axes)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state0 = create_train_state(cfg, jax.random.PRNGKey(0), model)
    state0 = jax.device_put(state0, replicated_sharding(mesh))
    pstep = make_parallel_train_step(cfg, model, mesh)
    rng = jax.random.PRNGKey(1)
    host_batches = make_batches(cfg, iters + 1)
    dev_batches = [make_global_batch(
        {k: v for k, v in b.items() if k != "meta"}, mesh)
        for b in host_batches]
    # the train step DONATES the state (make_parallel_train_step's
    # donate_argnums), so (a) lower from abstract avals — the concrete
    # state0 buffers are deleted after the first arm's first call — and
    # (b) thread the live state across arms instead of reusing state0
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        (state0, dev_batches[-1], rng))
    live = {"state": state0}

    def compile_arm(opts):
        return pstep.lower(*abstract).compile(compiler_options=opts)

    def run_arm(fn):
        s, m = fn(live["state"], dev_batches[-1], rng)   # settle
        _ = float(m["loss"])
        times = []
        for i in range(iters):
            t0 = time.time()
            s, m = fn(s, dev_batches[i], rng)
            _ = float(m["loss"])                    # per-step value readback
            times.append(time.time() - t0)
        live["state"] = s
        return float(np.mean(times[2:]))            # steps 1-2 absorb uploads

    return compile_arm, run_arm, cfg.batch_size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".sweeps/flags_r5.jsonl")
    ap.add_argument("--program", choices=["serving", "latency", "train"],
                    default="serving",
                    help="which shipped program to A/B (module docstring)")
    ap.add_argument("--candidates", default=None,
                    help="comma-separated flag NAMES restricting the "
                         "candidate list (train shortlist)")
    ap.add_argument("--iters", type=int, default=None,
                    help="timed iterations per arm (default: 20 serving, "
                         "30 latency, 8 train)")
    ap.add_argument("--only", default=None,
                    help="single name=value candidate instead of the list")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU-runnable config (train program only) — "
                         "structural validation of the arm path; timings "
                         "meaningless, TPU flags will record as rejected")
    ap.add_argument("--alone", action="store_true",
                    help="ALSO measure each candidate without the shipped "
                         "VMEM flag (diagnoses interactions; default off — "
                         "the shippable decision is composed-vs-shipped)")
    ap.add_argument("--resume", action="store_true",
                    help="skip candidates whose composed arm already has a "
                         "record (measured or rejected) in --out; a fresh "
                         "baseline arm is still measured so relay drift "
                         "across the resume boundary stays visible")
    args = ap.parse_args()

    done = set()
    if args.resume:
        try:
            with open(args.out) as f:
                for line in f:
                    rec = json.loads(line)
                    done.add(rec.get("arm", ""))
        except FileNotFoundError:
            pass

    # shipped-baseline options per program: serving and latency ship with
    # the scoped-VMEM value; the train step ships on compiler defaults
    # (scoped VMEM measured noise-or-worse there, VALIDATION r4 queue-v3)
    shipped = {} if args.program == "train" else dict(SHIPPED)
    if args.program == "train":
        iters = args.iters or 8
        train_compile, train_run, train_batch = build_train_measure(
            iters, smoke=args.smoke)

        def compile_fn(opts):
            return train_compile(opts)

        def run_fn(fn):
            return train_run(fn)

        per_call = train_batch
    else:
        batch = 1 if args.program == "latency" else BATCH
        iters = args.iters or (30 if args.program == "latency" else ITERS)
        detect, fargs, _cfg = build_program(batch)

        def compile_fn(opts):
            return detect.lower(*fargs).compile(compiler_options=opts)

        def run_fn(fn):
            return chained_time(fn, *fargs, iters)

        per_call = batch
    res = open(args.out, "a")

    def book(rec):
        res.write(json.dumps(rec) + "\n")
        res.flush()
        print(json.dumps(rec), flush=True)

    def compile_arm(tag, opts):
        t0 = time.time()
        try:
            fn = compile_fn(opts)
        except Exception as e:  # noqa: BLE001 — rejection is a data point
            book({"arm": tag, "opts": opts, "rejected": True,
                  "program": args.program,
                  "error": f"{type(e).__name__}: {str(e)[:200]}"})
            return None
        return fn, time.time() - t0

    def measure(tag, opts):
        built = compile_arm(tag, opts)
        if built is None:
            return None
        fn, compile_s = built
        dt = run_fn(fn)
        clips = per_call / dt
        book({"arm": tag, "opts": opts, "program": args.program,
              "chained_ms": round(dt * 1000, 2),
              "clips_per_sec": round(clips, 1),
              "compile_s": round(compile_s, 1)})
        return clips

    candidates = ([{args.only.split("=", 1)[0]: args.only.split("=", 1)[1]}]
                  if args.only else CANDIDATES)
    if args.candidates:
        names = set(args.candidates.split(","))
        candidates = [c for c in candidates if next(iter(c)) in names]
        unknown = names - {next(iter(c)) for c in CANDIDATES}
        if unknown:
            ap.error(f"--candidates names not in CANDIDATES: {unknown}")

    # interleaved baselines: shipped program first, re-measured midway and
    # at the end so relay drift is visible in the record
    base = measure("baseline_shipped_vmem", dict(shipped))
    if base is None:
        print("shipped baseline failed to compile — aborting", flush=True)
        return
    results = []
    for i, cand in enumerate(candidates):
        name = next(iter(cand))
        tag = f"{name}={cand[name]}"
        if f"composed:{tag}" in done:
            print(f"resume: skipping composed:{tag} (already recorded)",
                  flush=True)
            continue
        composed = measure(f"composed:{tag}", {**shipped, **cand})
        alone = (measure(f"alone:{tag}", dict(cand))
                 if args.alone and composed is not None else None)
        results.append((tag, alone, composed))
        if i == len(candidates) // 2:
            measure("baseline_shipped_vmem_mid", dict(shipped))
    measure("baseline_shipped_vmem_end", dict(shipped))

    print("\n=== summary (clips/s; shipped baseline "
          f"{base:.1f}) ===", flush=True)
    for tag, alone, composed in results:
        print(f"{tag}: alone={alone and round(alone, 1)} "
              f"composed={composed and round(composed, 1)}", flush=True)


if __name__ == "__main__":
    main()
