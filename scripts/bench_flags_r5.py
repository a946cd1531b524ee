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

Every arm appends one JSON line to --out. Run serially on the chip — no
other TPU process may run.

Usage:
    python scripts/bench_flags_r5.py --out .sweeps/flags_r5.jsonl
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


def build_program():
    cfg = PRESETS["ucf_3step"]
    variables = init_detector_cpu(cfg, jax.random.PRNGKey(0),
                                  STEPDetector(cfg))
    cfg, variables = optimize_for_inference(cfg, variables)
    model = STEPDetector(cfg)
    dev = jax.devices()[0]
    rng = np.random.RandomState(0)
    rgb = jax.device_put(
        jnp.asarray(rng.rand(BATCH, cfg.total_frames, cfg.image_size,
                             cfg.image_size, 3), jnp.float32), dev)
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, BATCH)
    proposals = jax.device_put(proposals, dev)
    prop_mask = jax.device_put(prop_mask, dev)
    variables = jax.device_put(variables, dev)

    @jax.jit
    def detect(variables, rgb, proposals, prop_mask):
        return detect_clip(variables, rgb, proposals, prop_mask, cfg, model)

    return detect, (variables, rgb, proposals, prop_mask), cfg


def chained_time(fn, variables, rgb, proposals, prop_mask):
    out = fn(variables, rgb, proposals, prop_mask)
    _ = float(jnp.sum(out["tube_scores"]))          # warm + settle
    t0 = time.time()
    props = proposals
    for _ in range(ITERS):
        out = fn(variables, rgb, props, prop_mask)
        props = out["tubes"]                        # data dependence
    _ = float(jnp.sum(out["tube_scores"]))          # ONE readback
    return (time.time() - t0) / ITERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".sweeps/flags_r5.jsonl")
    ap.add_argument("--only", default=None,
                    help="single name=value candidate instead of the list")
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

    detect, fargs, _cfg = build_program()
    res = open(args.out, "a")

    def book(rec):
        res.write(json.dumps(rec) + "\n")
        res.flush()
        print(json.dumps(rec), flush=True)

    def compile_arm(tag, opts):
        t0 = time.time()
        try:
            fn = detect.lower(*fargs).compile(compiler_options=opts)
        except Exception as e:  # noqa: BLE001 — rejection is a data point
            book({"arm": tag, "opts": opts, "rejected": True,
                  "error": f"{type(e).__name__}: {str(e)[:200]}"})
            return None
        return fn, time.time() - t0

    def measure(tag, opts):
        built = compile_arm(tag, opts)
        if built is None:
            return None
        fn, compile_s = built
        dt = chained_time(fn, *fargs)
        clips = BATCH / dt
        book({"arm": tag, "opts": opts, "chained_ms": round(dt * 1000, 2),
              "clips_per_sec": round(clips, 1),
              "compile_s": round(compile_s, 1)})
        return clips

    candidates = ([{args.only.split("=", 1)[0]: args.only.split("=", 1)[1]}]
                  if args.only else CANDIDATES)

    # interleaved baselines: shipped program first, re-measured midway and
    # at the end so relay drift is visible in the record
    base = measure("baseline_shipped_vmem", dict(SHIPPED))
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
        composed = measure(f"composed:{tag}", {**SHIPPED, **cand})
        alone = (measure(f"alone:{tag}", dict(cand))
                 if args.alone and composed is not None else None)
        results.append((tag, alone, composed))
        if i == len(candidates) // 2:
            measure("baseline_shipped_vmem_mid", dict(SHIPPED))
    measure("baseline_shipped_vmem_end", dict(SHIPPED))

    print("\n=== summary (clips/s; shipped baseline "
          f"{base:.1f}) ===", flush=True)
    for tag, alone, composed in results:
        print(f"{tag}: alone={alone and round(alone, 1)} "
              f"composed={composed and round(composed, 1)}", flush=True)


if __name__ == "__main__":
    main()
