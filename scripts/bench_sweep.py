"""Batch-size re-sweep + compiler-option A/B on the OPTIMIZED serving program.

The round-2 batch sweep (VALIDATION.md) picked B=128 on the pre-optimization
program (393 clips/s). The serving program has since changed shape — BN fold,
fused Inception 1x1, one-hot NMS surfaces, unrolled scan — so the sweet spot
may have moved. This re-sweeps B and then A/Bs XLA compiler options at the
best B, passed per-compile via ``lowered.compile(compiler_options=...)`` so
they survive the relay's remote-compile path (process-level XLA_FLAGS may
not).

Full-program chained methodology (CLAUDE.md): data-dependent proposal chain,
one readback. Run on the TPU with no other chip user.
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import time

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import PRESETS
from step_tpu.inference import detect_clip
from step_tpu.models.detector import STEPDetector
from step_tpu.models.optimize import optimize_for_inference
from step_tpu.utils.compile_cache import enable_compile_cache
from step_tpu.utils.init import init_detector_cpu
from step_tpu.utils.profiling import chained_timer

enable_compile_cache()

ITERS = 30  # match bench.py's methodology exactly


def chained(detect, variables, rgb, proposals, prop_mask, iters=ITERS):
    # Canonical dependency-chained timing (utils/profiling.chained_timer):
    # proposals feed back through each detection so the relay cannot
    # pipeline/memoize, one scalar readback at each end.
    def step(props):
        return detect(variables, rgb, props, prop_mask)["tubes"]

    return chained_timer(
        step, proposals, iters=iters,
        readback=lambda props: float(jnp.sum(props)))


def run(tag, cfg, variables, batch, device, compiler_options=None):
    model = STEPDetector(cfg)
    rng = np.random.RandomState(0)
    rgb = jax.device_put(
        jnp.asarray(
            rng.rand(batch, cfg.total_frames, cfg.image_size, cfg.image_size, 3),
            jnp.float32,
        ),
        device,
    )
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, batch)
    v = jax.device_put(variables, device)
    proposals, prop_mask = jax.device_put((proposals, prop_mask), device)

    def _detect(variables, rgb, proposals, prop_mask):
        return detect_clip(variables, rgb, proposals, prop_mask, cfg, model)

    t0 = time.time()
    if compiler_options:
        detect = (
            jax.jit(_detect)
            .lower(v, rgb, proposals, prop_mask)
            .compile(compiler_options=compiler_options)
        )
    else:
        detect = jax.jit(_detect)
    out = detect(v, rgb, proposals, prop_mask)
    _ = float(jnp.sum(out["tube_scores"]))
    compile_s = time.time() - t0
    dt = chained(detect, v, rgb, proposals, prop_mask)
    print(
        f"{tag:28s} B={batch:3d} {batch / dt:8.1f} clips/s {dt * 1e3:8.2f}"
        f" ms/batch (compile {compile_s:.0f}s)",
        flush=True,
    )
    return dt


def main():
    cfg0 = PRESETS["ucf_3step"]
    device = jax.devices()[0]
    variables_std = init_detector_cpu(cfg0, jax.random.PRNGKey(0),
                                      STEPDetector(cfg0))
    cfg, variables = optimize_for_inference(cfg0, variables_std)

    import sys

    if "--fuse3-only" in sys.argv or "--all" in sys.argv:
        # Block-diagonal merged 3x3x3 branch convs (exact, parity-tested):
        # trades ~1.5x FLOPs-on-zeros for one MXU-shaped GEMM per block in
        # place of a wide conv plus a reduction-starved (27*32..48) one.
        run("fuse3=none (current)", cfg, variables, 128, device)
        for scope in ("tail", "all"):
            cfg3, vars3 = optimize_for_inference(cfg0, variables_std,
                                                 fuse_inception3=scope)
            run(f"fuse3={scope}", cfg3, vars3, 128, device)
        if "--fuse3-only" in sys.argv:
            return

    if "--vmem-pair" in sys.argv:
        # Interleaved confirmation A/B of two scoped-VMEM arms (A,B,A,B in
        # ONE process): the fine sweep's 90112 KiB point (528.4 clips/s,
        # +2.1% over the shipped 65536) sits between two cliff arms
        # (73728 → 138.8, 81920 → 355.1), so a single measurement is not
        # enough to re-ship the default on.
        pair = sys.argv[sys.argv.index("--vmem-pair") + 1]
        a, b = (int(x) for x in pair.split(","))
        for kib in (a, b, a, b):
            run(f"vmem_limit={kib}KiB", cfg, variables, 128, device,
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": str(kib)})
        return

    if "--fine-vmem" in sys.argv:
        # The r4 coarse sweep measured 32768 → +11%, 65536 → +13.3%,
        # 98304 → −3.3x at B=128: the response is non-monotone with a
        # cliff somewhere in (64 MiB, 96 MiB]. Sample the interior (with
        # the shipped 65536 re-run first as the in-context control) to
        # see whether the optimum sits above 64 MiB, and give the flag
        # one arm at B=256 (which tied B=128 under compiler defaults).
        for kib in (65536, 73728, 81920, 90112):
            try:
                run(f"vmem_limit={kib}KiB", cfg, variables, 128, device,
                    compiler_options={
                        "xla_tpu_scoped_vmem_limit_kib": str(kib)})
            except Exception as e:  # noqa: BLE001
                print(f"vmem_limit={kib}KiB rejected: "
                      f"{type(e).__name__}: {e}", flush=True)
        run("vmem_limit=65536KiB B=256", cfg, variables, 256, device,
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"})
        return

    if "--batch-vmem" in sys.argv:
        # Batch x scoped-VMEM INTERACTION sweep (round 5). The r4 batch
        # re-sweep ran at compiler DEFAULTS (B=128 won, 456.8) and the
        # scoped-VMEM sweep ran at B=128 only (90112 KiB won, 520-529);
        # no other (batch, vmem) pair was ever measured, and B=256 at
        # defaults TIED B=128 at defaults (459.8 vs 456.8). Because the
        # flag's response is spiky PER PROGRAM (a new batch is a new
        # program), every pair is its own arm. B=128@90112 brackets the
        # sweep as the in-context control (begin/end).
        run("CTRL B=128 @90112 (begin)", cfg, variables, 128, device,
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "90112"})
        for b in (96, 144, 160, 192, 256):
            run(f"B={b} @default", cfg, variables, b, device)
            for kib in (65536, 90112):
                try:
                    run(f"B={b} @{kib}KiB", cfg, variables, b, device,
                        compiler_options={
                            "xla_tpu_scoped_vmem_limit_kib": str(kib)})
                except Exception as e:  # noqa: BLE001
                    print(f"B={b} @{kib}KiB rejected: "
                          f"{type(e).__name__}: {e}", flush=True)
        run("CTRL B=128 @90112 (end)", cfg, variables, 128, device,
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "90112"})
        return

    if "--flags-only" not in sys.argv:
        for b in (96, 128, 160, 192, 256):
            run(f"optimized B={b}", cfg, variables, b, device)

    # Compiler-option A/B at the headline batch. Scoped VMEM bounds how much
    # VMEM the fusion emitter may assume per fusion; larger values can admit
    # deeper fusions on big NDHWC conv+pool blocks (v5e has 128 MiB VMEM).
    for kib in (32768, 65536, 98304):
        try:
            run(
                f"vmem_limit={kib}KiB",
                cfg,
                variables,
                128,
                device,
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": str(kib)},
            )
        except Exception as e:  # noqa: BLE001 — option may be rejected
            print(f"vmem_limit={kib}KiB rejected: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
