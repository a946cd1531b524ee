#!/usr/bin/env python
"""Full-scale-STATISTICS host-side eval rehearsal (VERDICT r4 next #2).

The reference evaluates 3,207 real UCF101-24 videos (~910 in the test
split) of ~100-150 frames over 24 classes; this container has no real
data, so the host-side eval path (JPEG decode, sliding-window collection,
greedy matching, linking, AP) has never seen realistic row counts. This
script:

  1. materializes a synthetic-oracle dataset ON DISK in the UCF layout at
     chosen scale statistics (`data/synthetic.py::write_ucf_layout`),
  2. saves an INIT checkpoint (untrained detector + score_thresh=0 =
     the worst-case detection row count: every frame x class emits its
     NMS-survivor set),
  3. runs the REAL `test.py` CLI end-to-end (sharded eval + on-device
     linking by default) and reports evaluate_ucf's phase timing
     breakdown (results["timings"]).

CPU-only by design (--platform cpu): the phases under test are host-side
Python; detection compute uses the tiny backbone at 32px so the device
share stays small. Run sizes: start with --videos 48 (minutes), then the
full --videos 505.

Usage:
    python scripts/rehearse_fullscale.py --videos 48
    python scripts/rehearse_fullscale.py --videos 505 --root /tmp/synth505
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ucf_3step geometry (fpc=6, 3 chunks) scaled to CPU-feasible pixels; the
# detection row statistics (frames x classes x NMS survivors) are
# pixel-independent. max_detections=8 keeps the worst case at
# ~videos*frames*24*<survivors> rows, the "millions through _greedy_tp"
# regime the rehearsal exists to measure.
OVERRIDES = ("image_size=32,pooled_size=4,compute_dtype=float32,"
             "score_thresh=0.0,max_detections=8,num_steps=1,"
             "iou_thresholds=(0.4,),step_loss_weights=(1.0,)")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--videos", type=int, default=48)
    p.add_argument("--classes", type=int, default=24)
    p.add_argument("--image-size", type=int, default=32)
    p.add_argument("--frames-lo", type=int, default=100)
    p.add_argument("--frames-hi", type=int, default=150)
    p.add_argument("--root", default=None,
                   help="dataset dir (default /tmp/synth_ucf_<videos>)")
    p.add_argument("--no-sharded", action="store_true")
    p.add_argument("--no-device-linking", action="store_true")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   help="extra cfg overrides forwarded to test.py")
    return p.parse_args()


def main():
    args = parse_args()
    root = args.root or f"/tmp/synth_ucf_{args.videos}"
    pkl = os.path.join(root, "UCF101v2-GT.pkl")

    if not os.path.exists(pkl):
        print(f"generating {args.videos} videos under {root} ...",
              flush=True)
        t0 = time.perf_counter()
        from step_tpu.data.synthetic import write_ucf_layout

        videos = write_ucf_layout(
            root, args.videos, num_classes=args.classes,
            image_size=args.image_size, frames_lo=args.frames_lo,
            frames_hi=args.frames_hi, seed=0)
        print(f"wrote {len(videos)} videos in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    else:
        print(f"reusing dataset at {root}", flush=True)

    ckpt = os.path.join(root, "_init_ckpt")
    if not os.path.isdir(ckpt) or not os.listdir(ckpt):
        # untrained init state — the rehearsal measures host cost, and
        # thresh-0 untrained emission is the worst-case row count
        import jax

        jax.config.update("jax_platforms", "cpu")
        from step_tpu.config import PRESETS
        from step_tpu.models.detector import STEPDetector
        from step_tpu.train.trainer import create_train_state
        from step_tpu.utils.checkpoint import save_checkpoint
        from step_tpu.utils.cli import apply_overrides

        cfg = PRESETS["ucf_3step"].replace(backbone_depth="tiny",
                                           feature_stride=8)
        cfg = apply_overrides(cfg, [OVERRIDES] + args.overrides)
        state = create_train_state(cfg, jax.random.PRNGKey(0),
                                   STEPDetector(cfg))
        save_checkpoint(ckpt, state)
        print(f"saved init checkpoint -> {ckpt}", flush=True)

    cmd = [sys.executable, os.path.join(REPO, "test.py"),
           "--platform", "cpu", "--preset", "ucf_3step", "--tiny",
           "--data-root", root, "--ckpt-dir", ckpt,
           "--set", OVERRIDES]
    for o in args.overrides:
        cmd += ["--set", o]
    if not args.no_sharded:
        cmd.append("--sharded")
    if not args.no_device_linking:
        cmd.append("--device-linking")
    print("running:", " ".join(cmd), flush=True)
    t0 = time.perf_counter()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # full axon bypass (CLAUDE.md): CPU compiles run locally instead of
    # through the relay's remote-compile service, so a rehearsal never
    # contends with chip work running in parallel
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(var, None)
    if not args.no_sharded:
        # --sharded fidelity on the 1-chip/CPU host: 8 virtual XLA host
        # devices (no real parallelism on 1 core, but the GSPMD path runs)
        flags = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f)
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    rc = subprocess.run(cmd, env=env, cwd=REPO).returncode
    print(f"test.py end-to-end: {time.perf_counter() - t0:.1f}s "
          f"rc={rc}", flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
