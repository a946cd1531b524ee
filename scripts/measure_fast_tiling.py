#!/usr/bin/env python
"""Measure serve.py --fast-tiling's frame-mAP cost on the synthetic oracle
(VERDICT r4 weak #1 / next #1, the VALIDATION line the serve.py help
references).

serve.py's default protocol now matches eval (one-chunk-stride sliding
windows, central-chunk ownership — parity-tested vs test.py in
tests/test_serve_protocol.py). --fast-tiling keeps the old non-overlapping
tiling: 3x fewer clips, but 2/3 of frames are scored from extension-chunk
positions. This script puts a NUMBER on that trade:

  1. write a small on-disk oracle dataset (UCF layout, force_label pins
     pixel color to class so training converges),
  2. train the tiny detector on its train split (CPU),
  3. export the serving program; run serve.py BOTH ways over the test
     videos; score both detection dumps with the official matcher
     against the dataset GT,
  4. print one JSON line: {"ownership_mAP": ..., "fast_tiling_mAP": ...}.

CPU-only (axon env stripped in the children). ~10-20 min.
"""

import _bootstrap  # noqa: F401

import argparse
import json
import os
import pickle
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ucf_3step geometry scaled to CPU: fpc=2 x 3 chunks = 6-frame windows over
# 64px frames; 8 classes keep training fast while exercising multi-class AP
SET = ("image_size=64,pooled_size=4,max_proposals=12,max_gt_tubes=2,"
       "max_detections=4,compute_dtype=float32,num_classes=8,"
       "frames_per_chunk=2,num_chunks=3,num_steps=2,"
       "iou_thresholds=(0.4,0.5),step_loss_weights=(1.0,1.0),"
       "batch_size=8,warmup_steps=20,score_thresh=0.01")


def run(cmd, **kw):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(var, None)
    env["STEP_TPU_DISABLE_NATIVE"] = "1"   # one decoder for all surfaces
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, cwd=REPO, **kw)
    print(f"  ({time.time() - t0:.0f}s, rc={proc.returncode})", flush=True)
    if proc.returncode != 0:
        raise SystemExit(f"step failed: {' '.join(cmd)}")
    return proc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/fast_tiling_oracle")
    ap.add_argument("--videos", type=int, default=48,
                    help="total videos (5/6 train, 1/6 test)")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--workdir", default="/tmp/fast_tiling_run")
    args = ap.parse_args()

    import numpy as np

    pkl = os.path.join(args.root, "UCF101v2-GT.pkl")
    if not os.path.exists(pkl):
        import jax

        jax.config.update("jax_platforms", "cpu")
        from step_tpu.data.synthetic import write_ucf_layout

        videos = write_ucf_layout(args.root, args.videos, num_classes=8,
                                  image_size=64, frames_lo=30, frames_hi=42,
                                  seed=11)
        # move 1/6 of the videos (round-robin over classes) to a train
        # split so the model trains on held-IN data and evals held-out
        with open(pkl, "rb") as f:
            gt = pickle.load(f)
        test = [v for i, v in enumerate(sorted(videos)) if i % 6 == 0]
        train = [v for v in sorted(videos) if v not in test]
        gt["train_videos"] = [train]
        gt["test_videos"] = [test]
        with open(pkl, "wb") as f:
            pickle.dump(gt, f)
        print(f"wrote {len(train)} train / {len(test)} test videos")

    os.makedirs(args.workdir, exist_ok=True)
    ckpt = os.path.join(args.workdir, "ckpt")
    if not os.path.isdir(ckpt) or not os.listdir(ckpt):
        run([sys.executable, "train.py", "--platform", "cpu", "--preset",
             "ucf_3step", "--tiny", "--dataset", "ucf101_24",
             "--data-root", args.root, "--ckpt-dir", ckpt,
             "--steps", str(args.steps), "--epochs", "999",
             "--set", SET])

    prog = os.path.join(args.workdir, "detect.stablehlo")
    run([sys.executable, "export.py", "--platform", "cpu", "--preset",
         "ucf_3step", "--tiny", "--batch-size", "8", "--out", prog,
         "--set", SET])

    with open(pkl, "rb") as f:
        gt = pickle.load(f)
    dumps = {}
    for mode, extra in (("ownership", []), ("fast_tiling",
                                            ["--fast-tiling"])):
        dets = []
        for video in gt["test_videos"][0]:
            out = os.path.join(args.workdir, f"{mode}_{video.replace('/', '_')}.pkl")
            run([sys.executable, "serve.py", "--platform", "cpu",
                 "--program", prog, "--preset", "ucf_3step", "--tiny",
                 "--ckpt-dir", ckpt,
                 "--frames-dir", os.path.join(args.root, "rgb-images", video),
                 "--out", out, "--batch-size", "8", "--set", SET] + extra)
            with open(out, "rb") as f:
                # serve.py keys detections by the LEAF dir name; re-key to
                # the dataset's label/video form for GT matching
                for (v, fr), c, s, box in pickle.load(f)["detections"]:
                    dets.append(((video, fr), c, s, box))
        dumps[mode] = dets

    # official matcher vs the on-disk GT (boxes are in model coords == disk
    # coords: the layout is written at the model resolution)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from step_tpu.eval.detection_metrics import frame_map

    frame_gt = []
    for video in gt["test_videos"][0]:
        for cls, tubes in gt["gttubes"][video].items():
            for tube in tubes:
                for row in tube:
                    frame_gt.append(((video, int(row[0])), cls,
                                     np.asarray(row[1:5], np.float32)))
    result = {}
    for mode, dets in dumps.items():
        result[f"{mode}_mAP"] = round(
            frame_map(dets, frame_gt, 8, 0.5)["mAP"], 4)
        result[f"{mode}_n_dets"] = len(dets)
    result["fast_tiling_cost"] = round(
        result["ownership_mAP"] - result["fast_tiling_mAP"], 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
