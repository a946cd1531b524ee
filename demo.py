#!/usr/bin/env python
"""Demo CLI (reference parity: ``demo.py`` (recon)): custom video in,
annotated video out.

Pipeline: decode video → tile into clips → streaming detection with
on-device NMS + cross-clip tube linking → draw the linked tubes → write
the annotated video.
"""

import argparse

from step_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def parse_args():
    p = argparse.ArgumentParser(description="Run STEP-TPU on a custom video")
    p.add_argument("--video", required=True)
    p.add_argument("--output", default="out.mp4")
    p.add_argument("--preset", default="streaming")
    p.add_argument("--ckpt-dir", default=None, help="trained checkpoint (random init if absent)")
    p.add_argument("--score-thresh", type=float, default=0.3)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--class-names", default=None, help="comma-separated names")
    p.add_argument("--tiny", action="store_true")
    from step_tpu.utils.cli import add_common_args

    add_common_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    from step_tpu.utils.cli import apply_overrides, force_platform

    force_platform(args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from step_tpu.config import PRESETS
    from step_tpu.inference import make_detect_video_fn
    from step_tpu.models.detector import STEPDetector
    from step_tpu.utils.init import init_detector_cpu
    from step_tpu.utils.vis import draw_detections, extract_frames, write_video

    cfg = PRESETS[args.preset].replace(score_thresh=args.score_thresh)
    if args.tiny:
        cfg = cfg.replace(backbone_depth="tiny", feature_stride=8)
    cfg = apply_overrides(cfg, args.overrides)
    model = STEPDetector(cfg)

    if args.ckpt_dir:
        from step_tpu.train.trainer import create_train_state
        from step_tpu.utils.checkpoint import restore_checkpoint

        state = create_train_state(cfg, jax.random.PRNGKey(0), model)
        state, _ = restore_checkpoint(args.ckpt_dir, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        print("WARNING: no checkpoint given — using random weights (smoke test)")
        variables = init_detector_cpu(cfg, jax.random.PRNGKey(0), model)

    frames = extract_frames(args.video, args.max_frames)  # [T_all, H, W, 3]
    import cv2

    T_all, H, W, _ = frames.shape
    S = cfg.image_size
    resized = np.stack([cv2.resize(f, (S, S)) for f in frames])

    # tile into L clips of total_frames (pad tail by repeating last frame)
    T = cfg.total_frames
    L = max(1, -(-T_all // T))
    pad = L * T - T_all
    if pad:
        resized = np.concatenate([resized, np.repeat(resized[-1:], pad, 0)])
    clips = resized.reshape(L, T, S, S, 3).astype(np.float32)  # [0,1]; model normalizes on device

    # ONE compiled program (detector + NMS + Viterbi linking) — the eager
    # call would dispatch hundreds of ops per clip over the relay
    out = make_detect_video_fn(cfg, model)(variables, jnp.asarray(clips))
    tubes = np.asarray(out["tubes"])              # [L, P, T, 4]
    paths = np.asarray(out["link_paths"])         # [C, K, L]
    trim = np.asarray(out["link_trim"])           # [C, K, L]
    tube_scores = np.asarray(out["link_tube_scores"])  # [C, K]

    sx, sy = W / S, H / S
    annotated = []
    names = args.class_names.split(",") if args.class_names else None
    for fi in range(T_all):
        l, t = fi // T, fi % T
        boxes, labels, scores = [], [], []
        for c in range(paths.shape[0]):
            for k in range(paths.shape[1]):
                s = tube_scores[c, k]
                if s >= cfg.score_thresh and trim[c, k, l] > 0:
                    p = paths[c, k, l]
                    b = tubes[l, p, t] * np.asarray([sx, sy, sx, sy])
                    boxes.append(b)
                    labels.append(c)
                    scores.append(float(s))
        annotated.append(
            draw_detections(frames[fi], np.asarray(boxes).reshape(-1, 4),
                            labels, scores, class_names=names)
        )
    write_video(args.output, annotated)
    print(f"wrote {args.output} ({T_all} frames, {L} clips)")


if __name__ == "__main__":
    main()
