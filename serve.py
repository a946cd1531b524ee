#!/usr/bin/env python
"""Serving CLI: run an AOT-exported detect program over frame directories.

Completes the serving story (reference parity: none — the reference serves
by shipping the repo; see utils/export.py): a serving process needs only

  * the exported StableHLO artifact (`export.py --out detect.stablehlo`),
  * an orbax checkpoint directory (weights are NOT baked into the program),
  * frame JPEGs per video.

No model-building Python runs at serving time — the program is
deserialized and called; there is no retrace/recompile risk. The preset
(+ --optimized) must match how the program was exported, because the
checkpoint's variable tree is transformed to the program's expected
structure (standard, or BN-folded + fused via models/optimize.py).

    python serve.py --program detect.stablehlo --preset ucf_3step \
        --ckpt-dir runs/ucf/ckpt --frames-dir /data/frames/video1 \
        --out dets.pkl
"""

import argparse
import os
import pickle
import sys


def parse_args():
    p = argparse.ArgumentParser(description="Serve an exported detect program")
    p.add_argument("--program", required=True, help=".stablehlo artifact")
    p.add_argument("--preset", default="ucf_3step")
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--frames-dir", required=True,
                   help="directory of frame JPEGs (sorted order), or a "
                        "directory of such per-video directories")
    p.add_argument("--out", default="detections.pkl")
    p.add_argument("--batch-size", type=int, default=8,
                   help="must match the exported program's batch dimension")
    p.add_argument("--optimized", action="store_true",
                   help="the program was exported with --optimized; fold "
                        "the checkpoint to match")
    p.add_argument("--vmem-limit-kib", type=int, default=None,
                   help="compile the program with "
                        "xla_tpu_scoped_vmem_limit_kib=<N> (0 = compiler "
                        "defaults, i.e. skip the measured serving option). "
                        "The shipped/measured value is compile_opts."
                        "SERVING_VMEM_LIMIT_KIB (+13.3%% on the optimized "
                        "B=128 program, r4 sweep) but 98304 regressed "
                        "3.3x — opt in per measured batch/program only "
                        "(see utils/compile_opts.py)")
    p.add_argument("--fast-tiling", action="store_true",
                   help="detect on NON-overlapping total_frames windows "
                        "(3x fewer clips) instead of the eval ownership "
                        "protocol (one-chunk-stride sliding windows, "
                        "central-chunk frame ownership — matches test.py "
                        "detections exactly). 2/3 of frames are then "
                        "scored from extension-chunk positions; measured "
                        "cost on the synthetic oracle: -0.0066 frame-mAP "
                        "(0.8521 -> 0.8455) for ~3x fewer detect clips "
                        "(VALIDATION.md round 5)")
    p.add_argument("--tiny", action="store_true")
    from step_tpu.utils.cli import add_common_args

    add_common_args(p)
    return p.parse_args()


def _video_dirs(root):
    entries = sorted(os.listdir(root))
    subdirs = [os.path.join(root, e) for e in entries
               if os.path.isdir(os.path.join(root, e))]
    return subdirs if subdirs else [root]


def _sliding_windows(F, cfg):
    """Eval-ownership tiling math for an F-frame video: (idx [L, T] clamped
    0-based frame indices, owned [F] bool).

    Mirrors `UCFDataset.clip_frame_indices` over centers `start + fpc//2`
    (starts stride by one chunk) and `evaluate.collect_detections`'
    owned_fkeys: a frame is owned iff some clip's CENTRAL chunk actually
    covers it — derived from the clips' real (clamped) indices rather than
    the arithmetic `start : start+fpc`. With the config-enforced odd
    num_chunks the two coincide (the central chunk covers exactly
    start..start+fpc-1); deriving from the indices keeps ownership correct
    by construction should that constraint ever relax (even num_chunks
    shifts central positions to start-1..start+fpc-2, where the geometric
    form wrongly owns the last frame and drops its extension detections)."""
    import numpy as np

    fpc, T = cfg.frames_per_chunk, cfg.total_frames
    starts = np.arange(0, max(F - fpc + 1, 1), fpc)
    offsets = np.arange(T) - T // 2
    idx = np.clip(starts[:, None] + fpc // 2 + offsets[None, :], 0, F - 1)
    tc0 = (T - fpc) // 2
    owned = np.zeros(F, bool)
    owned[idx[:, tc0 : tc0 + fpc].ravel()] = True
    return idx, owned


def _load_clips(frames_dir, cfg, fast_tiling=False):
    """Frame JPEGs → (clips [L, T, S, S, 3] float, idx [L, T] frame indices,
    owned [F] bool or None).

    Default = the EVAL ownership protocol (`evaluate.collect_detections` /
    `UCFDataset.clip_frame_indices`): windows of T = total_frames slide by
    one chunk (frames_per_chunk); indices edge-clamp at video boundaries;
    `owned[f]` marks frames covered by some clip's CENTRAL chunk — the
    serving loop keeps a detection only from its owning clip's central
    positions (plus extension-frame detections for unowned boundary
    frames), so serve.py detections match test.py's on the same frames.

    `fast_tiling=True` = non-overlapping T-frame windows, tail padded by
    repetition (idx = -1 marks padding), every position emitted; 3x fewer
    clips but 2/3 of frames come from extension-chunk positions (owned is
    None — no ownership filter applies)."""
    import cv2
    import numpy as np

    names = sorted(f for f in os.listdir(frames_dir)
                   if f.lower().endswith((".jpg", ".jpeg", ".png")))
    if not names:
        raise FileNotFoundError(f"no frames under {frames_dir}")
    S, T = cfg.image_size, cfg.total_frames
    frames = []
    for n in names:
        img = cv2.imread(os.path.join(frames_dir, n), cv2.IMREAD_COLOR)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        frames.append(cv2.resize(img, (S, S)))
    F = len(frames)
    if fast_tiling:
        L = max(1, -(-F // T))
        pad = L * T - F
        frames = np.stack(frames + [frames[-1]] * pad)
        clips = frames.reshape(L, T, S, S, 3)
        idx = np.arange(L * T).reshape(L, T)
        idx[idx >= F] = -1
        return clips, idx, None
    if cfg.temporal_stride != 1:
        # same guard as collect_detections: the ownership protocol assumes
        # per-frame sampling with one-chunk clip tiling
        raise SystemExit("the serve ownership protocol requires "
                         f"temporal_stride == 1 (got {cfg.temporal_stride});"
                         " use --fast-tiling for strided programs")
    frames = np.stack(frames)
    idx, owned = _sliding_windows(F, cfg)
    return frames[idx], idx, owned


def serve_video(run, variables, cfg, clips, idx, owned, props, pmask, B,
                video, wire):
    """Detect one video's clips → [((video, frame), cls, score, box)].

    `run(variables, rgb, props, pmask)` is the detect program (exported or
    jitted); `clips/idx/owned` come from `_load_clips`; `wire` quantizes a
    float batch to the program's wire format. The ownership filter
    (`owned is not None`) keeps each frame's detections from the clip whose
    central chunk owns it — extension-position detections survive only for
    frames no clip owns (clamped video tails) — matching
    `evaluate.collect_detections`. Dedupe is the CALLER's job (serve.main
    applies `dedupe_frame_detections` across videos, like test.py's dump).
    """
    import jax.numpy as jnp
    import numpy as np

    T, fpc = cfg.total_frames, cfg.frames_per_chunk
    tc0 = (T - fpc) // 2
    detections = []
    L = clips.shape[0]
    for s in range(0, L, B):
        chunk = clips[s : s + B]
        n = chunk.shape[0]
        if n < B:  # pad the final batch; padded rows dropped below
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], B - n, axis=0)])
        out = run(variables, jnp.asarray(wire(chunk)), props, pmask)
        boxes = np.asarray(out["frame_boxes"])[:n]
        scores = np.asarray(out["frame_scores"])[:n]
        mask = np.asarray(out["frame_mask"])[:n]
        for b in range(n):
            keep = np.argwhere(
                (mask[b] > 0) & (scores[b] > cfg.score_thresh))
            for t, c, k in keep:
                fi = int(idx[s + b, t])
                if fi < 0:  # repeated-tail padding, not a real frame
                    continue
                if owned is not None:
                    if not (tc0 <= t < tc0 + fpc) and owned[fi]:
                        continue
                detections.append((
                    (video, fi + 1), int(c),
                    float(scores[b, t, c, k]), boxes[b, t, c, k]))
    return detections


def main():
    args = parse_args()
    from step_tpu.utils.cli import apply_overrides, force_platform

    force_platform(args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from step_tpu.config import PRESETS
    from step_tpu.models.detector import STEPDetector
    from step_tpu.train.trainer import create_train_state
    from step_tpu.utils.checkpoint import restore_checkpoint
    from step_tpu.utils.export import load_detect_fn

    cfg = PRESETS[args.preset]
    if args.tiny:
        cfg = cfg.replace(backbone_depth="tiny", feature_stride=8)
    cfg = apply_overrides(cfg, args.overrides)
    if cfg.input_stream != "rgb":
        # _load_clips decodes RGB JPEGs; a flow-exported program takes
        # 2-channel int8 flow, which cannot be synthesized from frames
        # here. Flow-stream eval goes through test.py --flow-ckpt-dir
        # with precomputed flow (scripts/compute_flow.py).
        raise SystemExit("serve.py serves RGB-stream programs only "
                         f"(input_stream={cfg.input_stream!r})")

    state = create_train_state(cfg, jax.random.PRNGKey(0), STEPDetector(cfg))
    state, _ = restore_checkpoint(args.ckpt_dir, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.optimized:
        from step_tpu.models.optimize import optimize_for_inference_cli

        # explicit --set serving flags win over the optimized defaults —
        # MUST match the flags the program was exported with
        cfg, variables = optimize_for_inference_cli(
            cfg, args.overrides, variables)

    with open(args.program, "rb") as f:
        blob = f.read()
    # deserialize ONCE; the callable and the input-spec check share it
    from step_tpu.utils.export import _as_exported, detect_fn_input_specs

    exported = _as_exported(blob)
    run = load_detect_fn(exported)
    print(f"loaded program {args.program} "
          f"({os.path.getsize(args.program)} bytes)", flush=True)

    # The program's input spec is frozen at export time; a wire-format
    # mismatch (pre-r3 float32-spec artifacts vs today's quantized default)
    # would otherwise surface as an opaque dtype error at the first batch.
    rgb_spec = detect_fn_input_specs(exported)[0]
    want = "uint8" if cfg.uint8_transfer else "float32"
    if str(rgb_spec.dtype) != want:
        flip = not cfg.uint8_transfer
        raise SystemExit(
            f"program expects {rgb_spec.dtype} frames but the config's wire "
            f"format is {want} (uint8_transfer={cfg.uint8_transfer}); this "
            "is a pre-/post-quantized-wire export — rerun with "
            f"--set uint8_transfer={flip} to match the program blob")

    B = args.batch_size
    # loop-invariant device constants (two host->device transfers each —
    # never pay them per batch on the relay; CLAUDE.md)
    props, pmask = STEPDetector.initial_proposals(cfg, B)

    # Wire format must match the exported program's input spec
    # (utils/export.py::_detect_arg_specs follows cfg.uint8_transfer):
    # quantized frames are 4x less host->device bandwidth, dequantized on
    # device, and bit-identical to the eval pipeline's pixels.
    if cfg.uint8_transfer:
        from step_tpu.data.pipeline import rgb_to_uint8_wire as _wire
    else:
        def _wire(x):
            return np.asarray(x, np.float32)
    # 0 = explicit compiler-defaults arm (matches bench.py's documented
    # --latency-vmem-kib semantics); None = flag absent. A truthiness test
    # here silently dropped the 0 arm (ADVICE r4).
    if args.vmem_limit_kib is not None and args.vmem_limit_kib != 0:
        from step_tpu.utils.compile_opts import compile_with_serving_options

        # AOT-compile with the requested option now (zeros chunk, same
        # shapes/dtype as every real batch) instead of at the first real
        # call.
        warm = jnp.asarray(_wire(np.zeros(
            (B, cfg.total_frames, cfg.image_size, cfg.image_size, 3),
            np.float32)))
        run, vmem_applied = compile_with_serving_options(
            run, variables, warm, props, pmask,
            vmem_limit_kib=args.vmem_limit_kib)
        if vmem_applied is False:
            print(f"warning: --vmem-limit-kib {args.vmem_limit_kib} was "
                  "rejected by the backend; serving the default-compiled "
                  "program", file=sys.stderr, flush=True)
    detections = []
    # Decode the NEXT video's JPEGs on a worker thread while the TPU serves
    # the current one (same overlap pattern as evaluate.py's eval loop —
    # cv2 decode releases the GIL, so one worker hides most of the decode).
    from concurrent.futures import ThreadPoolExecutor

    vdirs = _video_dirs(args.frames_dir)
    pool = ThreadPoolExecutor(1)
    try:
        pending = pool.submit(_load_clips, vdirs[0], cfg, args.fast_tiling)
        for i, vdir in enumerate(vdirs):
            video = os.path.basename(vdir.rstrip("/"))
            clips, idx, owned = pending.result()
            if i + 1 < len(vdirs):
                pending = pool.submit(_load_clips, vdirs[i + 1], cfg,
                                      args.fast_tiling)
            detections.extend(serve_video(
                run, variables, cfg, clips, idx, owned, props, pmask, B,
                video, _wire))
            print(f"{video}: {clips.shape[0]} clips served", flush=True)
    finally:
        # don't block a failing serve on the in-flight prefetch decode
        pool.shutdown(wait=False, cancel_futures=True)

    if not args.fast_tiling:
        # edge-clamped sliding windows revisit boundary frames — collapse
        # duplicates exactly like the eval pipeline (test.py's dump)
        from step_tpu.evaluate import dedupe_frame_detections

        detections = dedupe_frame_detections(detections)
    with open(args.out, "wb") as f:
        pickle.dump({"detections": detections}, f)
    print(f"wrote {len(detections)} detections -> {args.out}")


if __name__ == "__main__":
    main()
