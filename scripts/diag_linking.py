"""Diagnose the device-linking vs host-greedy video-mAP gap.

One TPU pass (--dump) detects every clip of the synthetic video-eval set
and stores the RAW surfaces (per-clip tube trajectories + tube scores +
per-frame NMS surfaces + GT) in an .npz; --analyze then A/Bs linking
protocol variants entirely host-side (CPU jax for the tiny link program),
so chip time is paid once per trained model, not per variant.

Usage (config must match the training run that produced the variables):
  python scripts/diag_linking.py --dump \
      --variables .synth_ckpts/baseline700.msgpack \
      --out .synth_ckpts/diag_dump.npz
  env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
      JAX_PLATFORMS=cpu python scripts/diag_linking.py --analyze \
      --out .synth_ckpts/diag_dump.npz
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import argparse
import json

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dump", action="store_true")
    p.add_argument("--analyze", action="store_true")
    p.add_argument("--variables", default=".synth_ckpts/baseline700.msgpack")
    p.add_argument("--out", default=".synth_ckpts/diag_dump.npz")
    p.add_argument("--videos", type=int, default=12)
    p.add_argument("--windows", type=int, default=11)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--image-size", type=int, default=112)
    return p.parse_args()


def build(args):
    from step_tpu.config import StepConfig
    from step_tpu.data.synthetic import SyntheticConfig, SyntheticVideoDataset

    cfg = StepConfig(dataset="synthetic", num_classes=args.classes,
                     image_size=args.image_size, batch_size=8,
                     max_gt_tubes=2)
    W, T, fpc = args.windows, cfg.total_frames, cfg.frames_per_chunk
    vds = SyntheticVideoDataset(
        SyntheticConfig(image_size=cfg.image_size,
                        num_frames=(W - 1) * fpc + T,
                        num_classes=cfg.num_classes, max_boxes=cfg.max_gt_tubes),
        num_videos=args.videos, num_windows=W, window_frames=T,
        stride=fpc, seed=20_000_000)
    return cfg, vds


def dump(args):
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from step_tpu.inference import make_detect_fn
    from step_tpu.models.detector import STEPDetector
    from step_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg, vds = build(args)
    model = STEPDetector(cfg)
    with open(args.variables, "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    variables = jax.device_put(variables)
    detect = make_detect_fn(cfg, model)

    CB = 16
    props, pmask = STEPDetector.initial_proposals(cfg, CB)
    by_video: dict = {}
    for i, (v, _w) in enumerate(vds.samples):
        by_video.setdefault(v, []).append(i)

    store = {}
    for video, idxs in by_video.items():
        L = len(idxs)
        items = [vds[i] for i in idxs]
        tubes, tscores, fboxes, fscores, fmask = [], [], [], [], []
        for s in range(0, L, CB):
            chunk = [it["rgb"] for it in items[s:s + CB]]
            pad = CB - len(chunk)
            batch = np.stack(chunk + [chunk[-1]] * pad)
            if cfg.uint8_transfer:
                from step_tpu.data.pipeline import rgb_to_uint8_wire

                batch = rgb_to_uint8_wire(batch)   # the ONE wire quantizer
            det = detect(variables, jnp.asarray(batch), props, pmask)
            n = len(chunk)
            tubes.append(np.asarray(det["tubes"])[:n])
            tscores.append(np.asarray(det["tube_scores"])[:n])
            fboxes.append(np.asarray(det["frame_boxes"])[:n])
            fscores.append(np.asarray(det["frame_scores"])[:n])
            fmask.append(np.asarray(det["frame_mask"])[:n])
        store[f"{video}/tubes"] = np.concatenate(tubes)
        store[f"{video}/tube_scores"] = np.concatenate(tscores)
        store[f"{video}/frame_boxes"] = np.concatenate(fboxes)
        store[f"{video}/frame_scores"] = np.concatenate(fscores)
        store[f"{video}/frame_mask"] = np.concatenate(fmask)
        store[f"{video}/frame_ids"] = np.stack(
            [it["frame_indices"] for it in items])
        print(f"dumped {video}: L={L}", flush=True)
    np.savez_compressed(args.out, **store)
    print(f"saved -> {args.out}")


# ---------------------------------------------------------------- analyze

def assemble_device_tubes(cfg, dump_store, videos, link_kwargs,
                          score_thresh, min_length=2):
    """Mirror evaluate.collect_video_tubes's assembly from dumped surfaces."""
    import jax.numpy as jnp

    from step_tpu.tubes.linking import link_tubes_multiclass_k

    T, fpc = cfg.total_frames, cfg.frames_per_chunk
    tc0 = (T - fpc) // 2
    out = []
    for video in videos:
        tubes = dump_store[f"{video}/tubes"]
        scores = dump_store[f"{video}/tube_scores"]
        frame_ids = dump_store[f"{video}/frame_ids"]
        L = tubes.shape[0]
        Lb = 1
        while Lb < L:
            Lb *= 2
        if Lb > L:
            tubes = np.concatenate(
                [tubes, np.repeat(tubes[-1:], Lb - L, axis=0)])
            scores = np.concatenate(
                [scores, np.repeat(scores[-1:], Lb - L, axis=0)])
        clip_mask = np.zeros((Lb,), np.float32)
        clip_mask[:L] = 1.0
        link = link_tubes_multiclass_k(
            jnp.asarray(tubes), jnp.asarray(scores), None,
            clip_mask=jnp.asarray(clip_mask), **link_kwargs)
        paths = np.asarray(link["paths"])
        trim = np.asarray(link["trim"])
        tube_scores = np.asarray(link["tube_scores"])
        C, K = tube_scores.shape
        for c in range(C):
            for k in range(K):
                if tube_scores[c, k] < score_thresh:
                    continue
                frames = {}
                for l in range(L):
                    if trim[c, k, l] <= 0:
                        continue
                    p = paths[c, k, l]
                    t_lo = 0 if l == 0 else tc0
                    t_hi = T if l == L - 1 else tc0 + fpc
                    for t in range(t_lo, t_hi):
                        f = int(frame_ids[l][t]) + 1
                        if f not in frames:
                            frames[f] = tubes[l, p, t]
                if len(frames) >= min_length:
                    out.append((video, c, float(tube_scores[c, k]), frames))
    return out


def host_tubes_from_dump(cfg, dump_store, videos):
    """Host-greedy arm from the dumped frame surfaces (sanity reproduction)."""
    from step_tpu.evaluate import (dedupe_frame_detections,
                                   link_frame_detections)

    T, fpc = cfg.total_frames, cfg.frames_per_chunk
    tc0 = (T - fpc) // 2
    det_list, det_central, owned = [], [], set()
    for video in videos:
        fb = dump_store[f"{video}/frame_boxes"]
        fs = dump_store[f"{video}/frame_scores"]
        fm = dump_store[f"{video}/frame_mask"]
        fids = dump_store[f"{video}/frame_ids"]
        for b in range(fb.shape[0]):
            # GEOMETRIC ownership, matching collect_detections: every
            # central-chunk frame is owned whether or not a detection
            # passed threshold there
            for t in range(tc0, tc0 + fpc):
                owned.add((video, int(fids[b][t]) + 1))
            keep = np.argwhere((fm[b] > 0) & (fs[b] > cfg.score_thresh))
            for t, c, k in keep:
                fkey = (video, int(fids[b][t]) + 1)
                central = tc0 <= t < tc0 + fpc
                det_list.append((fkey, int(c), float(fs[b, t, c, k]),
                                 fb[b, t, c, k]))
                det_central.append(central)
    dets = [d for d, cen in zip(det_list, det_central)
            if cen or d[0] not in owned]
    return link_frame_detections(dedupe_frame_detections(dets))


def analyze(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from step_tpu.eval.detection_metrics import video_map
    from step_tpu.evaluate import tube_nms

    cfg, vds = build(args)
    gt = vds.video_gt()
    store = dict(np.load(args.out))
    videos = sorted({k.split("/")[0] for k in store})

    def m(tubes):
        return {thr: round(float(video_map(tubes, gt, cfg.num_classes,
                                           thr)["mAP"]), 4)
                for thr in (0.2, 0.5)}

    # PRODUCTION defaults (incl. suppress_iou — the fix this tool found);
    # ablations strip one ingredient each
    base_kwargs = dict(link_iou_weight=cfg.link_iou_weight,
                       k=cfg.link_tubes_per_class,
                       trim_thresh=cfg.link_trim_thresh,
                       stride=cfg.frames_per_chunk,
                       suppress_iou=(cfg.link_suppress_iou
                                     if cfg.link_suppress_iou > 0 else None))
    host = host_tubes_from_dump(cfg, store, videos)
    variants = {
        "host_greedy(sanity)": host,
        "host_greedy+tube_nms": tube_nms(host, 0.3),
        "device_current": assemble_device_tubes(
            cfg, store, videos, base_kwargs, cfg.score_thresh),
        "device_no_suppress": assemble_device_tubes(
            cfg, store, videos, {**base_kwargs, "suppress_iou": None},
            cfg.score_thresh),
        "device_k1": assemble_device_tubes(
            cfg, store, videos, {**base_kwargs, "k": 1}, cfg.score_thresh),
        "device_no_stride(last_first)": assemble_device_tubes(
            cfg, store, videos, {**base_kwargs, "stride": None},
            cfg.score_thresh),
        "device_no_trim": assemble_device_tubes(
            cfg, store, videos, {**base_kwargs, "trim_thresh": -1.0},
            cfg.score_thresh),
    }
    for si in (0.3, 0.7):
        variants[f"device_suppress{si}"] = assemble_device_tubes(
            cfg, store, videos, {**base_kwargs, "suppress_iou": si},
            cfg.score_thresh)
    variants["device_current+tube_nms"] = tube_nms(
        variants["device_current"], 0.3)
    report = {}
    for name, tubes in variants.items():
        report[name] = {"mAP": m(tubes), "n_tubes": len(tubes)}
        print(json.dumps({name: report[name]}), flush=True)

    # per-GT best ST-IoU for the current device protocol vs host: is the
    # gap localization, temporal extent, or ranking (duplicate FPs)?
    from step_tpu.eval.detection_metrics import spatio_temporal_iou

    for name in ("host_greedy(sanity)", "device_current"):
        tubes = variants[name]
        rows = []
        for gv, gc, gframes in gt:
            best = 0.0
            for (v, c, s, frames) in tubes:
                if v == gv and c == gc:
                    best = max(best, spatio_temporal_iou(frames, gframes))
            rows.append(round(float(best), 3))
        print(json.dumps({f"{name}/best_stiou_per_gt": rows}), flush=True)


def main():
    args = parse_args()
    if args.dump:
        dump(args)
    if args.analyze:
        analyze(args)


if __name__ == "__main__":
    main()
