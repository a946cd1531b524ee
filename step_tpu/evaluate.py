"""Evaluation driver: run detection over a dataset, compute mAPs, dump
detections.

Reference parity: ``test.py`` (recon) — load checkpoint, slide over val
clips, forward + per-class NMS, store detections keyed by (video, frame),
link across clips for video-mAP, invoke the evaluators, dump a detections
file. Here the forward+NMS is one compiled program per batch; collection
and mAP run host-side like the reference's evaluator.
"""

from __future__ import annotations

import pickle
from collections import defaultdict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import StepConfig
from step_tpu.eval.ava_eval import ava_frame_map
from step_tpu.eval.detection_metrics import frame_map, video_map, video_map_range
from step_tpu.inference import (FLOW_DATASET_ERROR, detect_clip,
                                eval_needs_flow)
from step_tpu.models.detector import STEPDetector


def collect_detections(
    variables,
    dataset,
    cfg: StepConfig,
    model: Optional[STEPDetector] = None,
    batch_size: int = 8,
    max_batches: Optional[int] = None,
    image_scale_to_gt: bool = True,
    mesh=None,
    variables_flow=None,
    coverage: Optional[dict] = None,
):
    """Run detection over `dataset` → list of (frame_key, cls, score, box).

    frame_key is (video, frame_number 1-based) for UCF-style datasets, or
    (video, timestamp) for AVA. Boxes are mapped back to the dataset's
    native resolution when the dataset exposes `resolution` (UCF pkl).

    `coverage`: optional dict filled in-place with what was actually
    evaluated — "fkeys" (frame keys of every window frame seen) and
    "videos" (videos with >= 1 clip seen). A `max_batches`-truncated run
    must score against only this subset of the GT, or the printed mAP is
    capped by an arbitrary recall ceiling (see `evaluate_ucf`).

    `mesh`: optional `jax.sharding.Mesh` — shards each detection batch over
    the mesh's data axis (`inference.make_parallel_detect_fn`); ragged final
    batches are padded to the mesh size and the padding dropped host-side.

    `variables_flow`: a SECOND single-stream detector's variables enables
    the reference late-fusion protocol (`detect_clip_late_fusion`):
    `variables` is then the RGB-stream detector, scores fuse pre-NMS.
    Requires a dataset built with flow; composes with `mesh` (the fusion
    program shards over the data axis like the single-stream one).
    """
    if cfg.temporal_stride != 1:
        # The frame-ownership dedupe below assumes clips sample EVERY frame
        # and consecutive clips tile by one chunk; with temporal_stride > 1
        # central chunks overlap in video time and the dedupe would keep
        # misaligned duplicates. Fail loudly instead of corrupting mAPs.
        raise ValueError(
            "collect_detections' sliding-window ownership protocol "
            f"requires temporal_stride == 1; got {cfg.temporal_stride}")
    model = model or STEPDetector(cfg)
    from step_tpu.data.loader import DataLoader

    loader = DataLoader(dataset, cfg, batch_size=batch_size, shuffle=False,
                        train=False, drop_last=False, num_workers=2)

    if variables_flow is not None:
        if mesh is not None:
            from step_tpu.inference import (
                make_parallel_late_fusion_detect_fn, pad_batch_to)

            detect_lf = make_parallel_late_fusion_detect_fn(cfg, mesh)
            n_shards = int(np.prod(mesh.devices.shape))
        else:
            from step_tpu.inference import make_late_fusion_detect_fn

            detect_lf = make_late_fusion_detect_fn(cfg)
    elif mesh is not None:
        from step_tpu.inference import make_parallel_detect_fn, pad_batch_to

        detect = make_parallel_detect_fn(cfg, mesh, model)
        n_shards = int(np.prod(mesh.devices.shape))
    else:
        # the memoized factory, NOT an inline @jax.jit closure: a fresh
        # function object per call would re-trace the S-step scan program
        # on every per-epoch eval (jit's cache keys on function identity)
        from step_tpu.inference import make_detect_fn

        detect = make_detect_fn(cfg, model)

    det_list, det_central, owned_fkeys = [], [], set()
    fpc = cfg.frames_per_chunk
    tc0 = (cfg.total_frames - fpc) // 2        # central-chunk start position
    for bi, batch in enumerate(loader.epoch(0)):
        if max_batches is not None and bi >= max_batches:
            break
        rgb, props, pmask = batch["rgb"], batch["proposals"], batch["prop_mask"]
        # two-stream / late-fusion / flow-stream configs need flow; the
        # dataset must be built with with_flow=True (test.py wires this)
        need_flow = eval_needs_flow(cfg, variables_flow)
        flow = batch.get("flow") if need_flow else None
        if need_flow and flow is None:
            raise ValueError(FLOW_DATASET_ERROR)
        if cfg.input_stream == "flow" and variables_flow is None:
            # a standalone flow-stream detector: flow IS the primary input
            rgb, flow = flow, None
        if mesh is not None:
            rgb, props, pmask = (pad_batch_to(np.asarray(a), n_shards)
                                 for a in (rgb, props, pmask))
            if flow is not None:
                flow = pad_batch_to(np.asarray(flow), n_shards)
        if variables_flow is not None:
            out = detect_lf(variables, variables_flow, jnp.asarray(rgb),
                            jnp.asarray(props), jnp.asarray(pmask),
                            jnp.asarray(flow))
        else:
            args = (variables, jnp.asarray(rgb), jnp.asarray(props),
                    jnp.asarray(pmask))
            if flow is not None:
                args += (jnp.asarray(flow),)
            out = detect(*args)
        boxes = np.asarray(out["frame_boxes"])   # [B, T, C, K, 4]
        scores = np.asarray(out["frame_scores"])  # [B, T, C, K]
        mask = np.asarray(out["frame_mask"])
        for b, meta in enumerate(batch["meta"]):
            video = meta.get("video")
            frame_idx = meta.get("frame_indices")
            if coverage is not None:
                coverage.setdefault("videos", set()).add(video)
                fk = coverage.setdefault("fkeys", set())
                if frame_idx is not None:
                    for f in frame_idx:
                        fk.add((video, int(f) + 1))
                else:
                    fk.add((video, meta.get("timestamp")))
            sx = sy = 1.0
            if image_scale_to_gt and hasattr(dataset, "resolution"):
                H, W = dataset.resolution.get(video, (cfg.image_size, cfg.image_size))
                sx, sy = W / cfg.image_size, H / cfg.image_size
            keep = np.argwhere((mask[b] > 0) & (scores[b] > cfg.score_thresh))
            scale = np.asarray([sx, sy, sx, sy], np.float32)
            if frame_idx is not None:
                # GEOMETRIC ownership: every frame this clip's central
                # chunk covers is owned, whether or not a detection passed
                # the score threshold there. Keying ownership on emitted
                # detections would let BOTH neighbors' extension-frame
                # copies survive exactly when the owner is silent — the
                # duplicate-FP defect this dedupe exists to remove.
                for t in range(tc0, tc0 + fpc):
                    owned_fkeys.add((video, int(frame_idx[t]) + 1))
            if keep.size == 0:
                continue
            # vectorized extraction (the scalar per-survivor loop cost
            # ~4 µs/row — dominant at full-scale detection counts, see
            # scripts/rehearse_fullscale.py); values match the former
            # float(scores[...])/int() scalar path exactly
            ts, cs, ks = keep[:, 0], keep[:, 1], keep[:, 2]
            sc = scores[b, ts, cs, ks].tolist()
            bx = boxes[b, ts, cs, ks] * scale          # [n, 4]
            if frame_idx is not None:
                fis = (np.asarray(frame_idx)[ts] + 1).tolist()  # 1-based
                fkeys = [(video, f) for f in fis]
                central = ((ts >= tc0) & (ts < tc0 + fpc)).tolist()
            else:
                stamp = meta.get("timestamp")
                fkeys = [(video, stamp if stamp is not None else t)
                         for t in ts.tolist()]
                central = [True] * len(fkeys)
            det_list.extend(zip(fkeys, cs.tolist(), sc, bx))
            det_central.extend(central)
    # Sliding clips revisit frames (total_frames = 3 chunks, stride = one
    # chunk): a frame's OWNING clip is the one whose central chunk covers
    # it (the chunks tile the video — same ownership rule as
    # collect_video_tubes). Keep only the owner's detections; without this
    # every actor shows up ~3x with slightly different boxes and the extra
    # copies are guaranteed false positives at matching. Frames no clip
    # owns (clamped video edges) keep their extension-frame detections.
    return [d for d, central in zip(det_list, det_central)
            if central or d[0] not in owned_fkeys]


def collect_video_tubes(
    variables,
    dataset,
    cfg: StepConfig,
    model: Optional[STEPDetector] = None,
    max_videos: Optional[int] = None,
    image_scale_to_gt: bool = True,
    clip_batch: int = 16,
    min_length: int = 2,
    variables_flow=None,
    mesh=None,
    calibration=None,
):
    """Per-video ON-DEVICE K-tube linking → [(video, cls, score, {frame: box})].

    The device analog of `link_frame_detections` (BASELINE north star:
    cross-clip tube linking on device): per video, detect all clips, then
    run the iterative node-disjoint Viterbi + temporal trim
    (`tubes/linking.py::link_tubes_multiclass_k`) inside one jitted program.
    Videos are length-bucketed to powers of two (padding = repeat of the
    last clip, masked by `clip_mask`) so a handful of program shapes covers
    a whole dataset.

    Each clip contributes the frames of its OWN sliding window (the central
    chunk) to the assembled tube — consecutive dataset samples stride by
    exactly one chunk, so owned frames tile the video without overlap; the
    first/last active clips additionally contribute the video-boundary
    extension frames no clip owns (mirroring `collect_detections`). The
    Viterbi transition IoU compares temporally aligned boxes of the
    window overlap (`stride=frames_per_chunk` — tubes/linking.py).

    `variables_flow`: a second single-stream detector's variables enables
    the late-fusion protocol on the TUBE surface (same fusion as
    `collect_detections` — scores fuse pre-linking, boxes from RGB).

    `mesh`: optional `jax.sharding.Mesh` — the per-video clip batches are
    embarrassingly parallel, so they shard over the mesh's data axis
    (`make_parallel_detect_fn`); `clip_batch` rounds up to a multiple of
    the mesh size. The per-video LINK program stays single-device (one
    tiny [C,K,L] Viterbi per video). Composes with `variables_flow`
    (the fusion program shards the same way).

    `calibration`: {'a': [C], 'b': [C]} (or .npz path) — per-class Platt
    applied to the tube-score surface BEFORE linking, so the Viterbi
    score-vs-IoU tradeoff sees the same score scale the host greedy
    linker gets from pre-calibrated detections.
    """
    import functools

    from step_tpu.inference import make_detect_fn
    from step_tpu.tubes.linking import link_tubes_multiclass_k

    if cfg.temporal_stride != 1:
        # Same protocol assumption as collect_detections: per-frame
        # sampling with one-chunk clip tiling (ownership + transition
        # alignment are computed in those units).
        raise ValueError(
            "collect_video_tubes' clip-tiling protocol requires "
            f"temporal_stride == 1; got {cfg.temporal_stride}")
    model = model or STEPDetector(cfg)
    need_flow = eval_needs_flow(cfg, variables_flow)
    if variables_flow is not None:
        if mesh is not None:
            from step_tpu.inference import make_parallel_late_fusion_detect_fn

            n_shards = int(np.prod(mesh.devices.shape))
            clip_batch = -(-clip_batch // n_shards) * n_shards
            detect_lf = make_parallel_late_fusion_detect_fn(cfg, mesh)
        else:
            from step_tpu.inference import make_late_fusion_detect_fn

            detect_lf = make_late_fusion_detect_fn(cfg)
    elif mesh is not None:
        from step_tpu.inference import make_parallel_detect_fn

        n_shards = int(np.prod(mesh.devices.shape))
        clip_batch = -(-clip_batch // n_shards) * n_shards
        detect = make_parallel_detect_fn(cfg, mesh, model)
    else:
        detect = make_detect_fn(cfg, model)
    if calibration is not None:
        # per-class Platt on the TUBE score surface, BEFORE linking — the
        # host path links calibrated detections, so the Viterbi edge
        # weights (score + iou_weight*IoU) must see the same score scale
        if isinstance(calibration, str):
            calibration = dict(np.load(calibration))
        calib_a = np.asarray(calibration["a"], np.float32)   # [C]
        calib_b = np.asarray(calibration["b"], np.float32)

    @functools.partial(jax.jit, static_argnames=())
    def link_fn(tubes, scores, prop_mask, clip_mask):
        # stride = one chunk (consecutive dataset samples slide by exactly
        # one chunk), so the Viterbi transition compares temporally ALIGNED
        # boxes of the window overlap — the last-vs-first convention is for
        # non-overlapping tilings only (see tubes/linking.py).
        return link_tubes_multiclass_k(
            tubes, scores, prop_mask, cfg.link_iou_weight,
            cfg.link_tubes_per_class, cfg.link_trim_thresh, clip_mask,
            # one chunk, in TUBE-SLOT units — equal to video frames only
            # because the temporal_stride==1 guard above holds; relaxing
            # that guard requires revisiting the ownership math too
            stride=cfg.frames_per_chunk,
            suppress_iou=(cfg.link_suppress_iou
                          if cfg.link_suppress_iou > 0 else None),
        )

    by_video: dict = {}
    for i, (v, _center) in enumerate(dataset.samples):
        by_video.setdefault(v, []).append(i)

    # loop-invariant device constants, hoisted: the jnp initial_proposals
    # costs two tiny host->device round-trips (~3.5 s/batch on the relay,
    # CLAUDE.md) — never pay it per batch
    props, pmask = STEPDetector.initial_proposals(cfg, clip_batch)
    _, pmask1 = STEPDetector.initial_proposals(cfg, 1)

    def _wire(batch):
        # Quantized wire format (cfg.uint8_transfer): uint8 rgb / int8 flow,
        # 4x less relay/PCIe bandwidth; device_preprocess dequantizes on
        # device. Shares the loader's quantizers so both eval surfaces see
        # identical pixels — flow included (it previously shipped f32 here,
        # which both paid 4x the bandwidth AND handed the detect program
        # un-quantized flow pixels the loader path never produces).
        # any float dtype means "un-quantized pixels" (a float64 batch must
        # not silently bypass quantization and retrace the program — ADVICE
        # r4); integer dtypes are already on the wire format.
        if cfg.uint8_transfer and np.issubdtype(batch.dtype, np.floating):
            from step_tpu.data.pipeline import (flow_to_int8_wire,
                                                rgb_to_uint8_wire)

            batch = (rgb_to_uint8_wire(batch) if batch.shape[-1] == 3
                     else flow_to_int8_wire(batch))
        return jnp.asarray(batch)

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(2)   # decode next items while the TPU runs
    T, fpc = cfg.total_frames, cfg.frames_per_chunk
    tc0 = (T - fpc) // 2                       # central-chunk start position
    out = []
    try:   # always reclaim the decode workers (per-epoch evals)
        for vi, (video, idxs) in enumerate(by_video.items()):
            if max_videos is not None and vi >= max_videos:
                break
            L = len(idxs)
            clips, flows, frame_ids = [], [], []
            for item in pool.map(dataset.__getitem__, idxs):
                clips.append(item["rgb"])
                frame_ids.append(np.asarray(item["frame_indices"]))
                if need_flow:
                    if item.get("flow") is None:
                        raise ValueError(FLOW_DATASET_ERROR)
                    flows.append(item["flow"])
            if cfg.input_stream == "flow" and variables_flow is None:
                # standalone flow-stream detector: flow IS the primary input
                clips, flows = flows, []
            # detect in fixed-size clip batches (pad by repeating the last clip)
            tubes_np, scores_np = [], []
            for s in range(0, L, clip_batch):
                chunk = clips[s : s + clip_batch]
                pad = clip_batch - len(chunk)
                batch = np.stack(chunk + [chunk[-1]] * pad)
                if flows:
                    fchunk = flows[s : s + clip_batch]
                    fbatch = np.stack(fchunk + [fchunk[-1]] * pad)
                    if variables_flow is not None:
                        det = detect_lf(variables, variables_flow,
                                        _wire(batch), props, pmask,
                                        _wire(fbatch))
                    else:
                        det = detect(variables, _wire(batch), props, pmask,
                                     _wire(fbatch))
                else:
                    det = detect(variables, _wire(batch), props, pmask)
                n = len(chunk)
                tubes_np.append(np.asarray(det["tubes"])[:n])
                scores_np.append(np.asarray(det["tube_scores"])[:n])
            tubes = np.concatenate(tubes_np, axis=0)      # [L, P, T, 4]
            scores = np.concatenate(scores_np, axis=0)    # [L, P, C]
            if calibration is not None:
                from step_tpu.eval.calibration import calibrate_scores_array

                scores = calibrate_scores_array(scores, calib_a, calib_b)

            # bucket the clip axis to the next power of two
            Lb = 1
            while Lb < L:
                Lb *= 2
            if Lb > L:
                tubes = np.concatenate(
                    [tubes, np.repeat(tubes[-1:], Lb - L, axis=0)], axis=0)
                scores = np.concatenate(
                    [scores, np.repeat(scores[-1:], Lb - L, axis=0)], axis=0)
            clip_mask = np.zeros((Lb,), np.float32)
            clip_mask[:L] = 1.0
            prop_mask = jnp.broadcast_to(pmask1[0][None], (Lb, pmask1.shape[1]))
            link = link_fn(jnp.asarray(tubes), jnp.asarray(scores), prop_mask,
                           jnp.asarray(clip_mask))
            paths = np.asarray(link["paths"])             # [C, K, Lb]
            trim = np.asarray(link["trim"])               # [C, K, Lb]
            tube_scores = np.asarray(link["tube_scores"])  # [C, K]

            sx = sy = 1.0
            if image_scale_to_gt and hasattr(dataset, "resolution"):
                H, W = dataset.resolution.get(video, (cfg.image_size, cfg.image_size))
                sx, sy = W / cfg.image_size, H / cfg.image_size
            scale = np.asarray([sx, sy, sx, sy], np.float32)

            C, K = tube_scores.shape
            for c in range(C):
                for k in range(K):
                    if tube_scores[c, k] < cfg.score_thresh:
                        continue
                    frames = {}
                    for l in range(L):
                        if trim[c, k, l] <= 0:
                            continue
                        p = paths[c, k, l]
                        # owned central-chunk frames, plus the video-boundary
                        # extension frames no clip owns (the first/last clips'
                        # lead-in/tail) — same convention as collect_detections;
                        # without them the first and last tc0 frames of every
                        # video are unreachable, capping tube ST-IoU.
                        t_lo = 0 if l == 0 else tc0
                        t_hi = T if l == L - 1 else tc0 + fpc
                        for t in range(t_lo, t_hi):
                            f = int(frame_ids[l][t]) + 1   # 1-based like GT
                            if f not in frames:
                                frames[f] = tubes[l, p, t] * scale
                    if len(frames) >= min_length:
                        out.append((video, c, float(tube_scores[c, k]), frames))
    finally:
        pool.shutdown(wait=False)
    return out


def dedupe_frame_detections(detections):
    """Sliding clips revisit frames; keep each (key, cls, box-ish) once by
    max score. The reference dedupes by writing per-frame dicts the same way.

    Vectorized (full-scale rehearsal: the per-detection dict walk cost
    ~11 s/M rows): group key = (frame key, class, box rounded to 0.1px),
    keep the highest-scored entry per group (earliest on ties), output in
    first-occurrence order — exactly the former dict semantics."""
    n = len(detections)
    if n < 2:
        return list(detections)
    fkey_col, cls_col, score_col, box_col = zip(*detections)
    fid_of: dict = {}
    fid = np.fromiter((fid_of.setdefault(k, len(fid_of)) for k in fkey_col),
                      np.int64, n)
    cls = np.fromiter(cls_col, np.int64, n)
    score = np.fromiter(score_col, np.float64, n)
    # 0.1px-rounded coords as ints: distinct np.round(.,1) values map to
    # distinct ints (multiples of 0.1 are ~exact after *10 + round)
    coords = np.rint(np.round(np.asarray(box_col, np.float32), 1)
                     * 10.0).astype(np.int64)
    # sort by group, then score DESC within group (stable ⇒ earliest index
    # wins ties, like the dict's strict `<` update rule)
    order = np.lexsort((-score, coords[:, 3], coords[:, 2], coords[:, 1],
                        coords[:, 0], cls, fid))
    cols = np.column_stack([fid, cls, coords])[order]
    new_group = np.empty(n, bool)
    new_group[0] = True
    new_group[1:] = (cols[1:] != cols[:-1]).any(axis=1)
    starts = np.flatnonzero(new_group)
    kept = order[starts]                          # best row per group
    # first-occurrence output order (the dict preserved insertion order)
    first_idx = np.minimum.reduceat(order, starts)
    kept = kept[np.argsort(first_idx, kind="stable")]
    return [detections[i] for i in kept]


def link_frame_detections(
    detections,
    link_iou: float = 0.2,
    max_gap: int = 3,
    min_length: int = 2,
):
    """Assemble video-long tubes from per-frame detections by greedy
    temporal linking (reference: the host-side linking in ``test.py`` /
    ``tube_utils`` (recon)).

    Per (video, class): walk frames in order; each active tube extends with
    the unclaimed detection of highest IoU >= link_iou against its last box;
    unclaimed detections start new tubes; tubes idle for > max_gap frames
    close. Tube score = mean of member scores.

    Returns [(video, class, score, {frame: box})].
    """
    by_vcf = defaultdict(lambda: defaultdict(list))
    for (video, frame), c, s, box in detections:
        by_vcf[(video, c)][frame].append((s, np.asarray(box, np.float32)))

    from step_tpu.eval.detection_metrics import _iou_1vsN

    out = []
    for (video, c), frames in by_vcf.items():
        active = []  # [{'frames': {f: box}, 'scores': [..], 'last_f': f}]
        done = []
        for f in sorted(frames):
            dets = frames[f]
            # close stale tubes
            still = []
            for tube in active:
                (done if f - tube["last_f"] > max_gap else still).append(tube)
            active = still
            claimed = [False] * len(dets)
            # extend tubes greedily by IoU against their last box
            for tube in active:
                if not dets:
                    break
                last_box = tube["frames"][tube["last_f"]]
                ious = np.asarray(
                    [0.0 if claimed[i] else
                     float(_iou_1vsN(last_box, d[1][None])[0])
                     for i, d in enumerate(dets)]
                )
                j = int(np.argmax(ious)) if len(ious) else -1
                if j >= 0 and ious[j] >= link_iou:
                    claimed[j] = True
                    s, box = dets[j]
                    tube["frames"][f] = box
                    tube["scores"].append(s)
                    tube["last_f"] = f
            # unclaimed detections start new tubes
            for i, (s, box) in enumerate(dets):
                if not claimed[i]:
                    active.append({"frames": {f: box}, "scores": [s], "last_f": f})
        done.extend(active)
        for tube in done:
            if len(tube["frames"]) >= min_length:
                out.append(
                    (video, c, float(np.mean(tube["scores"])), tube["frames"])
                )
    return out


def tube_nms(pred_tubes, iou_thresh: float):
    """Tube-level temporal NMS over linked video tubes.

    Greedy per (video, class): keep the highest-scored tube, drop any lower
    tube whose spatio-temporal IoU (temporal IoU x mean spatial IoU on
    shared frames, the UCF101-24 matching metric) with a kept tube is
    >= iou_thresh. Complements `link_frame_detections`, which only merges
    detections *into chains* — two parallel chains over the same actor
    (e.g. from NMS survivors of adjacent proposals) survive linking and are
    collapsed here.

    Args:
      pred_tubes: [(video, class, score, {frame: box})] from linking.
      iou_thresh: suppression threshold; <= 0 returns the input unchanged.

    Returns the surviving tubes, original order not preserved (sorted by
    descending score within each (video, class) group).
    """
    if iou_thresh <= 0:
        return pred_tubes
    from step_tpu.eval.detection_metrics import spatio_temporal_iou

    groups = defaultdict(list)
    for video, c, s, frames in pred_tubes:
        groups[(video, c)].append((s, frames))
    out = []
    for (video, c), tubes in groups.items():
        tubes.sort(key=lambda t: -t[0])
        kept = []
        for s, frames in tubes:
            if all(spatio_temporal_iou(frames, kf) < iou_thresh
                   for _, kf in kept):
                kept.append((s, frames))
        out.extend((video, c, s, frames) for s, frames in kept)
    return out


def evaluate_ucf(
    variables,
    dataset,
    cfg: StepConfig,
    model: Optional[STEPDetector] = None,
    dump_path: Optional[str] = None,
    max_batches: Optional[int] = None,
    calibration=None,
    fit_calibration_path: Optional[str] = None,
    mesh=None,
    variables_flow=None,
    device_linking: bool = False,
    max_videos: Optional[int] = None,
):
    """UCF101-24-style eval: frame-mAP@0.5 + video-mAP over linked tubes.

    `max_batches` bounds the frame-detection pass (clip batches);
    `max_videos` bounds the device-linking pass (whole videos). When only
    `max_batches` is given, device linking reuses it as a video bound so
    smoke runs stay cheap — the two passes then cover different subsets,
    so pass both explicitly when the numbers must be comparable.

    `calibration`: {'a': [C], 'b': [C]} (or a .npz path of the same) — maps
    scores through the per-class Platt sigmoid before metrics/linking.
    `fit_calibration_path`: fit per-class Platt parameters on THIS run's
    detections vs GT and save them as .npz (do this on a validation split,
    then pass the file as `calibration` for test runs).
    `device_linking`: assemble video tubes with the ON-DEVICE K-tube Viterbi
    linker (`collect_video_tubes`) instead of the host greedy pass — the
    BASELINE "cross-clip tube linking on device" path. Frame-mAP still
    reads the per-frame NMS surface, so this runs detection once per
    surface (twice total); parity with the host linker is tested in
    tests/test_eval.py.
    """
    import time

    # Phase wall-times (seconds) + row counts, returned as
    # results["timings"] — the full-scale host-cost accounting VERDICT r4
    # asked for (the reference evaluates 3,207 videos; collection/matching
    # /linking/AP are host-side Python and their scaling must be measured,
    # not assumed).
    timings: dict = {}
    t0 = time.perf_counter()
    coverage = {} if max_batches is not None else None
    raw_dets = collect_detections(variables, dataset, cfg, model,
                                  max_batches=max_batches, mesh=mesh,
                                  variables_flow=variables_flow,
                                  coverage=coverage)
    timings["collect_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    detections = dedupe_frame_detections(raw_dets)
    timings["dedupe_s"] = time.perf_counter() - t0
    timings["n_detections"] = len(detections)
    frame_gt, tube_gt = dataset.video_groundtruth()
    tube_gt_all = tube_gt
    if coverage is not None:
        # A truncated pass must be scored against only the GT it could have
        # seen: unseen frames'/videos' GT would otherwise count as misses
        # and cap the printed mAP at roughly (clips seen)/(clips total)
        # regardless of model quality (the in-train --eval-max-batches
        # numbers). Frame level is exact; video level is filtered to
        # touched videos (the boundary video may be partially covered —
        # one video of noise, flagged via "eval_subset" in the result).
        fkeys = coverage.get("fkeys", set())
        vids = coverage.get("videos", set())
        frame_gt = [g for g in frame_gt if g[0] in fkeys]
        tube_gt = [t for t in tube_gt if t[0] in vids]
    if fit_calibration_path:
        from step_tpu.eval.calibration import fit_calibration

        calib = fit_calibration(detections, frame_gt, cfg.num_classes)
        np.savez(fit_calibration_path, **calib)
        print(f"calibration fitted -> {fit_calibration_path}")
    if calibration is not None:
        from step_tpu.eval.calibration import apply_calibration

        if isinstance(calibration, str):
            calibration = dict(np.load(calibration))
        detections = apply_calibration(detections, calibration)
    if dump_path:
        with open(dump_path, "wb") as f:
            pickle.dump({"detections": detections}, f)

    t0 = time.perf_counter()
    results = {"frame_mAP@0.5": frame_map(detections, frame_gt, cfg.num_classes, 0.5)["mAP"]}
    timings["frame_map_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if device_linking:
        if max_videos is None and max_batches is not None:
            max_videos = max_batches  # keep smoke-limited runs bounded
        # calibration applies to the tube-score surface BEFORE linking,
        # matching the host branch (which links calibrated detections)
        pred_tubes = collect_video_tubes(variables, dataset, cfg, model,
                                         max_videos=max_videos,
                                         variables_flow=variables_flow,
                                         mesh=mesh, calibration=calibration)
        pred_tubes = tube_nms(pred_tubes, cfg.tube_nms_thresh)
        if max_videos is not None:
            # this pass bounds WHOLE videos (first max_videos in dataset
            # order — collect_video_tubes's grouping); score against
            # exactly that subset's tube GT
            seen, dev_vids = set(), []
            for v, _c in dataset.samples:
                if v not in seen:
                    seen.add(v)
                    dev_vids.append(v)
            dev_vids = set(dev_vids[:max_videos])
            # filter the ORIGINAL tube GT: this pass's subset is defined by
            # dev_vids alone — intersecting with the detection pass's
            # coverage (whose max_batches may span fewer/other videos)
            # would score the extra videos' tubes as pure FPs
            tube_gt = [t for t in tube_gt_all if t[0] in dev_vids]
            results["eval_subset"] = f"{len(dev_vids)} videos"
    else:
        pred_tubes = tube_nms(link_frame_detections(detections),
                              cfg.tube_nms_thresh)
        if coverage is not None:
            results["eval_subset"] = (
                f"{len(coverage.get('videos', ()))} videos touched")
    timings["link_s"] = time.perf_counter() - t0
    timings["n_tubes"] = len(pred_tubes)
    t0 = time.perf_counter()
    for thresh in (0.2, 0.5):
        results[f"video_mAP@{thresh}"] = video_map(
            pred_tubes, tube_gt, cfg.num_classes, thresh
        )["mAP"]
    results["video_mAP@0.5:0.95"] = video_map_range(pred_tubes, tube_gt, cfg.num_classes)
    timings["video_map_s"] = time.perf_counter() - t0
    try:
        import resource

        timings["peak_rss_mb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1)
    except ImportError:   # non-POSIX
        pass
    results["timings"] = timings
    return results


def evaluate_ava(
    variables,
    dataset,
    cfg: StepConfig,
    model: Optional[STEPDetector] = None,
    dump_path: Optional[str] = None,
    max_batches: Optional[int] = None,
    mesh=None,
):
    """AVA-style eval: keyframe frame-mAP@0.5 (normalized coords).

    Per-class NMS runs on device inside `detect_clip` (reference: test.py's
    score-threshold + per-class NMS before dumping detections); this driver
    reads the NMS survivors at the keyframe (central frame) only.
    `mesh`: optional device mesh for batch-sharded DP detection.
    """
    if cfg.two_stream or cfg.input_stream != "rgb":
        raise ValueError(
            "AVA evaluation is RGB-only (the dataset has no flow stream); "
            "got two_stream/input_stream overrides")
    model = model or STEPDetector(cfg)
    from step_tpu.data.loader import DataLoader

    loader = DataLoader(dataset, cfg, batch_size=4, shuffle=False, train=False,
                        drop_last=False, num_workers=2)

    if mesh is not None:
        from step_tpu.inference import make_parallel_detect_fn, pad_batch_to

        detect = make_parallel_detect_fn(cfg, mesh, model)
        n_shards = int(np.prod(mesh.devices.shape))
    else:
        # memoized factory (see collect_detections): an inline @jax.jit
        # closure here would re-trace the scan program every per-epoch eval
        from step_tpu.inference import make_detect_fn

        detect = make_detect_fn(cfg, model)

    kf = cfg.total_frames // 2
    detections = []
    seen_keys = set()          # keyframes evaluated (max_batches truncation)
    for bi, batch in enumerate(loader.epoch(0)):
        if max_batches is not None and bi >= max_batches:
            break
        rgb, props, pmask = batch["rgb"], batch["proposals"], batch["prop_mask"]
        if mesh is not None:
            rgb, props, pmask = (pad_batch_to(np.asarray(a), n_shards)
                                 for a in (rgb, props, pmask))
        out = detect(
            variables,
            jnp.asarray(rgb),
            jnp.asarray(props),
            jnp.asarray(pmask),
        )
        boxes = np.asarray(out["frame_boxes"])[:, kf]    # [B, C, K, 4]
        scores = np.asarray(out["frame_scores"])[:, kf]  # [B, C, K]
        mask = np.asarray(out["frame_mask"])[:, kf]
        for b, meta in enumerate(batch["meta"]):
            key = (meta["video"], meta["timestamp"])
            seen_keys.add(key)
            keep = np.argwhere((mask[b] > 0) & (scores[b] > cfg.score_thresh))
            for c, k in keep:
                detections.append(
                    (key, int(c), float(scores[b, c, k]),
                     boxes[b, c, k] / cfg.image_size)     # normalized
                )
    if dump_path:
        with open(dump_path, "wb") as f:
            pickle.dump({"detections": detections}, f)
    gt = dataset.groundtruth()
    if max_batches is not None:
        # score a truncated pass against only the keyframes it saw — GT of
        # unseen keyframes would otherwise cap the printed mAP at the
        # fraction of the split covered (same rationale as evaluate_ucf)
        gt = [g for g in gt if g[0] in seen_keys]
    return {"frame_mAP@0.5": ava_frame_map(detections, gt, cfg.num_classes)["mAP"]}
