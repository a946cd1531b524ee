"""Inference: clip detection and streaming video detection — one compiled
program each.

Reference parity: ``test.py`` (recon) — run the progressive forward, score,
per-class per-frame NMS, then (for video mAP) link detections across clips.
TPU-native: score transform + NMS + linking all execute on device inside the
same jit as the network forward (the reference crosses host↔GPU between
forward, NMS, and host-side linking).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import StepConfig
from step_tpu.models.detector import STEPDetector
from step_tpu.ops.nms import batched_nms
from step_tpu.tubes.linking import link_tubes_multiclass_k


def class_scores_from_logits(cls_logits: jnp.ndarray, cfg: StepConfig) -> jnp.ndarray:
    """[..., ncls] logits → [..., C] foreground probabilities."""
    if cfg.multilabel:
        return jax.nn.sigmoid(cls_logits)
    probs = jax.nn.softmax(cls_logits, axis=-1)
    return probs[..., 1:]  # drop background column


# Survivor-selection strategy switch: one-hot MXU einsum above this many
# [B*T*C*K] surface elements, take_along_axis gathers below. Module-level
# so tests can force the einsum path on CPU-sized shapes (monkeypatch).
ONEHOT_SELECT_MIN_SURFACE = 1 << 16


def nms_surface(
    tubes: jnp.ndarray,        # [B, P, T, 4]
    scores: jnp.ndarray,       # [B, P, C] — already masked to real proposals
    prop_mask: jnp.ndarray,    # [B, P]
    cfg: StepConfig,
):
    """Per-frame per-class NMS over final tubes → the detection surface."""
    # No more than P proposals can survive NMS — never scan past that.
    max_keep = min(cfg.max_detections, tubes.shape[1])

    if cfg.nms_impl == "pallas":
        from step_tpu.ops.nms_pallas import nms_many

        B, P, T = tubes.shape[0], tubes.shape[1], tubes.shape[2]
        C = scores.shape[-1]
        boxes_tf = jnp.swapaxes(tubes, 1, 2)                 # [B, T, P, 4]
        boxes_prob = jnp.broadcast_to(
            boxes_tf[:, :, None], (B, T, C, P, 4))
        scores_prob = jnp.broadcast_to(
            jnp.swapaxes(scores, 1, 2)[:, None], (B, T, C, P))
        valid_prob = jnp.broadcast_to(
            prop_mask[:, None, None], (B, T, C, P))
        idx, mask = nms_many(
            boxes_prob.reshape(-1, P, 4), scores_prob.reshape(-1, P),
            cfg.nms_thresh, max_keep, cfg.score_thresh,
            valid_prob.reshape(-1, P),
            interpret=jax.default_backend() != "tpu",
        )
        keep_idx = idx.reshape(B, T, C, max_keep)
        keep_mask = mask.reshape(B, T, C, max_keep)
        if B * T * C * max_keep >= ONEHOT_SELECT_MIN_SURFACE:
            # Select survivors by one-hot MATMUL, not take_along_axis: the
            # gathers on the [B*T*C*K] surface measured 25 ms/batch at
            # B=128 (8% of detect — trace r3; one-hot bench 413 → 450
            # clips/s), and the f32 one-hot einsum is MXU-shaped and exact
            # (each row sums exactly one 1.0*v). At small surfaces (B=1
            # latency path) the gather is cheaper — keep it there.
            onehot = jax.nn.one_hot(keep_idx, P, dtype=jnp.float32)
            frame_boxes = jnp.einsum(
                "btckp,bptx->btckx", onehot, tubes.astype(jnp.float32))
            frame_scores = jnp.einsum(
                "btckp,bpc->btck", onehot, scores.astype(jnp.float32))
            frame_scores = frame_scores * keep_mask
        else:
            frame_boxes = jnp.take_along_axis(
                boxes_prob, keep_idx[..., None].astype(jnp.int32), axis=3)
            frame_scores = jnp.take_along_axis(
                scores_prob, keep_idx, axis=3) * keep_mask
        return {
            "tubes": tubes,
            "tube_scores": scores,
            "frame_boxes": frame_boxes,
            "frame_scores": frame_scores,
            "frame_mask": keep_mask,
        }

    def per_frame(boxes_t, scores_b, mask_b):
        # boxes_t [P,4], scores_b [P,C]
        keep_idx, keep_mask = batched_nms(
            boxes_t, scores_b, cfg.nms_thresh, max_keep,
            cfg.score_thresh, mask_b,
        )                                            # [C,K]
        kept_boxes = jnp.take(boxes_t, keep_idx.reshape(-1), axis=0).reshape(
            *keep_idx.shape, 4
        )
        kept_scores = jnp.take_along_axis(
            scores_b.T, keep_idx, axis=1
        )                                            # [C,K]
        return kept_boxes, kept_scores * keep_mask, keep_mask

    def per_example(tubes_b, scores_b, mask_b):
        boxes_tf = jnp.swapaxes(tubes_b, 0, 1)       # [T, P, 4]
        return jax.vmap(per_frame, in_axes=(0, None, None))(boxes_tf, scores_b, mask_b)

    frame_boxes, frame_scores, frame_mask = jax.vmap(per_example)(
        tubes, scores, prop_mask
    )
    return {
        "tubes": tubes,
        "tube_scores": scores,
        "frame_boxes": frame_boxes,
        "frame_scores": frame_scores,
        "frame_mask": frame_mask,
    }


def detect_clip(
    variables,
    rgb: jnp.ndarray,          # [B, T, H, W, 3]
    proposals: jnp.ndarray,    # [B, P, T, 4]
    prop_mask: jnp.ndarray,    # [B, P]
    cfg: StepConfig,
    model: Optional[STEPDetector] = None,
    flow: Optional[jnp.ndarray] = None,
):
    """Full detection for a batch of clips.

    Returns dict:
      tubes        [B, P, T, 4] — final refined tubes
      tube_scores  [B, P, C]    — per-tube class probabilities
      frame_boxes  [B, T, C, K, 4], frame_scores [B, T, C, K],
      frame_mask   [B, T, C, K] — per-frame per-class NMS survivors
    """
    model = model or STEPDetector(cfg)
    outputs = model.apply(variables, rgb, proposals, flow, train=False)
    tubes = outputs["tubes"][-1]                     # [B, P, T, 4]
    scores = class_scores_from_logits(outputs["cls_logits"][-1], cfg)  # [B,P,C]
    # Padding proposal slots are never supervised — their logits are
    # arbitrary. Zero them at the surface so every consumer (linking,
    # thresholds, users reading tube_scores) sees only real proposals.
    scores = scores * prop_mask[..., None]
    return nms_surface(tubes, scores, prop_mask, cfg)


def detect_clip_late_fusion(
    variables_rgb,
    variables_flow,
    rgb: jnp.ndarray,          # [B, T, H, W, 3]
    flow: jnp.ndarray,         # [B, T, H, W, 2] in [-1, 1]
    proposals: jnp.ndarray,    # [B, P, T, 4]
    prop_mask: jnp.ndarray,    # [B, P]
    cfg: StepConfig,
    model_rgb: Optional[STEPDetector] = None,
    model_flow: Optional[STEPDetector] = None,
):
    """Reference two-stream protocol (``test.py`` two-stream path (recon)):
    two SEPARATE single-stream detectors, class scores fused pre-NMS.

    Both streams refine the same initial cuboids, so per-proposal score
    correspondence is meaningful; fused score = w * p_rgb + (1-w) * p_flow
    (w = cfg.late_fusion_weight). Boxes come from the appearance (RGB)
    stream, which localizes; flow mainly sharpens classification — the
    paper's own ablation reads the same way. Runs as one compiled program.
    """
    cfg_rgb = cfg.replace(two_stream=False, input_stream="rgb")
    cfg_flow = cfg.replace(two_stream=False, input_stream="flow")
    model_rgb = model_rgb or STEPDetector(cfg_rgb)
    model_flow = model_flow or STEPDetector(cfg_flow)

    out_rgb = model_rgb.apply(variables_rgb, rgb, proposals, None, train=False)
    out_flow = model_flow.apply(variables_flow, flow, proposals, None, train=False)

    w = cfg.late_fusion_weight
    scores = (
        w * class_scores_from_logits(out_rgb["cls_logits"][-1], cfg)
        + (1.0 - w) * class_scores_from_logits(out_flow["cls_logits"][-1], cfg)
    )
    scores = scores * prop_mask[..., None]
    return nms_surface(out_rgb["tubes"][-1], scores, prop_mask, cfg)


def stem_features(variables, x: jnp.ndarray, cfg: StepConfig,
                  flow: Optional[jnp.ndarray] = None):
    """Backbone features only — FeatureNet applied from the detector's own
    variable subtree (mirrors STEPDetector.__call__ preprocessing).

    With `cfg.chunk_stem`, `x` may be a SINGLE CHUNK ([B, T/K, H, W, C]) —
    per-chunk stems have no cross-chunk receptive field, so per-chunk
    features concatenate into exactly the full-clip feature map. This is
    what the streaming chunk cache exploits.
    """
    from flax.core import FrozenDict

    from step_tpu.models.nets import FeatureNet
    from step_tpu.preprocess import device_preprocess, device_preprocess_flow

    dtype = jnp.dtype(cfg.compute_dtype)
    if cfg.input_stream == "rgb":
        x = device_preprocess(x)
    else:
        x = device_preprocess_flow(x)
    if flow is not None:
        flow = device_preprocess_flow(flow)
    fnet = FeatureNet(two_stream=cfg.two_stream, depth=cfg.backbone_depth,
                      s2d=cfg.stem_s2d, fuse_bn_relu=cfg.fused_bn_relu,
                      bn_folded=cfg.bn_folded,
                      fused_inception=cfg.fused_inception,
                      fused_inception3=cfg.fused_inception3 == "all",
                      conv_impl=cfg.conv3d_impl, dtype=dtype)
    bs = variables.get("batch_stats", FrozenDict())
    fvars = {"params": variables["params"]["features"]}
    if "features" in bs:
        fvars["batch_stats"] = bs["features"]
    return fnet.apply(fvars, x.astype(dtype),
                      None if flow is None else flow.astype(dtype), False)


def refine_from_features(variables, feat: jnp.ndarray, proposals: jnp.ndarray,
                         cfg: StepConfig):
    """Context + the S-step refinement scan, applied from the detector's
    variable subtrees onto a precomputed feature map (the streaming-cache
    entry point; numerically identical to the in-model path)."""
    from flax.core import FrozenDict

    from step_tpu.models.detector import make_step_loop, step_loop_args
    from step_tpu.models.nets import ContextNet

    dtype = jnp.dtype(cfg.compute_dtype)
    bs = variables.get("batch_stats", FrozenDict())
    ctx = None
    if cfg.use_context:
        cvars = {"params": variables["params"]["context"]}
        if "context" in bs:
            cvars["batch_stats"] = bs["context"]
        ctx = ContextNet(dtype=dtype).apply(cvars, feat, False)

    svars = {"params": variables["params"]["steps"]}
    if "steps" in bs:
        svars["batch_stats"] = bs["steps"]
    # Shared constructor keeps both scan conventions + remat/unroll options
    # in ONE place; this .apply path now also honors cfg.scan_unroll (it
    # previously always lowered rolled — the lifted model path unrolled).
    Loop = make_step_loop(cfg)
    _, outputs = Loop(cfg).apply(
        svars, *step_loop_args(cfg, feat, ctx, proposals))
    return outputs


def _stream_fns(cfg: StepConfig):
    """jitted (stem_chunks, refine_windows) for the streaming cache path,
    memoized on the (hashable, frozen) config — re-creating jitted closures
    per call would re-trace the 22M-param scan program every time."""
    if cfg in _STREAM_FN_CACHE:
        return _STREAM_FN_CACHE[cfg]

    @jax.jit
    def stem_chunks(variables, chunks, fchunks=None):
        return stem_features(variables, chunks, cfg, fchunks)

    @jax.jit
    def refine_windows(variables, feats, centers, proposals, prop_mask):
        """Gather K-chunk feature windows from cached per-chunk features
        (inside the jit — eager gathers are per-op relay round-trips) and
        run refinement + NMS."""
        B, K = centers.shape
        windows = feats[centers]                     # [B, K, tc, h, w, C]
        windows = windows.reshape(B, K * feats.shape[1], *feats.shape[2:])
        out = refine_from_features(variables, windows, proposals, cfg)
        tubes = out["tubes"][-1]
        scores = class_scores_from_logits(out["cls_logits"][-1], cfg)
        scores = scores * prop_mask[..., None]
        return nms_surface(tubes, scores, prop_mask, cfg)

    _STREAM_FN_CACHE[cfg] = (stem_chunks, refine_windows)
    return stem_chunks, refine_windows


_STREAM_FN_CACHE: dict = {}


def detect_video_stream(
    variables,
    frames,                    # [F, H, W, 3] — the whole video (F = n*c frames)
    cfg: StepConfig,
    model: Optional[STEPDetector] = None,
    flow=None,                 # [F, H, W, 2] for a flow-input detector
):
    """Sliding-window video detection with a per-chunk stem-feature cache.

    Requires ``cfg.chunk_stem=True`` (per-chunk stems — the reference's own
    BaseNet semantics). Consecutive K-chunk clips (stride = one chunk)
    share K-1 chunks, so each chunk's stem runs ONCE for the whole video
    instead of once per overlapping clip. Per-clip feature maps are
    assembled from the cache and fed through the refinement scan + NMS,
    numerically identical to `detect_clip` on the same window.

    Edge clips clamp to the first/last chunk (forward/backward fill),
    matching the datasets' frame-clamping convention.

    This is the incremental (clip-at-a-time) form — use it for live/online
    streams; for offline videos `detect_video_stream_batched` amortizes far
    better. Returns a list of per-clip detection dicts (batch dim 1).
    """
    if not cfg.chunk_stem:
        raise ValueError("detect_video_stream requires cfg.chunk_stem=True")
    c, K = cfg.frames_per_chunk, cfg.num_chunks
    F = frames.shape[0]
    if F % c:
        raise ValueError(f"video length {F} not a multiple of chunk size {c}")
    n = F // c
    half = K // 2
    stem_chunks, refine_windows = _stream_fns(cfg)

    cache = {}

    def chunk_feat(i):
        i = min(max(i, 0), n - 1)          # clamp at video edges
        if i not in cache:
            chunk = frames[None, i * c : (i + 1) * c]
            fch = None if flow is None else flow[None, i * c : (i + 1) * c]
            cache[i] = stem_chunks(variables, chunk, fch)
        return cache[i]

    proposals, prop_mask = STEPDetector.initial_proposals(cfg, 1)
    centers1 = jnp.arange(K)[None, :]      # window rows into the local feat
    results = []
    for center in range(n):
        feat = jnp.concatenate(
            [chunk_feat(center + d) for d in range(-half, half + 1)], axis=0
        )                                   # [K, tc, h, w, C]
        out = refine_windows(variables, feat, centers1, proposals, prop_mask)
        # Cheap per-clip VALUE readback (same guard as the batched form):
        # many heavy dispatches queued with no readback stall pathologically
        # on the relay transport (CLAUDE.md round-3 failure mode, 52-106
        # s/step measured). ~ms against a heavy refine program — and this
        # is the live/online form, where the caller consumes each clip's
        # result before the next arrives anyway.
        _ = float(jnp.sum(out["tube_scores"][..., :1, :1]))
        results.append(out)
    return results


def detect_video_stream_batched(
    variables,
    frames,                    # [F, H, W, 3] — whole video, F = n*c frames
    cfg: StepConfig,
    model: Optional[STEPDetector] = None,
    flow=None,
    clip_batch: int = 64,
):
    """Batched streaming detection with the chunk-feature cache.

    The production form of `detect_video_stream`: (1) every chunk's stem
    features are computed ONCE in chunk-batched stem calls, (2) per-clip
    K-chunk feature windows are gathered from the cached features INSIDE
    the refinement jit, (3) refinement + NMS runs over `clip_batch` clips
    at a time. Stem work drops ~Kx vs per-clip detection (measured in
    scripts/bench_stream.py).

    Returns one detection dict (as from `detect_clip`) with leading dim n
    (= number of chunk centers). n must be a multiple of clip_batch, or
    smaller than it (one partial program).
    """
    if not cfg.chunk_stem:
        raise ValueError("detect_video_stream_batched requires cfg.chunk_stem=True")
    c, K = cfg.frames_per_chunk, cfg.num_chunks
    F = frames.shape[0]
    if F % c:
        raise ValueError(f"video length {F} not a multiple of chunk size {c}")
    n = F // c
    half = K // 2
    stem_chunks, refine_windows = _stream_fns(cfg)

    # 1) stem over all chunks, batched (each chunk is a batch element)
    chunks = frames.reshape(n, c, *frames.shape[1:])
    fchunks = None if flow is None else flow.reshape(n, c, *flow.shape[1:])
    feats = []
    for i in range(0, n, clip_batch):
        f = stem_chunks(variables, chunks[i : i + clip_batch],
                        None if fchunks is None else
                        fchunks[i : i + clip_batch])
        # cheap per-dispatch VALUE readback: many heavy dispatches with no
        # readback stall pathologically on the relay transport (CLAUDE.md
        # round-3 failure mode); one scalar costs ~ms
        _ = float(jnp.sum(f[..., :1, :1, :1]))
        feats.append(f)
    feats = jnp.concatenate(feats, axis=0) if len(feats) > 1 else feats[0]

    # 2) + 3) window gather (in-jit) and batched refinement + NMS
    centers = np.arange(n)[:, None] + np.arange(-half, half + 1)[None, :]
    centers = jnp.asarray(np.clip(centers, 0, n - 1))   # [n, K]
    outs = []
    proposals_full, prop_mask_full = None, None
    for i in range(0, n, clip_batch):
        ctr = centers[i : i + clip_batch]
        if ctr.shape[0] == clip_batch:
            # loop-invariant full-size proposals: build once (two tiny
            # host->device transfers cost ~3.5 s/batch on the relay)
            if proposals_full is None:
                proposals_full, prop_mask_full = (
                    STEPDetector.initial_proposals(cfg, clip_batch))
            proposals, prop_mask = proposals_full, prop_mask_full
        else:   # ragged tail batch (different program shape anyway)
            proposals, prop_mask = STEPDetector.initial_proposals(
                cfg, ctr.shape[0])
        o = refine_windows(variables, feats, ctr, proposals, prop_mask)
        _ = float(jnp.sum(o["tube_scores"][:1, :1]))   # relay-stall guard
        outs.append(o)
    if len(outs) == 1:
        return outs[0]
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *outs
    )


FLOW_DATASET_ERROR = ("two-stream/late-fusion/flow-stream eval needs a "
                      "flow-enabled dataset (with_flow=True)")


def eval_needs_flow(cfg: StepConfig, variables_flow=None) -> bool:
    """True when an eval collector must read flow from the dataset —
    shared rule for `collect_detections` and `collect_video_tubes`."""
    return (cfg.two_stream or variables_flow is not None
            or cfg.input_stream == "flow")


def make_late_fusion_detect_fn(cfg: StepConfig):
    """jit-wrapped `detect_clip_late_fusion` closed over the config —
    the one fusion program both eval collectors share.

    Memoized on cfg (same hazard _STREAM_FN_CACHE names: jit's trace cache
    keys on function identity, so a fresh closure per call would re-trace
    the full scan program on every per-epoch eval)."""
    if cfg in _LF_FN_CACHE:
        return _LF_FN_CACHE[cfg]

    @jax.jit
    def _detect_lf(v_rgb, v_flow, rgb, proposals, prop_mask, flow):
        return detect_clip_late_fusion(v_rgb, v_flow, rgb, flow,
                                       proposals, prop_mask, cfg)

    _LF_FN_CACHE[cfg] = _detect_lf
    return _detect_lf


_LF_FN_CACHE: dict = {}


def make_detect_fn(cfg: StepConfig, model: Optional[STEPDetector] = None):
    """jit-wrapped `detect_clip` closed over the config.

    Memoized on (cfg, model) — flax Modules are frozen dataclasses, equal
    by fields — so repeated factory calls (per-epoch evals) return the SAME
    function object and jit's identity-keyed trace cache rehits instead of
    re-tracing the S-step scan program every epoch."""
    model = model or STEPDetector(cfg)
    key = (cfg, model)
    if key in _DETECT_FN_CACHE:
        return _DETECT_FN_CACHE[key]

    @jax.jit
    def _detect(variables, rgb, proposals, prop_mask, flow=None):
        return detect_clip(variables, rgb, proposals, prop_mask, cfg, model, flow)

    _DETECT_FN_CACHE[key] = _detect
    return _detect


_DETECT_FN_CACHE: dict = {}


def make_parallel_detect_fn(cfg: StepConfig, mesh,
                            model: Optional[STEPDetector] = None):
    """Batch-sharded data-parallel `detect_clip` over a device mesh — the
    inference/serving analog of ``train.trainer.make_parallel_train_step``
    (reference: ``nn.DataParallel`` wraps the net for BOTH train and test
    in ``train.py``/``test.py`` (recon); the rebuild's eval path was
    single-device until this).

    Params are replicated; rgb/proposals/prop_mask (and flow) shard their
    leading batch dim over the mesh's 'data' axis, as do all outputs. GSPMD
    inserts no collectives for this program (detection is per-clip
    independent), so DP inference scales linearly over ICI. The global
    batch must divide the data-axis size — `pad_batch_to` helps with
    ragged final eval batches.
    """
    from step_tpu.parallel.mesh import batch_sharding, replicated_sharding

    # memoized on (cfg, mesh) — same hazard _STREAM_FN_CACHE names: jit's
    # trace cache keys on function identity, so a fresh closure per eval
    # (collect_detections AND collect_video_tubes both call this) would
    # retrace the full program each time. A caller-supplied model bypasses
    # the cache (its identity isn't part of the key).
    if model is None and (cfg, mesh) in _PAR_FN_CACHE:
        return _PAR_FN_CACHE[(cfg, mesh)]
    cacheable = model is None
    model = model or STEPDetector(cfg)
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)

    if cfg.two_stream:

        @functools.partial(
            jax.jit,
            in_shardings=(repl, bsh, bsh, bsh, bsh),
            out_shardings=bsh,
        )
        def _detect(variables, rgb, proposals, prop_mask, flow):
            return detect_clip(variables, rgb, proposals, prop_mask, cfg,
                               model, flow)

    else:

        @functools.partial(
            jax.jit,
            in_shardings=(repl, bsh, bsh, bsh),
            out_shardings=bsh,
        )
        def _detect(variables, rgb, proposals, prop_mask):
            return detect_clip(variables, rgb, proposals, prop_mask, cfg,
                               model)

    if cacheable:
        _PAR_FN_CACHE[(cfg, mesh)] = _detect
    return _detect


_PAR_FN_CACHE: dict = {}


def make_parallel_late_fusion_detect_fn(cfg: StepConfig, mesh):
    """Batch-sharded `detect_clip_late_fusion` over a device mesh — the
    late-fusion analog of `make_parallel_detect_fn` (reference: the
    two-stream ``test.py`` path also runs under ``nn.DataParallel``
    (recon)). Both streams' variables replicate; rgb/flow/proposals/
    prop_mask shard their batch dim over 'data'. Like the single-stream
    DP program, GSPMD inserts no collectives (per-clip independent).
    Memoized on (cfg, mesh) like make_parallel_detect_fn / _LF_FN_CACHE —
    a fresh jitted closure per eval would retrace the two-stream fusion
    program every epoch."""
    from step_tpu.parallel.mesh import batch_sharding, replicated_sharding

    if (cfg, mesh) in _PAR_LF_FN_CACHE:
        return _PAR_LF_FN_CACHE[(cfg, mesh)]
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, bsh, bsh, bsh, bsh),
        out_shardings=bsh,
    )
    def _detect_lf(v_rgb, v_flow, rgb, proposals, prop_mask, flow):
        return detect_clip_late_fusion(v_rgb, v_flow, rgb, flow,
                                       proposals, prop_mask, cfg)

    _PAR_LF_FN_CACHE[(cfg, mesh)] = _detect_lf
    return _detect_lf


_PAR_LF_FN_CACHE: dict = {}


def pad_batch_to(arr: np.ndarray, multiple: int) -> np.ndarray:
    """Pad a [B, ...] array's batch dim up to the next multiple by repeating
    the last element (keeps shapes static for sharded eval; padded rows are
    dropped host-side by iterating only the real metadata)."""
    b = arr.shape[0]
    pad = -b % multiple
    if pad == 0:
        return arr
    return np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)


def detect_video(
    variables,
    clips: jnp.ndarray,        # [L, T, H, W, 3] — a video tiled into L clips
    cfg: StepConfig,
    model: Optional[STEPDetector] = None,
    flow: Optional[jnp.ndarray] = None,
    clip_mask: Optional[jnp.ndarray] = None,   # [L] — 0 marks padded clips
    tiling_stride: Optional[int] = None,
):
    """Streaming inference (BASELINE config 4): detect every clip (batched),
    then link per-clip tubes into K video tubes per class on device
    (iterative node-disjoint Viterbi + temporal trim — tubes/linking.py).

    `clip_mask` supports length-bucketed videos: padded clip slots (repeat
    of the last real clip) contribute nothing to the link values and are
    always trimmed out of the active runs.

    `tiling_stride`: video-frame stride between consecutive clips. The
    default (None) is the NON-overlapping tiling demo.py produces
    (transition IoU = last box vs first box); sliding-window callers must
    pass their stride so transitions compare temporally aligned boxes
    (tubes/linking.py).

    Returns dict with per-clip detections plus (K = cfg.link_tubes_per_class):
      link_paths       [C, K, L] int32 — tube index per clip
      link_scores      [C, K]          — path objective over the trimmed
        run (scores + weighted transition IoUs; NEG-free k-ranking even
        when a clip's nodes were exhausted — tubes/linking.py)
      link_trim        [C, K, L]       — 1 where the video tube is active
      link_tube_scores [C, K]          — mean per-clip score over the run
    """
    model = model or STEPDetector(cfg)
    L = clips.shape[0]
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, L)
    det = detect_clip(variables, clips, proposals, prop_mask, cfg, model, flow)
    link = link_tubes_multiclass_k(
        det["tubes"], det["tube_scores"], prop_mask, cfg.link_iou_weight,
        cfg.link_tubes_per_class, cfg.link_trim_thresh, clip_mask,
        stride=tiling_stride,
        suppress_iou=(cfg.link_suppress_iou
                      if cfg.link_suppress_iou > 0 else None),
    )
    det["link_paths"] = link["paths"]
    det["link_scores"] = link["values"]
    det["link_trim"] = link["trim"]
    det["link_tube_scores"] = link["tube_scores"]
    return det


def make_detect_video_fn(cfg: StepConfig, model: Optional[STEPDetector] = None):
    model = model or STEPDetector(cfg)

    @functools.partial(jax.jit, static_argnames=("tiling_stride",))
    def _detect(variables, clips, flow=None, clip_mask=None,
                tiling_stride=None):
        return detect_video(variables, clips, cfg, model, flow, clip_mask,
                            tiling_stride)

    return _detect
