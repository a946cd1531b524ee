"""Video-scale streaming stress (VERDICT r3 Next #8): device-linking cost
vs detection at realistic video length on the production streaming preset.

Measures, on the chip, for an L-clip video (default 64 sliding-window clips
= 384 frames at the production P=16 proposals / K=4 tubes-per-class /
C=24 classes):

  * detection: L clips through the OPTIMIZED detect program (the
    collect_video_tubes inner loop shape, clip_batch=64), chained;
  * linking: the jitted `link_tubes_multiclass_k` program on the [L,P,T,4]
    tube + [L,P,C] score surfaces (iterative K-path Viterbi with in-link
    suppression + Kadane trim), chained via score perturbation;
  * the detect:link cost ratio and end-to-end clips/s;
  * device memory headroom (`memory_stats`, when the backend reports it).

Full-program chained methodology (CLAUDE.md): every iteration's input is a
function of the previous output, one value readback closes each chain.

Usage:  python scripts/bench_linking_stream.py [--clips 64] [--buckets 64 128]
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
from step_tpu.tubes.linking import link_tubes_multiclass_k
from step_tpu.utils.compile_cache import enable_compile_cache
from step_tpu.utils.init import init_detector_cpu
from step_tpu.utils.profiling import chained_timer

enable_compile_cache()

ITERS = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=64,
                    help="video length in sliding-window clips (L)")
    ap.add_argument("--buckets", type=int, nargs="*", default=(64, 128),
                    help="additional bucketed link-program lengths to time")
    ap.add_argument("--clip-batch", type=int, default=64)
    args = ap.parse_args()

    cfg0 = PRESETS["streaming"]
    device = jax.devices()[0]
    variables = init_detector_cpu(cfg0, jax.random.PRNGKey(0),
                                  STEPDetector(cfg0))
    cfg, variables = optimize_for_inference(cfg0, variables)
    model = STEPDetector(cfg)
    variables = jax.device_put(variables, device)

    L, B = args.clips, args.clip_batch
    T, P, C = cfg.total_frames, cfg.max_proposals, cfg.num_classes
    rng = np.random.RandomState(0)
    rgb = jax.device_put(jnp.asarray(
        rng.rand(B, T, cfg.image_size, cfg.image_size, 3), jnp.float32),
        device)
    props, pmask = STEPDetector.initial_proposals(cfg, B)
    props, pmask = jax.device_put((props, pmask), device)

    @jax.jit
    def detect(variables, rgb, proposals, prop_mask):
        return detect_clip(variables, rgb, proposals, prop_mask, cfg, model)

    # ---- detection phase (the collect_video_tubes inner loop shape) ----
    # Canonical chained timing (utils/profiling.chained_timer): continues
    # the timed chain from the warmup output — restarting from `props`
    # would make iteration 1 byte-identical to the memoized warmup dispatch.
    n_batches = -(-L // B)
    detect_s = n_batches * chained_timer(
        lambda p: detect(variables, rgb, p, pmask)["tubes"],
        props, iters=ITERS * n_batches,
        readback=lambda p: float(jnp.sum(p)))         # per L-clip video

    # ---- linking phase at each bucketed length ----
    _, pmask1 = STEPDetector.initial_proposals(cfg, 1)

    def time_link(Lb):
        # Valid (x1,y1,x1+w,y1+h) geometry: independent uniforms would leave
        # ~3/4 of boxes degenerate (x2<x1 or y2<y1) and the IoU surfaces the
        # Viterbi transition/suppression stages run on near-all-zero.
        xy1 = rng.rand(Lb, P, T, 2).astype(np.float32) * (cfg.image_size - 24)
        wh = 16.0 + rng.rand(Lb, P, T, 2).astype(np.float32) * (
            cfg.image_size / 3)
        tubes = jnp.asarray(
            np.concatenate([xy1, np.minimum(xy1 + wh, cfg.image_size - 1.0)],
                           axis=-1))
        scores = jnp.asarray(rng.rand(Lb, P, C).astype(np.float32))
        prop_mask = jnp.broadcast_to(pmask1[0][None], (Lb, P))
        clip_mask = jnp.ones((Lb,), jnp.float32)
        tubes, scores, prop_mask, clip_mask = jax.device_put(
            (tubes, scores, prop_mask, clip_mask), device)

        @jax.jit
        def link(tubes, scores, prop_mask, clip_mask):
            return link_tubes_multiclass_k(
                tubes, scores, prop_mask, cfg.link_iou_weight,
                cfg.link_tubes_per_class, cfg.link_trim_thresh, clip_mask,
                stride=cfg.frames_per_chunk,
                suppress_iou=(cfg.link_suppress_iou
                              if cfg.link_suppress_iou > 0 else None))

        t0 = time.time()
        res = link(tubes, scores, prop_mask, clip_mask)
        _ = float(jnp.sum(res["tube_scores"]))
        compile_s = time.time() - t0

        def step(s):
            res = link(tubes, s, prop_mask, clip_mask)
            # data-dependent chain: perturb scores by the link output
            return s * (1.0 + jnp.mean(res["tube_scores"]) * 1e-3)

        return (chained_timer(step, scores, iters=ITERS,
                              readback=lambda s: float(jnp.sum(s))),
                compile_s)

    # Buckets run in the order GIVEN, repeats allowed: the r4 queue run
    # measured the first bucket (L=64) 3.7x slower than the second
    # (L=128), implicating relay settle after the detect phase rather
    # than the program itself — re-running a bucket later in the list is
    # the diagnostic. `link_ms_by_bucket` keeps the LAST (most settled)
    # measurement per length.
    buckets = list(args.buckets or ())
    covering = max(1 << (L - 1).bit_length(), 1)
    if covering not in buckets:
        buckets.append(covering)
    link_times = {}
    for i, Lb in enumerate(buckets):
        lt, cs = time_link(Lb)
        link_times[Lb] = lt
        print(f"link L={Lb} (pos {i}): {lt * 1e3:.2f} ms/video "
              f"(compile {cs:.0f}s)", flush=True)

    Lb0 = min(b for b in buckets if b >= L)
    link_s = link_times[Lb0]
    total_s = detect_s + link_s

    mem = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in stats:
                mem[k] = int(stats[k])
    except Exception:
        pass

    print(json.dumps({
        "metric": "streaming_video_clips_per_sec",
        "clips": L,
        "clip_batch": B,
        "detect_ms_per_video": round(detect_s * 1e3, 2),
        "link_ms_per_video": round(link_s * 1e3, 2),
        "link_share_pct": round(100 * link_s / total_s, 2),
        "clips_per_sec_end_to_end": round(L / total_s, 2),
        "link_ms_by_bucket": {str(k): round(v * 1e3, 2)
                              for k, v in link_times.items()},
        "memory": mem,
        "config": "streaming preset (24 cls, P=16, K=4, 18f, 224px)",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
