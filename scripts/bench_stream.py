"""Streaming video throughput: chunk-feature cache vs per-clip detection.

A video is a sliding sequence of K-chunk clips (stride one chunk). Per-clip
detection re-runs the stem on every chunk K times; the streaming path
(inference.detect_video_stream_batched) runs each chunk's stem once.

MEASURED VERDICT (v5e, 64-clip video, warm cache): per-clip 213 ms/video,
streaming cache 363 ms/video — the cache LOSES despite 1/3 the stem FLOPs,
because XLA-TPU conv3d collapses on short temporal extents (stem over
64 chunks x 6 frames = 170 ms vs 96 ms over 64 clips x 18 frames; refine at
T'=6 = 132 ms vs ~93 at T'=5). conv3d_impl=tcat makes both stages ~2x
worse again (349 / 337 ms). Streaming mode stays as reference-exact
semantics + cache demonstrator; production throughput keeps chunk_stem=False.

Full-program chained timing: iteration i feeds a scaled copy of the video
back in, so dispatches are data-dependent (relay-memoization-proof).
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import time

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import PRESETS
from step_tpu.inference import detect_clip, detect_video_stream_batched
from step_tpu.models.detector import STEPDetector
from step_tpu.utils.compile_cache import enable_compile_cache
from step_tpu.utils.init import init_detector_cpu

enable_compile_cache()

N_CHUNKS = 64          # one clip per chunk center; 384 frames of video
CLIP_BATCH = 64
ITERS = 10


def main():
    cfg = PRESETS["streaming"].replace(chunk_stem=True, batch_size=CLIP_BATCH)
    model = STEPDetector(cfg)
    device = jax.devices()[0]
    variables = init_detector_cpu(cfg, jax.random.PRNGKey(0), model,
                                  device=device)
    c = cfg.frames_per_chunk
    rng = np.random.RandomState(0)
    frames = jax.device_put(
        jnp.asarray(rng.rand(N_CHUNKS * c, cfg.image_size, cfg.image_size, 3),
                    jnp.float32), device)

    # ---- streaming (cached chunk features) ----
    out = detect_video_stream_batched(variables, frames, cfg, model,
                                      clip_batch=CLIP_BATCH)
    jax.block_until_ready(out)
    x = frames
    t0 = time.time()
    for i in range(ITERS):
        out = detect_video_stream_batched(variables, x, cfg, model,
                                          clip_batch=CLIP_BATCH)
        x = x * (1.0 + jnp.mean(out["tube_scores"].astype(jnp.float32))
                 * 1e-4 + i * 1e-6)
    jax.block_until_ready(x)
    t_stream = (time.time() - t0) / ITERS
    n_clips = N_CHUNKS
    print(f"streaming (cache): {t_stream*1e3:8.1f} ms/video "
          f"({n_clips/t_stream:7.1f} clips/s)", flush=True)

    # ---- per-clip baseline on the same windows ----
    K, half = cfg.num_chunks, cfg.num_chunks // 2

    @jax.jit
    def detect(variables, rgb, proposals, prop_mask):
        return detect_clip(variables, rgb, proposals, prop_mask, cfg, model)

    def per_clip_all(x):
        chunks = x.reshape(N_CHUNKS, c, *x.shape[1:])
        outs = None
        for i in range(0, N_CHUNKS, CLIP_BATCH):
            idx = np.arange(i, min(i + CLIP_BATCH, N_CHUNKS))
            win = np.clip(idx[:, None] + np.arange(-half, half + 1)[None, :],
                          0, N_CHUNKS - 1)
            clips = chunks[win].reshape(len(idx), K * c, *x.shape[1:])
            props, mask = STEPDetector.initial_proposals(cfg, len(idx))
            outs = detect(variables, clips, props, mask)
        return outs

    out = per_clip_all(frames)
    jax.block_until_ready(out)
    x = frames
    t0 = time.time()
    for i in range(ITERS):
        out = per_clip_all(x)
        x = x * (1.0 + jnp.mean(out["tube_scores"].astype(jnp.float32))
                 * 1e-4 + i * 1e-6)
    jax.block_until_ready(x)
    t_clip = (time.time() - t0) / ITERS
    print(f"per-clip (no cache): {t_clip*1e3:8.1f} ms/video "
          f"({n_clips/t_clip:7.1f} clips/s)  "
          f"speedup {t_clip/t_stream:.2f}x", flush=True)


if __name__ == "__main__" and __import__("sys").argv[-1] != "--decompose":
    main()


def decompose():
    """Stage timings for the streaming path (chained, memoization-proof)."""
    import os
    impl = os.environ.get("CONV_IMPL", "direct")
    cfg = PRESETS["streaming"].replace(chunk_stem=True, batch_size=CLIP_BATCH,
                                       conv3d_impl=impl)
    print(f"conv3d_impl={impl}", flush=True)
    model = STEPDetector(cfg)
    device = jax.devices()[0]
    variables = init_detector_cpu(cfg, jax.random.PRNGKey(0), model,
                                  device=device)
    c = cfg.frames_per_chunk
    rng = np.random.RandomState(0)
    chunks = jax.device_put(
        jnp.asarray(rng.rand(N_CHUNKS, c, cfg.image_size, cfg.image_size, 3),
                    jnp.float32), device)

    from step_tpu.inference import _stream_fns
    stem_chunks, refine_windows = _stream_fns(cfg)

    feats = stem_chunks(variables, chunks)
    jax.block_until_ready(feats)
    x = chunks
    t0 = time.time()
    for i in range(ITERS):
        f = stem_chunks(variables, x)
        x = x * (1.0 + jnp.mean(f.astype(jnp.float32)) * 1e-4 + i * 1e-6)
    jax.block_until_ready(x)
    t_stem = (time.time() - t0) / ITERS
    print(f"stem (64 chunks x {c}f): {t_stem*1e3:8.1f} ms", flush=True)

    half = cfg.num_chunks // 2
    centers = np.clip(np.arange(N_CHUNKS)[:, None]
                      + np.arange(-half, half + 1)[None, :], 0, N_CHUNKS - 1)
    centers = jax.device_put(jnp.asarray(centers), device)
    props, mask = STEPDetector.initial_proposals(cfg, N_CHUNKS)
    props, mask = jax.device_put((props, mask), device)
    out = refine_windows(variables, feats, centers, props, mask)
    jax.block_until_ready(out)
    p = props
    t0 = time.time()
    for i in range(ITERS):
        out = refine_windows(variables, feats, centers, p, mask)
        p = out["tubes"]
    jax.block_until_ready(p)
    t_ref = (time.time() - t0) / ITERS
    print(f"refine+nms (B={N_CHUNKS}): {t_ref*1e3:8.1f} ms", flush=True)


if __name__ == "__main__" and __import__("sys").argv[-1] == "--decompose":
    decompose()
