"""Chunked stem + streaming chunk-feature-cache inference.

The cache path must be NUMERICALLY IDENTICAL to detect_clip on the same
window (per-chunk stems have no cross-chunk receptive field), including at
video edges where chunks clamp.
"""

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import StepConfig
from step_tpu.inference import detect_clip, detect_video_stream
from step_tpu.models.detector import STEPDetector
from step_tpu.utils.init import init_detector_cpu

CFG = StepConfig(
    dataset="synthetic", num_classes=4, frames_per_chunk=2, num_chunks=3,
    num_steps=2, iou_thresholds=(0.4, 0.5), step_loss_weights=(1.0, 1.0),
    temporal_extension=True, image_size=32, backbone_depth="tiny",
    feature_stride=8, pooled_size=4, max_proposals=12, max_detections=4,
    compute_dtype="float32", chunk_stem=True,
)


def _setup():
    model = STEPDetector(CFG)
    variables = init_detector_cpu(CFG, jax.random.PRNGKey(0), model)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(5 * CFG.frames_per_chunk, 32, 32, 3),
                         jnp.float32)
    return model, variables, frames


def test_chunk_stem_feature_shape():
    model, variables, frames = _setup()
    rgb = frames[None, : CFG.total_frames]
    props, _ = STEPDetector.initial_proposals(CFG, 1)
    out = model.apply(variables, rgb, props)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()


def test_stream_matches_detect_clip():
    model, variables, frames = _setup()
    c = CFG.frames_per_chunk
    results = detect_video_stream(variables, frames, CFG, model)
    assert len(results) == 5

    props, mask = STEPDetector.initial_proposals(CFG, 1)

    def clip_window(chunk_ids):
        return jnp.concatenate(
            [frames[i * c : (i + 1) * c] for i in chunk_ids], axis=0
        )[None]

    # interior clip: center chunk 2 -> window (1, 2, 3)
    ref = detect_clip(variables, clip_window([1, 2, 3]), props, mask, CFG, model)
    for k in ("tubes", "tube_scores", "frame_scores"):
        np.testing.assert_allclose(
            np.asarray(results[2][k]), np.asarray(ref[k]), rtol=1e-4, atol=1e-4
        )

    # edge clip: center chunk 0 clamps to window (0, 0, 1)
    ref0 = detect_clip(variables, clip_window([0, 0, 1]), props, mask, CFG, model)
    np.testing.assert_allclose(
        np.asarray(results[0]["tube_scores"]), np.asarray(ref0["tube_scores"]),
        rtol=1e-4, atol=1e-4,
    )


def test_stream_requires_chunk_stem():
    model, variables, frames = _setup()
    import pytest

    with pytest.raises(ValueError):
        detect_video_stream(variables, frames, CFG.replace(chunk_stem=False),
                            model)


def test_stream_batched_matches_per_clip():
    model, variables, frames = _setup()
    c = CFG.frames_per_chunk
    from step_tpu.inference import detect_video_stream_batched

    out = detect_video_stream_batched(variables, frames, CFG, model,
                                      clip_batch=2)
    assert out["tubes"].shape[0] == 5
    props, mask = STEPDetector.initial_proposals(CFG, 1)
    win = jnp.concatenate([frames[i * c : (i + 1) * c] for i in (2, 3, 4)],
                          axis=0)[None]
    ref = detect_clip(variables, win, props, mask, CFG, model)
    np.testing.assert_allclose(np.asarray(out["tube_scores"][3:4]),
                               np.asarray(ref["tube_scores"]),
                               rtol=1e-4, atol=1e-4)
    # last center clamps (3, 4, 4)
    win_last = jnp.concatenate([frames[i * c : (i + 1) * c] for i in (3, 4, 4)],
                               axis=0)[None]
    ref_last = detect_clip(variables, win_last, props, mask, CFG, model)
    np.testing.assert_allclose(np.asarray(out["tube_scores"][4:5]),
                               np.asarray(ref_last["tube_scores"]),
                               rtol=1e-4, atol=1e-4)
