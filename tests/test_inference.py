"""Inference pipeline: clip detection, streaming video detection, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from step_tpu.config import StepConfig
from step_tpu.inference import (
    class_scores_from_logits,
    detect_clip,
    detect_video,
)
from step_tpu.models.detector import STEPDetector
from step_tpu.train.trainer import create_train_state
from step_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from step_tpu.utils.init import init_detector_cpu

CFG = StepConfig(
    dataset="synthetic",
    num_classes=4,
    frames_per_chunk=2,
    num_chunks=3,
    num_steps=2,
    iou_thresholds=(0.4, 0.5),
    step_loss_weights=(1.0, 1.0),
    temporal_extension=True,
    image_size=32,
    backbone_depth="tiny",
    feature_stride=8,
    pooled_size=4,
    max_proposals=12,
    max_detections=8,
    compute_dtype="float32",
    batch_size=2,
)


@pytest.fixture(scope="module")
def det():
    model = STEPDetector(CFG)
    variables = init_detector_cpu(CFG, jax.random.PRNGKey(0), model)
    return model, variables


def test_class_scores_softmax_drops_background():
    logits = jnp.zeros((5, CFG.num_cls_outputs))
    scores = class_scores_from_logits(logits, CFG)
    assert scores.shape == (5, CFG.num_classes)
    np.testing.assert_allclose(np.asarray(scores), 1.0 / CFG.num_cls_outputs, rtol=1e-5)


def test_class_scores_sigmoid_multilabel():
    cfg = CFG.replace(multilabel=True)
    logits = jnp.zeros((5, cfg.num_cls_outputs))
    scores = class_scores_from_logits(logits, cfg)
    assert scores.shape == (5, cfg.num_classes)
    np.testing.assert_allclose(np.asarray(scores), 0.5)


def test_detect_clip_shapes(det):
    model, variables = det
    B, T, P = 2, CFG.total_frames, CFG.max_proposals
    rgb = jnp.asarray(np.random.RandomState(0).rand(B, T, 32, 32, 3), jnp.float32)
    props, pmask = STEPDetector.initial_proposals(CFG, B)
    out = detect_clip(variables, rgb, props, pmask, CFG, model)
    C, K = CFG.num_classes, CFG.max_detections
    assert out["tubes"].shape == (B, P, T, 4)
    assert out["tube_scores"].shape == (B, P, C)
    assert out["frame_boxes"].shape == (B, T, C, K, 4)
    assert out["frame_scores"].shape == (B, T, C, K)
    assert out["frame_mask"].shape == (B, T, C, K)
    s = np.asarray(out["tube_scores"])
    assert (s >= 0).all() and (s <= 1).all()
    # masked-out detections carry zero scores
    fs, fm = np.asarray(out["frame_scores"]), np.asarray(out["frame_mask"])
    assert (fs[fm == 0] == 0).all()


def test_detect_video_linking(det):
    model, variables = det
    L, T = 3, CFG.total_frames
    clips = jnp.asarray(np.random.RandomState(1).rand(L, T, 32, 32, 3), jnp.float32)
    out = detect_video(variables, clips, CFG, model)
    C, K = CFG.num_classes, CFG.link_tubes_per_class
    assert out["link_paths"].shape == (C, K, L)
    assert out["link_scores"].shape == (C, K)
    assert out["link_trim"].shape == (C, K, L)
    assert out["link_tube_scores"].shape == (C, K)
    paths = np.asarray(out["link_paths"])
    assert (paths >= 0).all() and (paths < CFG.max_proposals).all()
    # K paths of one class are node-disjoint per clip
    for c in range(C):
        for l in range(L):
            assert len(set(paths[c, :, l])) == K


def test_checkpoint_roundtrip(tmp_path):
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    state = state.replace(step=state.step + 7)
    ckpt_dir = os.path.join(str(tmp_path), "ckpt")
    saved_step = save_checkpoint(ckpt_dir, state, {"epoch": 2, "batch_index": 123},
                                 wait=True)
    assert saved_step == 7

    fresh = create_train_state(CFG, jax.random.PRNGKey(1))
    restored, data_iter = restore_checkpoint(ckpt_dir, fresh)
    assert int(restored.step) == 7
    assert data_iter == {"epoch": 2, "batch_index": 123}
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(os.path.join(str(tmp_path), "empty"), fresh)


def test_make_detect_fns_jit_wrappers(det):
    from step_tpu.inference import make_detect_fn, make_detect_video_fn
    from step_tpu.models.detector import STEPDetector as _D

    model, variables = det
    B, T = 1, CFG.total_frames
    rgb = jnp.asarray(np.random.RandomState(5).rand(B, T, 32, 32, 3), jnp.float32)
    props, pmask = _D.initial_proposals(CFG, B)
    detect = make_detect_fn(CFG, model)
    out = detect(variables, rgb, props, pmask)
    assert out["tubes"].shape == (B, CFG.max_proposals, T, 4)

    clips = jnp.asarray(np.random.RandomState(6).rand(2, T, 32, 32, 3), jnp.float32)
    detect_v = make_detect_video_fn(CFG, model)
    out_v = detect_v(variables, clips)
    assert out_v["link_paths"].shape == (
        CFG.num_classes, CFG.link_tubes_per_class, 2)
