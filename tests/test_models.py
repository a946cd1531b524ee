"""Shape/behavior tests for I3D and the progressive detector (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from step_tpu.config import StepConfig
from step_tpu.models.i3d import I3DStem, I3DTail, I3DClassifier
from step_tpu.models.detector import STEPDetector, feature_time_indices

TINY = StepConfig(
    dataset="synthetic",
    num_classes=4,
    frames_per_chunk=4,
    num_chunks=1,
    num_steps=2,
    iou_thresholds=(0.5, 0.6),
    step_loss_weights=(1.0, 1.0),
    temporal_extension=False,
    image_size=32,
    backbone_depth="tiny",
    feature_stride=8,
    pooled_size=4,
    max_proposals=12,
    compute_dtype="float32",
    batch_size=1,
)

TINY_EXT = TINY.replace(num_chunks=3, temporal_extension=True, num_steps=2)


def test_i3d_stem_shapes():
    m = I3DStem()
    x = jnp.zeros((1, 8, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    # temporal stride 4 (ceil), spatial stride 16, 832 channels
    assert out.shape == (1, 2, 4, 4, 832)


def test_i3d_tail_shapes():
    m = I3DTail(pool_5a=False)
    x = jnp.zeros((5, 2, 7, 7, 832))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (5, 2, 7, 7, 1024)


def test_i3d_classifier():
    m = I3DClassifier(num_classes=10)
    x = jnp.zeros((2, 8, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_feature_time_indices():
    np.testing.assert_array_equal(np.asarray(feature_time_indices(4, 4)), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(feature_time_indices(18, 5)), [1, 5, 9, 12, 16])


@pytest.fixture(scope="module")
def tiny_detector():
    cfg = TINY
    model = STEPDetector(cfg)
    B, T = 1, cfg.total_frames
    rgb = jnp.asarray(np.random.RandomState(0).rand(B, T, cfg.image_size, cfg.image_size, 3), jnp.float32)
    props, pmask = STEPDetector.initial_proposals(cfg, B)
    variables = model.init(jax.random.PRNGKey(0), rgb, props)
    return cfg, model, variables, rgb, props


def test_detector_output_shapes(tiny_detector):
    cfg, model, variables, rgb, props = tiny_detector
    out = model.apply(variables, rgb, props)
    S, B, P, T = cfg.num_steps, 1, cfg.max_proposals, cfg.total_frames
    assert out["cls_logits"].shape == (S, B, P, cfg.num_cls_outputs)
    assert out["deltas"].shape == (S, B, P, T, 4)
    assert out["tubes"].shape == (S, B, P, T, 4)
    assert out["proposals"].shape == (S, B, P, T, 4)
    for k in ("cls_logits", "deltas", "tubes"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_detector_per_step_params_differ(tiny_detector):
    cfg, model, variables, rgb, props = tiny_detector
    # scan stacks per-step head params along axis 0 and they must differ
    kernel = variables["params"]["steps"]["head"]["cls"]["kernel"]
    assert kernel.shape[0] == cfg.num_steps
    assert not np.allclose(np.asarray(kernel[0]), np.asarray(kernel[1]))


def test_detector_proposals_chain(tiny_detector):
    cfg, model, variables, rgb, props = tiny_detector
    out = model.apply(variables, rgb, props)
    # step s+1's proposals are step s's refined tubes
    np.testing.assert_allclose(
        np.asarray(out["proposals"][1]), np.asarray(out["tubes"][0]), rtol=1e-5
    )
    # step 0's proposals are the initial cuboids
    np.testing.assert_allclose(np.asarray(out["proposals"][0]), np.asarray(props))


def test_detector_tubes_inside_image(tiny_detector):
    cfg, model, variables, rgb, props = tiny_detector
    out = model.apply(variables, rgb, props)
    tubes = np.asarray(out["tubes"])
    assert tubes.min() >= 0.0 and tubes.max() <= cfg.image_size


def test_detector_temporal_extension_masks():
    cfg = TINY_EXT
    model = STEPDetector(cfg)
    B, T = 1, cfg.total_frames
    rgb = jnp.zeros((B, T, cfg.image_size, cfg.image_size, 3))
    props, _ = STEPDetector.initial_proposals(cfg, B)
    variables = model.init(jax.random.PRNGKey(0), rgb, props)
    out = model.apply(variables, rgb, props)
    fm = np.asarray(out["frame_mask"])  # [S, T]
    Tc = cfg.frames_per_chunk
    # step 0: central chunk only; step 1: all three chunks
    np.testing.assert_allclose(fm[0], [0] * Tc + [1] * Tc + [0] * Tc)
    np.testing.assert_allclose(fm[1], [1] * (3 * Tc))


def test_detector_train_mode_mutates_batch_stats(tiny_detector):
    cfg, model, variables, rgb, props = tiny_detector
    out, mutated = model.apply(
        variables,
        rgb,
        props,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    before = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
