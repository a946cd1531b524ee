"""Golden regression + config-path coverage (two-stream, AVA multilabel).

The golden numbers pin the full detector forward (init seed 42, synthetic
clip seed 7) on CPU. They catch silent numerics drift in the backbone /
pooling / refinement stack; tolerances absorb XLA version-level float
reassociation, not semantic changes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from step_tpu.config import StepConfig
from step_tpu.data.pipeline import build_model_batch
from step_tpu.data.synthetic import SyntheticConfig, make_clip, make_batch
from step_tpu.inference import detect_clip
from step_tpu.models.detector import STEPDetector
from step_tpu.train.losses import step_losses
from step_tpu.utils.init import init_detector_cpu

CFG = StepConfig(
    dataset="synthetic", num_classes=4, frames_per_chunk=2, num_chunks=3,
    num_steps=2, iou_thresholds=(0.4, 0.5), step_loss_weights=(1.0, 1.0),
    temporal_extension=True, image_size=32, backbone_depth="tiny",
    feature_stride=8, pooled_size=4, max_proposals=12, max_detections=4,
    compute_dtype="float32", batch_size=1,
    # goldens pin the padded slots' head outputs too — keep the
    # pre-compaction program (head_compact parity is tested separately
    # in tests/test_optimize.py)
    head_compact=False,
)
SYN = SyntheticConfig(image_size=32, num_frames=CFG.total_frames,
                      num_classes=4, max_boxes=2)


@pytest.fixture(scope="module")
def golden_setup():
    model = STEPDetector(CFG)
    variables = init_detector_cpu(CFG, jax.random.PRNGKey(42), model)
    clip = make_clip(7, SYN)
    b = build_model_batch({k: v[None] for k, v in clip.items()}, CFG, train=False)
    return model, variables, b


def test_golden_forward(golden_setup):
    model, variables, b = golden_setup
    out = model.apply(variables, jnp.asarray(b["rgb"]), jnp.asarray(b["proposals"]))
    assert float(jnp.sum(out["cls_logits"])) == pytest.approx(-21.708271, rel=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["cls_logits"])[0, 0, 0, :3],
        [-0.31657189, -0.15668651, -0.08142370],
        rtol=2e-3, atol=1e-4,
    )
    assert float(jnp.mean(out["tubes"])) == pytest.approx(16.003656, rel=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["tubes"])[-1, 0, 0, 0],
        [0.02336788, 0.01064873, 32.0, 32.0],
        rtol=2e-3, atol=2e-2,
    )


def test_golden_detection(golden_setup):
    model, variables, b = golden_setup
    det = detect_clip(
        variables, jnp.asarray(b["rgb"]), jnp.asarray(b["proposals"]),
        jnp.asarray(b["prop_mask"]), CFG, model,
    )
    # padding slots (11 real of 12) zeroed at the surface
    assert float(jnp.sum(det["tube_scores"])) == pytest.approx(8.505507, rel=2e-3)
    assert float(jnp.max(det["frame_scores"])) == pytest.approx(0.257278, rel=2e-3)


def test_two_stream_end_to_end():
    cfg = CFG.replace(two_stream=True)
    model = STEPDetector(cfg)
    B, T = 1, cfg.total_frames
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(B, T, 32, 32, 3), jnp.float32)
    flow = jnp.asarray(rng.rand(B, T, 32, 32, 2) * 2 - 1, jnp.float32)
    props, _ = STEPDetector.initial_proposals(cfg, B)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), rgb, props, flow)
    out = model.apply(variables, rgb, props, flow)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()
    # flow stream params exist and flow input changes the output
    assert "stem_flow" in variables["params"]["features"]
    out2 = model.apply(variables, rgb, props, jnp.zeros_like(flow))
    assert not np.allclose(np.asarray(out["cls_logits"]), np.asarray(out2["cls_logits"]))
    # missing flow raises
    with pytest.raises(ValueError):
        model.apply(variables, rgb, props)


def test_ava_multilabel_end_to_end():
    cfg = CFG.replace(dataset="ava", num_classes=6, multilabel=True)
    model = STEPDetector(cfg)
    raw = make_batch(0, 2, SyntheticConfig(image_size=32, num_frames=cfg.total_frames,
                                           num_classes=6, max_boxes=2))
    b = build_model_batch(raw, cfg, train=True, seed=0)
    assert b["gt_labels"].shape == (2, cfg.max_gt_tubes, 6)  # multi-hot
    rgb = jnp.asarray(b["rgb"])
    props = jnp.asarray(b["proposals"])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), rgb, props)
    # sigmoid head: ncls == C (no background column)
    out = model.apply(variables, rgb, props)
    assert out["cls_logits"].shape[-1] == 6
    loss, metrics = step_losses(
        out, jnp.asarray(b["gt_tubes"]), jnp.asarray(b["gt_labels"]),
        jnp.asarray(b["gt_mask"]), jnp.asarray(b["prop_mask"]), cfg,
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    # inference path produces per-class sigmoid scores
    det = detect_clip(variables, rgb, props, jnp.asarray(b["prop_mask"]), cfg, model)
    s = np.asarray(det["tube_scores"])
    assert s.shape[-1] == 6 and (s >= 0).all() and (s <= 1).all()


def test_uint8_input_path(golden_setup):
    """uint8 rgb (cheap-transfer format) matches the float path closely."""
    model, variables, b = golden_setup
    rgb_f = jnp.asarray(b["rgb"])                      # [0,1] float32
    rgb_u8 = jnp.asarray(
        np.clip(np.asarray(rgb_f) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    )
    props = jnp.asarray(b["proposals"])
    out_f = model.apply(variables, rgb_f, props)
    out_u = model.apply(variables, rgb_u8, props)
    # quantization to 1/255 moves logits only slightly
    np.testing.assert_allclose(
        np.asarray(out_f["cls_logits"]), np.asarray(out_u["cls_logits"]),
        rtol=0.1, atol=0.05,
    )


def test_build_model_batch_uint8():
    from step_tpu.data.pipeline import build_model_batch

    raw = {
        "rgb": np.random.RandomState(0).rand(1, CFG.total_frames, 32, 32, 3).astype(np.float32),
        "gt_tubes": np.zeros((1, 2, CFG.total_frames, 4), np.float32),
        "gt_labels": np.zeros((1, 2), np.int32),
        "gt_mask": np.zeros((1, 2), np.float32),
    }
    b = build_model_batch(raw, CFG, emit_uint8=True)
    assert b["rgb"].dtype == np.uint8
    b2 = build_model_batch(raw, CFG)
    assert b2["rgb"].dtype == np.float32
    assert b2["rgb"].max() <= 1.0  # un-normalized [0,1]
