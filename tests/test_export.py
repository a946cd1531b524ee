"""AOT export (utils/export.py): serialize → deserialize → run parity."""

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import StepConfig
from step_tpu.inference import detect_clip
from step_tpu.models.detector import STEPDetector
from step_tpu.utils.export import export_detect_fn, load_detect_fn


def _cfg():
    return StepConfig(
        dataset="synthetic", num_classes=3, frames_per_chunk=2, num_chunks=1,
        num_steps=1, iou_thresholds=(0.4,), step_loss_weights=(1.0,),
        temporal_extension=False, image_size=32, backbone_depth="tiny",
        feature_stride=8, pooled_size=4, max_proposals=12, max_gt_tubes=2,
        compute_dtype="float32", batch_size=2, dropout_rate=0.0,
    )


def test_export_roundtrip_matches_jit():
    """Default export carries the uint8 wire spec (cfg.uint8_transfer);
    feeding the SAME wire array to the live jit must match exactly."""
    from step_tpu.data.pipeline import rgb_to_uint8_wire

    cfg = _cfg()
    assert cfg.uint8_transfer  # the default wire format under test
    model = STEPDetector(cfg)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rgb_to_uint8_wire(
        rng.rand(2, cfg.total_frames, cfg.image_size, cfg.image_size, 3)))
    assert rgb.dtype == jnp.uint8
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, 2)
    variables = model.init(jax.random.PRNGKey(0), rgb[:1], proposals[:1],
                           prop_mask[:1])

    blob = export_detect_fn(cfg, batch_size=2, model=model)
    assert isinstance(blob, bytes) and len(blob) > 1000

    run = load_detect_fn(blob)
    out = run(variables, rgb, proposals, prop_mask)
    want = jax.jit(lambda v, r, p, m: detect_clip(v, r, p, m, cfg, model))(
        variables, rgb, proposals, prop_mask)
    assert set(out) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_export_float32_wire_optout():
    """uint8_transfer=False exports a float32-input program."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(), uint8_transfer=False)
    model = STEPDetector(cfg)
    rng = np.random.RandomState(4)
    rgb = jnp.asarray(rng.rand(1, cfg.total_frames, cfg.image_size,
                               cfg.image_size, 3), jnp.float32)
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, 1)
    variables = model.init(jax.random.PRNGKey(5), rgb, proposals, prop_mask)
    run = load_detect_fn(export_detect_fn(cfg, batch_size=1, model=model))
    out = run(variables, rgb, proposals, prop_mask)
    assert np.isfinite(np.asarray(out["tube_scores"])).all()


def test_export_variables_structure_from_eval_shape():
    """Exporting without concrete variables (shape-only init) produces a
    program callable with real params."""
    cfg = _cfg()
    model = STEPDetector(cfg)
    blob = export_detect_fn(cfg, batch_size=1)     # no variables passed
    run = load_detect_fn(blob)
    rgb = jnp.zeros((1, cfg.total_frames, cfg.image_size, cfg.image_size, 3),
                    jnp.uint8)  # default wire spec
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, 1)
    variables = model.init(jax.random.PRNGKey(1), rgb, proposals, prop_mask)
    out = run(variables, rgb, proposals, prop_mask)
    assert np.isfinite(np.asarray(out["tube_scores"])).all()


def test_export_optimized_program_roundtrip():
    """export.py --optimized path: the BN-folded + fused-Inception program
    exports, loads, and reproduces the standard detect surface when fed
    optimize_for_inference'd variables."""
    from step_tpu.data.pipeline import rgb_to_uint8_wire
    from step_tpu.models.optimize import optimize_for_inference

    cfg = _cfg()
    model = STEPDetector(cfg)
    rng = np.random.RandomState(2)
    # same uint8 wire array into the live-jit reference and the exported
    # program, so the only delta under test is the optimization fold
    rgb = jnp.asarray(rgb_to_uint8_wire(
        rng.rand(1, cfg.total_frames, cfg.image_size, cfg.image_size, 3)))
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, 1)
    variables = model.init(jax.random.PRNGKey(3), rgb, proposals)

    want = jax.jit(lambda v, r, p, m: detect_clip(v, r, p, m, cfg, model))(
        variables, rgb, proposals, prop_mask)

    cfg_opt, vars_opt = optimize_for_inference(cfg, variables)
    blob = export_detect_fn(cfg_opt, batch_size=1)
    run = load_detect_fn(blob)
    out = run(vars_opt, rgb, proposals, prop_mask)
    np.testing.assert_allclose(np.asarray(out["frame_scores"]),
                               np.asarray(want["frame_scores"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["tubes"]),
                               np.asarray(want["tubes"]),
                               rtol=1e-4, atol=1e-3)
