"""Two-stream late score fusion (reference test-time protocol)."""

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.config import StepConfig
from step_tpu.data.synthetic import SyntheticConfig, make_batch, make_flow
from step_tpu.eval.detection_metrics import frame_map
from step_tpu.inference import detect_clip, detect_clip_late_fusion
from step_tpu.models.detector import STEPDetector

CFG = StepConfig(
    dataset="synthetic",
    num_classes=3,
    frames_per_chunk=2,
    num_chunks=1,
    num_steps=1,
    iou_thresholds=(0.4,),
    step_loss_weights=(1.0,),
    temporal_extension=False,
    image_size=32,
    backbone_depth="tiny",
    feature_stride=8,
    pooled_size=4,
    max_proposals=12,
    max_detections=4,
    compute_dtype="float32",
    batch_size=2,
    two_stream_fusion="late",
)


def _streams(batch_size=2):
    syn = SyntheticConfig(image_size=32, num_frames=CFG.total_frames,
                          num_classes=3, max_boxes=2)
    raw = make_batch(0, batch_size, syn)
    rgb = jnp.asarray(raw["rgb"])
    flow = jnp.asarray(np.stack([make_flow(c) for c in raw["rgb"]]))
    return rgb, flow


def test_flow_input_detector_runs():
    cfg = CFG.replace(input_stream="flow")
    model = STEPDetector(cfg)
    _, flow = _streams()
    props, mask = STEPDetector.initial_proposals(cfg, 2)
    variables = model.init(jax.random.PRNGKey(0), flow, props)
    out = detect_clip(variables, flow, props, mask, cfg, model)
    assert out["tube_scores"].shape == (2, cfg.max_proposals, 3)
    assert np.isfinite(np.asarray(out["tube_scores"])).all()


def test_late_fusion_is_weighted_average_on_rgb_boxes():
    cfg = CFG.replace(late_fusion_weight=0.7)
    cfg_rgb = cfg.replace(input_stream="rgb")
    cfg_flow = cfg.replace(input_stream="flow")
    m_rgb, m_flow = STEPDetector(cfg_rgb), STEPDetector(cfg_flow)
    rgb, flow = _streams()
    props, mask = STEPDetector.initial_proposals(cfg, 2)
    v_rgb = m_rgb.init(jax.random.PRNGKey(1), rgb, props)
    v_flow = m_flow.init(jax.random.PRNGKey(2), flow, props)

    single_rgb = detect_clip(v_rgb, rgb, props, mask, cfg_rgb, m_rgb)
    single_flow = detect_clip(v_flow, flow, props, mask, cfg_flow, m_flow)
    fused = detect_clip_late_fusion(v_rgb, v_flow, rgb, flow, props, mask,
                                    cfg, m_rgb, m_flow)

    want = 0.7 * single_rgb["tube_scores"] + 0.3 * single_flow["tube_scores"]
    np.testing.assert_allclose(np.asarray(fused["tube_scores"]),
                               np.asarray(want), rtol=1e-5, atol=1e-6)
    # boxes come from the appearance stream
    np.testing.assert_allclose(np.asarray(fused["tubes"]),
                               np.asarray(single_rgb["tubes"]))
    # padded proposal slots stay zero
    np.testing.assert_array_equal(
        np.asarray(fused["tube_scores"])[:, int(mask[0].sum()):], 0.0
    )


def test_fused_scores_beat_either_stream_on_oracle():
    """Score averaging under independent per-stream noise must raise
    frame-mAP above both single streams (the protocol's whole point).
    Deterministic: fixed seeds, fixed margin."""
    rng = np.random.RandomState(0)
    C, N = 4, 300
    gt, det_a, det_b, det_f = [], [], [], []
    for i in range(N):
        key = ("v", i)
        cls = i % C
        box = np.asarray([10.0, 10.0, 30.0, 30.0])
        gt.append((key, cls, box))
        for c in range(C):
            true = 0.9 if c == cls else 0.1
            sa = np.clip(true + rng.randn() * 0.35, 0, 1)
            sb = np.clip(true + rng.randn() * 0.35, 0, 1)
            det_a.append((key, c, float(sa), box))
            det_b.append((key, c, float(sb), box))
            det_f.append((key, c, float(0.5 * (sa + sb)), box))
    map_a = frame_map(det_a, gt, C)["mAP"]
    map_b = frame_map(det_b, gt, C)["mAP"]
    map_f = frame_map(det_f, gt, C)["mAP"]
    assert map_f > max(map_a, map_b) + 0.01
