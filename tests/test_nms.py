"""NMS parity vs. a numpy greedy oracle, plus linking behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from step_tpu.ops.nms import nms, batched_nms
from step_tpu.tubes.linking import link_tubes, link_tubes_multiclass


def np_greedy_nms(boxes, scores, thresh):
    """Classic greedy NMS keep-list oracle."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area_i + areas - inter, 1e-8)
        suppressed |= iou > thresh
    return keep


def test_nms_matches_oracle():
    rng = np.random.RandomState(0)
    N = 40
    centers = rng.rand(N, 2) * 200
    sizes = 20 + rng.rand(N, 2) * 60
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(np.float32)
    scores = rng.rand(N).astype(np.float32)
    for thresh in (0.3, 0.5, 0.7):
        want = np_greedy_nms(boxes, scores, thresh)
        keep_idx, keep_mask = nms(jnp.asarray(boxes), jnp.asarray(scores), thresh, max_keep=N)
        got = [int(i) for i, m in zip(np.asarray(keep_idx), np.asarray(keep_mask)) if m > 0]
        assert got == want, f"thresh={thresh}: {got} != {want}"


def test_nms_score_threshold_and_valid_mask():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [100, 100, 110, 110], [200, 200, 210, 210]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.04, 0.8], jnp.float32)
    valid = jnp.asarray([1.0, 1.0, 0.0])
    keep_idx, keep_mask = nms(boxes, scores, 0.5, max_keep=3,
                              score_threshold=0.05, valid=valid)
    got = [int(i) for i, m in zip(np.asarray(keep_idx), np.asarray(keep_mask)) if m > 0]
    assert got == [0]  # box1 below score thresh, box2 masked invalid


def test_batched_nms_per_class():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32)
    class_scores = jnp.asarray(
        [[0.9, 0.1], [0.8, 0.95], [0.3, 0.4]], jnp.float32
    )
    keep_idx, keep_mask = batched_nms(boxes, class_scores, 0.5, max_keep=3)
    assert keep_idx.shape == (2, 3)
    # class 0: box0 wins, box1 suppressed (IoU>0.5), box2 kept
    got0 = [int(i) for i, m in zip(np.asarray(keep_idx[0]), np.asarray(keep_mask[0])) if m > 0]
    assert got0 == [0, 2]
    # class 1: box1 wins, box0 suppressed, box2 kept
    got1 = [int(i) for i, m in zip(np.asarray(keep_idx[1]), np.asarray(keep_mask[1])) if m > 0]
    assert got1 == [1, 2]


def _tube(box, T=4):
    return np.broadcast_to(np.asarray(box, np.float32), (T, 4)).copy()


def test_link_tubes_prefers_continuity():
    # 3 clips, 2 tubes each. Tube 0 is spatially continuous across clips;
    # tube 1 teleports. Scores are equal, so IoU continuity must decide.
    L, P, T = 3, 2, 4
    tubes = np.zeros((L, P, T, 4), np.float32)
    for l in range(L):
        tubes[l, 0] = _tube([10, 10, 50, 50], T)
        tubes[l, 1] = _tube([200 * ((l % 2) + 0.1), 10, 200 * ((l % 2) + 0.1) + 40, 50], T)
    scores = np.full((L, P), 0.5, np.float32)
    path, value = link_tubes(jnp.asarray(tubes), jnp.asarray(scores))
    np.testing.assert_array_equal(np.asarray(path), [0, 0, 0])


def test_link_tubes_prefers_high_scores():
    L, P, T = 4, 3, 2
    rng = np.random.RandomState(0)
    tubes = np.broadcast_to(
        np.asarray([10, 10, 50, 50], np.float32), (L, P, T, 4)
    ).copy()  # all tubes identical → IoU ties; score decides
    scores = rng.rand(L, P).astype(np.float32)
    path, value = link_tubes(jnp.asarray(tubes), jnp.asarray(scores))
    np.testing.assert_array_equal(np.asarray(path), scores.argmax(1))


def test_link_tubes_multiclass_shapes():
    L, P, T, C = 3, 4, 2, 5
    rng = np.random.RandomState(1)
    tubes = rng.rand(L, P, T, 4).astype(np.float32) * 100
    tubes[..., 2:] += tubes[..., :2]
    cls_scores = rng.rand(L, P, C).astype(np.float32)
    paths, values = link_tubes_multiclass(jnp.asarray(tubes), jnp.asarray(cls_scores))
    assert paths.shape == (C, L)
    assert values.shape == (C,)


def test_nms_pallas_bitexact_vs_scan():
    """Pallas batched NMS (interpret mode on CPU) is bit-identical to the
    lax.scan version across clusters, padding, sub-threshold scores, ties,
    and zero-area boxes."""
    from step_tpu.ops.nms_pallas import nms_many

    rng = np.random.RandomState(0)
    N, P = 300, 16
    boxes = rng.rand(N, P, 4).astype(np.float32) * 100
    boxes = np.concatenate(
        [boxes[..., :2], boxes[..., :2] + boxes[..., 2:] * 0.5], -1)
    boxes[:, 8:] = boxes[:, :8] + rng.randn(N, 8, 4).astype(np.float32) * 2
    scores = rng.rand(N, P).astype(np.float32)
    scores[:, 12:] = 0.0                      # below score threshold
    scores[5] = 0.5                           # exact ties -> lowest index
    valid = (rng.rand(N, P) > 0.2).astype(np.float32)
    boxes[::7, 3] = boxes[::7, 1]             # zero-area boxes

    ref_idx, ref_mask = jax.vmap(
        lambda b, s, v: nms(b, s, 0.5, 16, 0.05, v)
    )(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    out_idx, out_mask = nms_many(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 16, 0.05,
        jnp.asarray(valid), interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(out_idx))
    np.testing.assert_array_equal(np.asarray(ref_mask), np.asarray(out_mask))


def test_nms_surface_pallas_matches_scan():
    from step_tpu.config import StepConfig
    from step_tpu.inference import nms_surface

    cfg = StepConfig(
        dataset="synthetic", num_classes=4, frames_per_chunk=2, num_chunks=3,
        num_steps=2, iou_thresholds=(0.4, 0.5), step_loss_weights=(1.0, 1.0),
        image_size=32, backbone_depth="tiny", feature_stride=8,
        max_proposals=12, max_detections=4, compute_dtype="float32")
    rng = np.random.RandomState(0)
    B, P, T = 3, 12, 6
    tubes = jnp.asarray(rng.rand(B, P, T, 4) * 30)
    tubes = jnp.concatenate(
        [tubes[..., :2], tubes[..., :2] + 2 + tubes[..., 2:]], -1)
    scores = jnp.asarray(rng.rand(B, P, 4), jnp.float32)
    mask = jnp.asarray((rng.rand(B, P) > 0.2).astype(np.float32))
    scores = scores * mask[..., None]
    a = nms_surface(tubes, scores, mask, cfg)
    b = nms_surface(tubes, scores, mask, cfg.replace(nms_impl="pallas"))
    for k in ("frame_boxes", "frame_scores", "frame_mask"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
