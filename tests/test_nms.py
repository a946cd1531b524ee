"""NMS parity vs. a numpy greedy oracle, plus linking behavior."""

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
