import jax.numpy as jnp
import numpy as np

from step_tpu.tubes.boxes import (
    box_area,
    pairwise_iou,
    elementwise_iou,
    encode_boxes,
    decode_boxes,
    clip_boxes,
)


def test_box_area():
    boxes = jnp.array([[0, 0, 10, 5], [3, 3, 3, 8], [5, 5, 1, 1]], jnp.float32)
    np.testing.assert_allclose(box_area(boxes), [50.0, 0.0, 0.0])


def test_pairwise_iou_known_values():
    a = jnp.array([[0, 0, 10, 10]], jnp.float32)
    b = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
    iou = pairwise_iou(a, b)
    np.testing.assert_allclose(iou, [[1.0, 25.0 / 175.0, 0.0]], rtol=1e-6)


def test_pairwise_iou_batched():
    rng = np.random.RandomState(0)
    a = rng.rand(2, 5, 4).astype(np.float32) * 50
    a[..., 2:] += a[..., :2]  # make x2>x1, y2>y1
    b = rng.rand(2, 7, 4).astype(np.float32) * 50
    b[..., 2:] += b[..., :2]
    out = pairwise_iou(jnp.asarray(a), jnp.asarray(b))
    assert out.shape == (2, 5, 7)
    # cross-check one entry elementwise
    e = elementwise_iou(jnp.asarray(a[0, 2]), jnp.asarray(b[0, 3]))
    np.testing.assert_allclose(out[0, 2, 3], e, rtol=1e-6)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(1)
    anchors = rng.rand(20, 4).astype(np.float32) * 100
    anchors[:, 2:] = anchors[:, :2] + 5 + rng.rand(20, 2).astype(np.float32) * 50
    boxes = anchors + rng.randn(20, 4).astype(np.float32) * 3
    boxes[:, 2:] = np.maximum(boxes[:, 2:], boxes[:, :2] + 2)
    deltas = encode_boxes(jnp.asarray(boxes), jnp.asarray(anchors))
    rec = decode_boxes(deltas, jnp.asarray(anchors))
    np.testing.assert_allclose(rec, boxes, rtol=1e-3, atol=1e-2)


def test_decode_zero_deltas_identity():
    anchors = jnp.array([[10, 20, 50, 80]], jnp.float32)
    rec = decode_boxes(jnp.zeros((1, 4)), anchors)
    np.testing.assert_allclose(rec, anchors, rtol=1e-5, atol=1e-4)


def test_decode_clamps_explosion():
    anchors = jnp.array([[10, 10, 20, 20]], jnp.float32)
    deltas = jnp.array([[0.0, 0.0, 1e4, 1e4]], jnp.float32)
    rec = decode_boxes(deltas, anchors)
    assert np.all(np.isfinite(np.asarray(rec)))
    assert float(rec[0, 2] - rec[0, 0]) < 1e4


def test_clip_boxes():
    boxes = jnp.array([[-5, -5, 300, 120], [10, 10, 20, 20]], jnp.float32)
    out = clip_boxes(boxes, height=100, width=200)
    np.testing.assert_allclose(out, [[0, 0, 200, 100], [10, 10, 20, 20]])
