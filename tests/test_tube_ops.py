import jax.numpy as jnp
import numpy as np

from step_tpu.tubes.tube_ops import (
    tube_iou,
    valid_tube_mask,
    chunk_frame_mask,
    extrapolate_tubes,
)
from step_tpu.tubes.proposals import initial_cuboids


def _static_tube(box, T):
    return np.broadcast_to(np.asarray(box, np.float32), (T, 4)).copy()


def test_tube_iou_identity_and_disjoint():
    T = 6
    a = jnp.asarray(_static_tube([0, 0, 10, 10], T))[None]
    b = jnp.stack(
        [
            jnp.asarray(_static_tube([0, 0, 10, 10], T)),
            jnp.asarray(_static_tube([50, 50, 60, 60], T)),
        ]
    )
    iou = tube_iou(a, b)
    np.testing.assert_allclose(iou, [[1.0, 0.0]], atol=1e-6)


def test_tube_iou_frame_mask_excludes_frames():
    T = 6
    # Tube B matches A on the first 3 frames, disjoint on the last 3.
    a = _static_tube([0, 0, 10, 10], T)
    b = a.copy()
    b[3:] = [100, 100, 110, 110]
    iou_all = tube_iou(jnp.asarray(a)[None], jnp.asarray(b)[None])
    mask = jnp.asarray([1, 1, 1, 0, 0, 0], jnp.float32)
    iou_masked = tube_iou(jnp.asarray(a)[None], jnp.asarray(b)[None], mask)
    np.testing.assert_allclose(iou_all, [[0.5]], atol=1e-6)
    np.testing.assert_allclose(iou_masked, [[1.0]], atol=1e-6)


def test_tube_iou_batched_frame_mask():
    """A batched [B, T] frame_mask must broadcast against the [B, P, G]
    result — per-sample it must equal the per-[T]-mask call (the old form
    misaligned the batch dims against P/G)."""
    rng = np.random.RandomState(0)
    B, P, G, T = 3, 4, 2, 6
    a = rng.rand(B, P, T, 4).astype(np.float32) * 50
    a[..., 2:] += a[..., :2] + 5
    b = rng.rand(B, G, T, 4).astype(np.float32) * 50
    b[..., 2:] += b[..., :2] + 5
    masks = (rng.rand(B, T) > 0.4).astype(np.float32)
    masks[0] = 1.0                       # one all-ones row as a control
    batched = np.asarray(tube_iou(jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(masks)))
    assert batched.shape == (B, P, G)
    for i in range(B):
        per = np.asarray(tube_iou(jnp.asarray(a[i]), jnp.asarray(b[i]),
                                  jnp.asarray(masks[i])))
        np.testing.assert_allclose(batched[i], per, atol=1e-6)


def test_valid_tube_mask():
    T = 4
    good = _static_tube([0, 0, 10, 10], T)
    bad = _static_tube([5, 5, 5, 5], T)
    mask = valid_tube_mask(jnp.stack([jnp.asarray(good), jnp.asarray(bad)]))
    np.testing.assert_array_equal(np.asarray(mask), [True, False])


def test_chunk_frame_mask_progression():
    # 3 chunks x 2 frames; step 0 → central chunk only, step 1+ → all.
    m0 = chunk_frame_mask(0, num_chunks=3, frames_per_chunk=2)
    m1 = chunk_frame_mask(1, num_chunks=3, frames_per_chunk=2)
    m2 = chunk_frame_mask(2, num_chunks=3, frames_per_chunk=2)
    np.testing.assert_allclose(m0, [0, 0, 1, 1, 0, 0])
    np.testing.assert_allclose(m1, [1, 1, 1, 1, 1, 1])
    np.testing.assert_allclose(m2, [1, 1, 1, 1, 1, 1])
    m_noext = chunk_frame_mask(2, num_chunks=3, frames_per_chunk=2, extend=False)
    np.testing.assert_allclose(m_noext, [0, 0, 1, 1, 0, 0])


def test_extrapolate_linear_motion_exact():
    # A box moving with constant velocity: extrapolation must recover it.
    T = 9
    t = np.arange(T, dtype=np.float32)
    full = np.stack([10 + 2 * t, 20 + 1 * t, 30 + 2 * t, 40 + 1 * t], -1)  # [T,4]
    known = np.zeros(T, np.float32)
    known[3:6] = 1.0  # only central chunk known
    tubes = full.copy()
    tubes[known == 0] = 0.0  # unknown frames hold garbage
    out = extrapolate_tubes(jnp.asarray(tubes), jnp.asarray(known))
    np.testing.assert_allclose(np.asarray(out), full, rtol=1e-4, atol=1e-3)


def test_extrapolate_keeps_known_frames():
    T = 6
    rng = np.random.RandomState(0)
    tubes = rng.rand(3, T, 4).astype(np.float32) * 50
    known = np.asarray([0, 1, 1, 1, 1, 0], np.float32)
    out = np.asarray(extrapolate_tubes(jnp.asarray(tubes), jnp.asarray(known)))
    np.testing.assert_allclose(out[:, 1:5], tubes[:, 1:5], atol=1e-5)


def test_extrapolate_static_tube_stays_static():
    T = 6
    tube = _static_tube([10, 10, 50, 50], T)[None]
    known = np.asarray([0, 0, 1, 1, 0, 0], np.float32)
    out = np.asarray(extrapolate_tubes(jnp.asarray(tube), jnp.asarray(known)))
    np.testing.assert_allclose(out[0], tube[0], atol=1e-3)


def test_extrapolate_clips_to_image():
    T = 6
    t = np.arange(T, dtype=np.float32)
    tube = np.stack([10 + 30 * t, 10 + 30 * t, 20 + 30 * t, 20 + 30 * t], -1)[None]
    known = np.asarray([0, 0, 1, 1, 0, 0], np.float32)
    out = np.asarray(
        extrapolate_tubes(jnp.asarray(tube), jnp.asarray(known), image_size=120.0)
    )
    unknown = out[0][known == 0]
    assert unknown.max() <= 120.0 and unknown.min() >= 0.0
    # known frames untouched even if they spill past the clip rectangle
    np.testing.assert_allclose(out[0][known == 1], tube[0][known == 1])


def test_initial_cuboids():
    tubes, mask = initial_cuboids(image_size=224, num_frames=6, max_proposals=16)
    assert tubes.shape == (16, 6, 4)
    assert float(mask.sum()) == 11.0
    t = np.asarray(tubes)
    # constant across time
    np.testing.assert_allclose(t[:, 0], t[:, 3])
    # first proposal is the full frame
    np.testing.assert_allclose(t[0, 0], [0, 0, 224, 224])
    # all inside the image
    assert t.min() >= 0 and t.max() <= 224


def test_initial_cuboids_np_matches_and_is_host_side():
    """The memoized numpy variant (used by the host data pipeline to avoid
    per-batch device round-trips) matches the jnp version exactly and is
    read-only (it's cached — aliasing writes would corrupt later batches)."""
    import numpy as np

    from step_tpu.tubes.proposals import initial_cuboids_np

    tubes_np, mask_np = initial_cuboids_np(224, 6, 16)
    assert isinstance(tubes_np, np.ndarray) and isinstance(mask_np, np.ndarray)
    assert not tubes_np.flags.writeable and not mask_np.flags.writeable
    tubes_j, mask_j = initial_cuboids(image_size=224, num_frames=6,
                                      max_proposals=16)
    np.testing.assert_array_equal(tubes_np, np.asarray(tubes_j))
    np.testing.assert_array_equal(mask_np, np.asarray(mask_j))
    # memoized: same object back
    assert initial_cuboids_np(224, 6, 16)[0] is tubes_np


def test_encode_degenerate_anchor_bounded():
    """A zero-extent anchor (border-clipped proposal) must produce bounded
    regression targets (1 px clamp), not 1/EPS-scale explosions."""
    from step_tpu.tubes.boxes import decode_boxes, encode_boxes

    target = jnp.asarray([10.0, 10.0, 40.0, 40.0])
    degenerate = jnp.asarray([224.0, 100.0, 224.0, 100.0])  # clipped to edge
    d = np.asarray(encode_boxes(target, degenerate))
    assert np.isfinite(d).all()
    assert np.abs(d).max() < 1e4  # was ~1e10 with the EPS-clamped width
    # round trip still holds for healthy anchors
    anchor = jnp.asarray([8.0, 12.0, 50.0, 45.0])
    rt = decode_boxes(encode_boxes(target, anchor), anchor)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(target), atol=1e-4)
