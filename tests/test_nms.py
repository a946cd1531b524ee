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


def test_link_tubes_stride_aligned_transition():
    # Sliding windows (stride < T): frame d of clip 1 shows the same video
    # frame as frame d+stride of clip 0. A fast-moving actor's true
    # continuation has LOW last-vs-first IoU (the boxes are 2 video frames
    # apart here) while a static distractor parked on clip 0's last box has
    # IoU 1.0 — the legacy convention links the distractor; the aligned
    # convention (mean IoU over the window overlap) links the actor.
    L, P, T, stride = 2, 2, 4, 2

    def box(v):                      # actor box at video frame v
        x = 5.0 * v
        return [x, 0.0, x + 10.0, 10.0]

    tubes = np.zeros((L, P, T, 4), np.float32)
    for t in range(T):
        tubes[0, 0, t] = box(t)               # clip 0 covers video frames 0..3
        tubes[1, 0, t] = box(t + stride)      # clip 1 covers video frames 2..5
    tubes[0, 1, :] = [50, 50, 60, 60]         # clip-0 far-away distractor
    tubes[1, 1, :] = box(T - 1)               # clip-1 distractor = clip 0's last box
    scores = np.full((L, P), 0.5, np.float32)

    legacy, _ = link_tubes(jnp.asarray(tubes), jnp.asarray(scores))
    assert int(legacy[1]) == 1                # links the static distractor
    aligned, _ = link_tubes(jnp.asarray(tubes), jnp.asarray(scores),
                            stride=stride)
    np.testing.assert_array_equal(np.asarray(aligned), [0, 0])

    # stride >= T (non-overlapping tiling) falls back to last-vs-first
    fallback, _ = link_tubes(jnp.asarray(tubes), jnp.asarray(scores), stride=T)
    np.testing.assert_array_equal(np.asarray(fallback), np.asarray(legacy))

    # the k/multiclass production surface accepts stride and agrees
    from step_tpu.tubes.linking import link_tubes_multiclass_k

    out = link_tubes_multiclass_k(
        jnp.asarray(tubes), jnp.asarray(scores)[..., None], k=1,
        trim_thresh=0.05, stride=stride)
    np.testing.assert_array_equal(np.asarray(out["paths"][0, 0]), [0, 0])


def test_link_tubes_k_suppress_iou_finds_second_actor():
    # P proposals usually hold several refined near-copies of each actor.
    # Node-disjointness alone lets path 2 re-link actor A through its
    # duplicate slot (higher score than actor B); suppress_iou invalidates
    # overlapping same-clip nodes so path 2 finds the OTHER actor.
    from step_tpu.tubes.linking import link_tubes_k

    L, P, T = 2, 3, 4
    tubes = np.zeros((L, P, T, 4), np.float32)
    tubes[:, 0] = [10, 10, 30, 30]            # actor A
    tubes[:, 1] = [11, 11, 31, 31]            # near-duplicate of A
    tubes[:, 2] = [60, 60, 80, 80]            # actor B, far away
    scores = np.broadcast_to(
        np.asarray([0.9, 0.8, 0.5], np.float32), (L, P)).copy()

    plain = link_tubes_k(jnp.asarray(tubes), jnp.asarray(scores), k=2)
    np.testing.assert_array_equal(np.asarray(plain["paths"]),
                                  [[0, 0], [1, 1]])   # duplicate tube

    sup = link_tubes_k(jnp.asarray(tubes), jnp.asarray(scores), k=2,
                       suppress_iou=0.5)
    np.testing.assert_array_equal(np.asarray(sup["paths"]),
                                  [[0, 0], [2, 2]])   # second actor
    # suppressed-and-exhausted paths must not resurrect: k=3 third path has
    # no valid nodes left (slot 1 suppressed, 0/2 used) -> killed
    sup3 = link_tubes_k(jnp.asarray(tubes), jnp.asarray(scores), k=3,
                        suppress_iou=0.5)
    assert float(np.asarray(sup3["tube_scores"])[2]) == 0.0
    assert float(np.asarray(sup3["trim"])[2].sum()) == 0.0


def test_link_tubes_k_exhausted_clip_trims_not_kills():
    # A real second actor whose proposals in ONE clip all collapsed onto
    # actor A (so suppression exhausts that clip) must survive with the
    # collapsed clip trimmed out — not have its whole path killed — and
    # the re-used node of the exhausted clip must never be emitted.
    from step_tpu.tubes.linking import link_tubes_k

    L, P, T = 3, 2, 4
    tubes = np.zeros((L, P, T, 4), np.float32)
    tubes[:, 0] = [10, 10, 30, 30]            # actor A, all clips
    tubes[0, 1] = [60, 60, 80, 80]            # actor B, clip 0
    tubes[2, 1] = [60, 60, 80, 80]            # actor B, clip 2
    tubes[1, 1] = [11, 11, 31, 31]            # clip 1: slot 1 collapsed on A
    scores = np.asarray([[0.9, 0.6], [0.9, 0.55], [0.9, 0.6]], np.float32)

    out = link_tubes_k(jnp.asarray(tubes), jnp.asarray(scores), k=2,
                       suppress_iou=0.5)
    trim = np.asarray(out["trim"])
    ts = np.asarray(out["tube_scores"])
    assert ts[1] > 0.0                        # path 2 survives
    assert trim[1, 1] == 0.0                  # exhausted clip trimmed out
    assert trim[1].sum() >= 1.0               # at least one fresh clip kept
    # `values` is the trimmed-run objective, NOT the raw Viterbi
    # accumulator: the exhausted clip must not leak NEG (~-1e9) into the
    # exposed k-ranking (detect_video's link_scores) — the second actor's
    # value must stay positive and below the full-span first path's.
    vals = np.asarray(out["values"])
    assert vals[1] > 0.0
    assert vals[0] > vals[1]


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


def test_nms_surface_onehot_select_matches_gather(monkeypatch):
    """The production B=128 serving path selects NMS survivors with a
    one-hot einsum (surface >= ONEHOT_SELECT_MIN_SURFACE); CPU test shapes
    never reach that threshold, so force it and assert exact agreement
    with the take_along_axis branch."""
    import step_tpu.inference as inf
    from step_tpu.config import StepConfig

    cfg = StepConfig(
        dataset="synthetic", num_classes=4, frames_per_chunk=2, num_chunks=3,
        num_steps=2, iou_thresholds=(0.4, 0.5), step_loss_weights=(1.0, 1.0),
        image_size=32, backbone_depth="tiny", feature_stride=8,
        max_proposals=12, max_detections=4, compute_dtype="float32",
        nms_impl="pallas")
    rng = np.random.RandomState(1)
    B, P, T = 3, 12, 6
    tubes = jnp.asarray(rng.rand(B, P, T, 4) * 30)
    tubes = jnp.concatenate(
        [tubes[..., :2], tubes[..., :2] + 2 + tubes[..., 2:]], -1)
    scores = jnp.asarray(rng.rand(B, P, 4), jnp.float32)
    mask = jnp.asarray((rng.rand(B, P) > 0.2).astype(np.float32))
    scores = scores * mask[..., None]
    gather = inf.nms_surface(tubes, scores, mask, cfg)
    monkeypatch.setattr(inf, "ONEHOT_SELECT_MIN_SURFACE", 0)
    onehot = inf.nms_surface(tubes, scores, mask, cfg)
    for k in ("frame_boxes", "frame_scores", "frame_mask"):
        np.testing.assert_array_equal(np.asarray(gather[k]),
                                      np.asarray(onehot[k]))


# ---------------------------------------------------------------- K-tube linking

import pytest


def test_max_subarray_mask():
    from step_tpu.tubes.linking import max_subarray_mask

    mask, val = max_subarray_mask(jnp.asarray([-1.0, 2.0, 3.0, -1.0, 1.0, -5.0]))
    np.testing.assert_array_equal(np.asarray(mask), [0, 1, 1, 0, 0, 0])
    assert float(val) == pytest.approx(5.0)
    # all-negative: single largest element
    mask, val = max_subarray_mask(jnp.asarray([-3.0, -0.5, -2.0]))
    np.testing.assert_array_equal(np.asarray(mask), [0, 1, 0])
    assert float(val) == pytest.approx(-0.5)


def test_link_tubes_k_two_actors_with_termination():
    """Two same-class actors: actor A spans all clips, actor B exists only
    mid-video. k=2 must recover both, with B's tube trimmed to its run."""
    from step_tpu.tubes.linking import link_tubes_k

    L, P, T = 8, 5, 4
    rng = np.random.RandomState(0)
    tubes = rng.rand(L, P, T, 4).astype(np.float32) * 20
    tubes[..., 2:] += tubes[..., :2] + 60  # scattered background boxes
    scores = np.full((L, P), 0.01, np.float32)
    for l in range(L):
        # actor A: slot 0, moves right, always present
        tubes[l, 0] = _tube([10 + 5 * l, 10, 30 + 5 * l, 30], T)
        scores[l, 0] = 0.9
        # actor B: slot 1, moves down, present clips 2..4 only
        tubes[l, 1] = _tube([60, 10 + 5 * l, 80, 30 + 5 * l], T)
        scores[l, 1] = 0.8 if 2 <= l <= 4 else 0.02
    out = link_tubes_k(jnp.asarray(tubes), jnp.asarray(scores),
                       link_iou_weight=0.5, k=2, trim_thresh=0.1)
    paths = np.asarray(out["paths"])          # [2, L]
    trim = np.asarray(out["trim"])
    np.testing.assert_array_equal(paths[0], np.zeros(L))
    np.testing.assert_array_equal(trim[0], np.ones(L))
    np.testing.assert_array_equal(paths[1][2:5], [1, 1, 1])
    np.testing.assert_array_equal(trim[1], [0, 0, 1, 1, 1, 0, 0, 0])
    assert float(out["tube_scores"][0]) == pytest.approx(0.9, abs=1e-5)
    assert float(out["tube_scores"][1]) == pytest.approx(0.8, abs=1e-5)


def test_link_tubes_k_node_disjoint():
    from step_tpu.tubes.linking import link_tubes_k

    L, P = 4, 6
    rng = np.random.RandomState(3)
    tubes = rng.rand(L, P, 2, 4).astype(np.float32) * 50
    tubes[..., 2:] += tubes[..., :2] + 5
    scores = rng.rand(L, P).astype(np.float32)
    out = link_tubes_k(jnp.asarray(tubes), jnp.asarray(scores), k=3)
    paths = np.asarray(out["paths"])
    for l in range(L):
        assert len(set(paths[:, l])) == 3


def test_link_tubes_k_clip_mask_padding_invariance():
    """Length-bucketed padding (repeat last clip + clip_mask) must not
    change the paths or trims on the real prefix."""
    from step_tpu.tubes.linking import link_tubes_k

    L, P, T = 5, 4, 3
    rng = np.random.RandomState(4)
    tubes = rng.rand(L, P, T, 4).astype(np.float32) * 40
    tubes[..., 2:] += tubes[..., :2] + 10
    scores = rng.rand(L, P).astype(np.float32)

    ref = link_tubes_k(jnp.asarray(tubes), jnp.asarray(scores), k=2,
                       trim_thresh=0.1)
    Lb = 8
    tubes_p = np.concatenate([tubes, np.repeat(tubes[-1:], Lb - L, 0)])
    scores_p = np.concatenate([scores, np.repeat(scores[-1:], Lb - L, 0)])
    cmask = np.zeros(Lb, np.float32)
    cmask[:L] = 1
    out = link_tubes_k(jnp.asarray(tubes_p), jnp.asarray(scores_p), k=2,
                       trim_thresh=0.1, clip_mask=jnp.asarray(cmask))
    np.testing.assert_array_equal(np.asarray(out["trim"])[:, :L],
                                  np.asarray(ref["trim"]))
    # paths must agree wherever the tube is active
    for k in range(2):
        act = np.asarray(ref["trim"])[k] > 0
        np.testing.assert_array_equal(np.asarray(out["paths"])[k, :L][act],
                                      np.asarray(ref["paths"])[k][act])
    # padded clips always trimmed out
    assert np.asarray(out["trim"])[:, L:].sum() == 0


def test_link_tubes_k_matches_host_linker_video_map():
    """Device K-tube linking and the host greedy linker reach the same
    video-mAP on a clean two-actor synthetic video (VERDICT r2 item 3)."""
    from step_tpu.evaluate import link_frame_detections
    from step_tpu.eval.detection_metrics import video_map
    from step_tpu.tubes.linking import link_tubes_k

    L, P, T = 6, 5, 4
    rng = np.random.RandomState(5)
    tubes = rng.rand(L, P, T, 4).astype(np.float32) * 15
    tubes[..., 2:] += tubes[..., :2] + 70
    scores = np.full((L, P), 0.01, np.float32)
    gt_tubes = []          # evaluator format: (video, cls, {frame: box})
    for actor, (slot, sc, rng_l) in enumerate(
            [(0, 0.9, range(L)), (1, 0.8, range(2, 5))]):
        frames = {}
        for l in range(L):
            box = [10 + 6 * l + 40 * actor, 10 + 4 * l, 30 + 6 * l + 40 * actor,
                   30 + 4 * l]
            tubes[l, slot] = _tube(box, T)
            scores[l, slot] = sc if l in rng_l else 0.02
            if l in rng_l:
                for t in range(T):
                    frames[l * T + t + 1] = np.asarray(box, np.float32)
        gt_tubes.append(("v0", 0, frames))

    # device linking → pred tube format
    out = link_tubes_k(jnp.asarray(tubes), jnp.asarray(scores),
                       link_iou_weight=0.5, k=2, trim_thresh=0.1)
    paths, trim = np.asarray(out["paths"]), np.asarray(out["trim"])
    dev_tubes = []
    for k in range(2):
        frames = {}
        for l in range(L):
            if trim[k, l] > 0:
                for t in range(T):
                    frames[l * T + t + 1] = tubes[l, paths[k, l], t]
        dev_tubes.append(("v0", 0, float(out["tube_scores"][k]), frames))

    # host linking over the equivalent per-frame detections
    dets = []
    for l in range(L):
        for p in range(P):
            for t in range(T):
                dets.append((("v0", l * T + t + 1), 0, float(scores[l, p]),
                             tubes[l, p, t]))
    dets = [d for d in dets if d[2] >= 0.1]
    host_tubes = link_frame_detections(dets, link_iou=0.2)

    m_dev = video_map(dev_tubes, gt_tubes, 1, 0.5)["mAP"]
    m_host = video_map(host_tubes, gt_tubes, 1, 0.5)["mAP"]
    assert m_dev == pytest.approx(1.0, abs=1e-6)
    assert m_dev == pytest.approx(m_host, abs=1e-6)


def test_link_tubes_k_exhaustion_guard():
    """k greater than the valid tube count: exhausted paths must emit zero
    tube_scores and empty trims instead of duplicating used nodes."""
    from step_tpu.tubes.linking import link_tubes_k

    L, P = 3, 4
    rng = np.random.RandomState(6)
    tubes = rng.rand(L, P, 2, 4).astype(np.float32) * 40
    tubes[..., 2:] += tubes[..., :2] + 10
    scores = rng.rand(L, P).astype(np.float32) + 0.2
    valid = np.zeros((L, P), np.float32)
    valid[:, :2] = 1.0                      # only 2 valid tubes per clip
    out = link_tubes_k(jnp.asarray(tubes), jnp.asarray(scores),
                       jnp.asarray(valid), k=4, trim_thresh=0.1)
    ts = np.asarray(out["tube_scores"])
    trim = np.asarray(out["trim"])
    assert (ts[:2] > 0).all()               # two real tubes survive
    assert (ts[2:] == 0).all()              # exhausted paths killed
    assert trim[2:].sum() == 0


def test_nms_top_scored_zero_area_box_self_suppresses():
    """A zero-area box (decoded box clipped fully outside the image) has
    IoU 0 with everything INCLUDING itself; it must be emitted once and
    knocked out, not re-selected until the keep slots fill with
    duplicates that shadow every real detection."""
    boxes = jnp.asarray(
        [[0.0, 0.0, 0.0, 10.0],        # zero-area, TOP score
         [5.0, 5.0, 20.0, 20.0],
         [50.0, 50.0, 70.0, 70.0]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
    keep_idx, keep_mask = nms(boxes, scores, 0.5, max_keep=6)
    got = [int(i) for i, m in zip(np.asarray(keep_idx),
                                  np.asarray(keep_mask)) if m > 0]
    assert got == [0, 1, 2], got      # each exactly once, oracle order
    assert got == np_greedy_nms(np.asarray(boxes), np.asarray(scores), 0.5)

    # Pallas kernel keeps bit-parity on the same degenerate input
    from step_tpu.ops.nms_pallas import nms_many
    out_idx, out_mask = nms_many(boxes[None], scores[None], 0.5, 6, 0.0,
                                 jnp.ones((1, 3)), interpret=True)
    np.testing.assert_array_equal(np.asarray(keep_idx), np.asarray(out_idx[0]))
    np.testing.assert_array_equal(np.asarray(keep_mask), np.asarray(out_mask[0]))
