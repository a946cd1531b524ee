"""Evaluator tests with hand-computable cases."""

import numpy as np

from step_tpu.eval.detection_metrics import (
    average_precision,
    frame_map,
    video_map,
    video_map_range,
    spatio_temporal_iou,
)
from step_tpu.eval.ava_eval import ava_frame_map, parse_ava_csv_rows

BOX = [10, 10, 50, 50]
OFF = [100, 100, 140, 140]  # disjoint from BOX


def test_average_precision_perfect():
    scores = np.asarray([0.9, 0.8, 0.7])
    tp = np.asarray([True, True, True])
    assert average_precision(scores, tp, 3) == 1.0


def test_average_precision_half():
    # 1 TP then 1 FP, 2 GT total → AP = 0.5 (recall tops at 0.5, precision 1)
    scores = np.asarray([0.9, 0.8])
    tp = np.asarray([True, False])
    assert average_precision(scores, tp, 2) == 0.5


def test_average_precision_no_gt_is_nan():
    assert np.isnan(average_precision(np.asarray([0.5]), np.asarray([False]), 0))


def test_frame_map_perfect():
    gt = [("f0", 0, BOX), ("f1", 0, OFF)]
    det = [("f0", 0, 0.9, BOX), ("f1", 0, 0.8, OFF)]
    out = frame_map(det, gt, num_classes=2)
    assert out["mAP"] == 1.0


def test_frame_map_duplicate_detection_is_fp():
    gt = [("f0", 0, BOX)]
    det = [("f0", 0, 0.9, BOX), ("f0", 0, 0.8, BOX)]  # duplicate on same GT
    out = frame_map(det, gt, num_classes=1)
    assert out["mAP"] == 1.0  # dup is FP but comes after the TP at recall 1
    det_rev = [("f0", 0, 0.8, BOX), ("f0", 0, 0.9, [11, 11, 49, 49])]
    out2 = frame_map(det_rev, gt, num_classes=1)
    # higher-scored near-identical box takes the GT; lower is FP
    assert 0.4 < out2["mAP"] <= 1.0


def test_frame_map_wrong_class_no_credit():
    gt = [("f0", 0, BOX)]
    det = [("f0", 1, 0.9, BOX)]
    out = frame_map(det, gt, num_classes=2)
    assert out["mAP"] == 0.0


def test_spatio_temporal_iou():
    a = {t: np.asarray(BOX, np.float32) for t in range(10)}
    b = {t: np.asarray(BOX, np.float32) for t in range(5, 15)}
    # temporal IoU = 5/15, spatial IoU = 1 on shared frames
    assert abs(spatio_temporal_iou(a, b) - 5 / 15) < 1e-6
    c = {t: np.asarray(OFF, np.float32) for t in range(10)}
    assert spatio_temporal_iou(a, c) == 0.0


def test_video_map_and_range():
    gt = [("v0", 0, {t: np.asarray(BOX) for t in range(10)})]
    pred = [("v0", 0, 0.9, {t: np.asarray(BOX) for t in range(10)})]
    assert video_map(pred, gt, 1, 0.5)["mAP"] == 1.0
    assert video_map_range(pred, gt, 1) == 1.0
    # half-overlapping tube: ST-IoU ≈ 0.33 → fails at 0.5, passes at 0.2
    pred2 = [("v0", 0, 0.9, {t: np.asarray(BOX) for t in range(5, 15)})]
    assert video_map(pred2, gt, 1, 0.5)["mAP"] == 0.0
    assert video_map(pred2, gt, 1, 0.2)["mAP"] == 1.0


def test_ava_frame_map_multilabel_and_exclusions():
    key0, key1 = ("v", 902.0), ("v", 903.0)
    gt = [(key0, 0, BOX), (key0, 3, BOX), (key1, 0, OFF)]  # one box, two labels
    det = [
        (key0, 0, 0.9, BOX),
        (key0, 3, 0.8, BOX),
        (key1, 0, 0.7, OFF),
    ]
    out = ava_frame_map(det, gt, num_classes=4)
    assert out["mAP"] == 1.0
    out_ex = ava_frame_map(det, gt, num_classes=4, excluded_keyframes=[key1])
    assert out_ex["mAP"] == 1.0
    assert out_ex["num_gt"][0] == 1  # key1 GT excluded


def test_parse_ava_csv_rows():
    rows = [("vid1", "902", "0.1", "0.2", "0.4", "0.9", "7", "0.88")]
    dets = parse_ava_csv_rows(rows, with_scores=True)
    assert dets[0][0] == ("vid1", 902.0)
    assert dets[0][1] == 6  # 1-based → 0-based
    assert dets[0][2] == 0.88
    gts = parse_ava_csv_rows([r[:7] for r in rows], with_scores=False)
    assert gts[0][1] == 6


def test_link_frame_detections():
    from step_tpu.evaluate import link_frame_detections

    B1 = np.asarray(BOX, np.float32)
    B2 = np.asarray(OFF, np.float32)
    dets = []
    # two parallel instances of class 0 across frames 1..5 in one video
    for f in range(1, 6):
        dets.append((("v", f), 0, 0.9, B1 + f))       # slowly moving
        dets.append((("v", f), 0, 0.6, B2))            # static second actor
    # a single-frame spurious detection (below min_length)
    dets.append((("v", 9), 0, 0.5, B1))
    tubes = link_frame_detections(dets, link_iou=0.2, max_gap=2, min_length=2)
    assert len(tubes) == 2
    lengths = sorted(len(t[3]) for t in tubes)
    assert lengths == [5, 5]
    scores = sorted(round(t[2], 2) for t in tubes)
    assert scores == [0.6, 0.9]
    # classes kept separate
    dets2 = dets + [(("v", f), 1, 0.8, B1 + f) for f in range(1, 4)]
    tubes2 = link_frame_detections(dets2)
    assert len(tubes2) == 3


def test_tube_nms():
    from step_tpu.evaluate import tube_nms

    b = lambda: np.asarray(BOX, np.float32)
    t1 = {f: b() for f in range(1, 6)}              # frames 1..5
    t2 = {f: b() for f in range(1, 6)}              # exact duplicate chain
    t3 = {f: b() + 50 for f in range(1, 6)}         # distinct actor
    t4 = {f: b() for f in range(20, 25)}            # same place, later in time
    tubes = [
        ("v", 0, 0.9, t1), ("v", 0, 0.7, t2), ("v", 0, 0.8, t3),
        ("v", 0, 0.6, t4),
        ("v", 1, 0.5, dict(t1)),                    # other class untouched
        ("w", 0, 0.4, dict(t1)),                    # other video untouched
    ]
    out = tube_nms(tubes, iou_thresh=0.5)
    assert len(out) == 5                            # only the duplicate dies
    kept_scores = sorted(s for v, c, s, _ in out if (v, c) == ("v", 0))
    assert kept_scores == [0.6, 0.8, 0.9]           # 0.7 suppressed
    assert tube_nms(tubes, iou_thresh=0.0) is tubes  # disabled passthrough


def test_matching_is_official_protocol_no_reassignment():
    """Official VOC/AVA rule: a detection whose BEST-IoU GT is already
    claimed is an FP — it must not be reassigned to its second-best GT.
    (The lenient variant inflates TP counts vs the official evaluators.)"""
    from step_tpu.eval.detection_metrics import frame_map, video_map

    f = ("v", 1)
    A = np.asarray([0, 0, 10, 10], np.float32)
    B = np.asarray([12, 0, 22, 10], np.float32)
    gt = [(f, 0, A), (f, 0, B)]
    # det1 (0.9): IoU 1.0 with A -> TP, claims A.
    # det2 (0.8): IoU 0.5 with A (its argmax, claimed -> FP) and 0.2 with
    # B — at threshold 0.2 the lenient best-UNUSED rule would reassign
    # det2 to B and report AP 1.0; the official rule reports 0.5.
    d1 = A
    d2 = np.asarray([2, 0, 16, 10], np.float32)
    dets = [(f, 0, 0.9, d1), (f, 0, 0.8, d2)]
    m = frame_map(dets, gt, num_classes=1, iou_threshold=0.2)
    np.testing.assert_allclose(m["mAP"], 0.5)

    # same rule on the tube matcher (shared _greedy_tp)
    tube = lambda box: {1: box, 2: box}
    gt_t = [("v", 0, tube(A)), ("v", 0, tube(B))]
    dets_t = [("v", 0, 0.9, tube(d1)), ("v", 0, 0.8, tube(d2))]
    vm = video_map(dets_t, gt_t, num_classes=1, iou_threshold=0.2)
    np.testing.assert_allclose(vm["mAP"], 0.5)


def test_vectorized_frame_matcher_parity_fuzz():
    """match_detections' vectorized matcher == the per-detection loop
    reference (`_greedy_tp` over `_class_matches`) bit-for-bit, fuzzed over
    regimes that stress every branch: shared-best-GT claims (the official
    no-reassignment rule), frames with no GT, GT with no detections,
    duplicate boxes, tied scores, empty classes."""
    from collections import defaultdict

    from step_tpu.eval.detection_metrics import (_class_matches, _frame_ious,
                                                 _greedy_tp,
                                                 match_detections)

    def loop_match(detections, groundtruth, num_classes, iou_threshold):
        # the pre-round-5 implementation, verbatim
        gt_by_cf = defaultdict(list)
        gt_count = np.zeros(num_classes, np.int64)
        for frame_key, cls, box in groundtruth:
            gt_by_cf[(cls, frame_key)].append(np.asarray(box, np.float32))
            gt_count[cls] += 1
        det_by_class = defaultdict(list)
        for frame_key, cls, score, box in detections:
            det_by_class[cls].append(
                (float(score), frame_key, np.asarray(box, np.float32)))
        matched = {}
        for cls in range(num_classes):
            dets = [(s, (cls, fk), box)
                    for s, fk, box in sorted(det_by_class[cls],
                                             key=lambda d: -d[0])]
            gt_map = {k: v for k, v in gt_by_cf.items() if k[0] == cls}
            scores = np.asarray([d[0] for d in dets], np.float32)
            tp = _greedy_tp(_class_matches(dets, gt_map, _frame_ious),
                            gt_map, iou_threshold)
            matched[cls] = (scores, tp)
        return {"matched": matched, "num_gt": gt_count}

    rng = np.random.RandomState(42)
    for trial in range(6):
        C = rng.randint(1, 5)
        videos = [f"v{i}" for i in range(rng.randint(1, 4))]
        frames = range(1, rng.randint(2, 8))
        gt, dets = [], []
        for v in videos:
            for f in frames:
                for _ in range(rng.randint(0, 3)):
                    x1, y1 = rng.rand(2) * 50
                    w, h = rng.rand(2) * 40 + 5
                    gt.append(((v, f), rng.randint(C),
                               np.asarray([x1, y1, x1 + w, y1 + h],
                                          np.float32)))
                for _ in range(rng.randint(0, 6)):
                    if gt and rng.rand() < 0.6:
                        # near-GT detection (stresses the claim rule);
                        # sometimes EXACT duplicates with tied scores
                        base = gt[rng.randint(len(gt))][2]
                        jitter = (rng.randn(4) * (0 if rng.rand() < 0.3
                                                  else 4))
                        box = base + jitter.astype(np.float32)
                    else:
                        x1, y1 = rng.rand(2) * 50
                        w, h = rng.rand(2) * 40 + 5
                        box = np.asarray([x1, y1, x1 + w, y1 + h],
                                         np.float32)
                    score = round(float(rng.rand()), 1)   # force score ties
                    dets.append(((v, f), rng.randint(C), score, box))
        thr = [0.0, 0.3, 0.5][trial % 3]
        ref = loop_match(dets, gt, C, thr)
        new = match_detections(dets, gt, C, thr)
        np.testing.assert_array_equal(ref["num_gt"], new["num_gt"])
        for cls in range(C):
            np.testing.assert_array_equal(ref["matched"][cls][0],
                                          new["matched"][cls][0])
            np.testing.assert_array_equal(ref["matched"][cls][1],
                                          new["matched"][cls][1])


def test_vectorized_dedupe_parity_fuzz():
    """dedupe_frame_detections (vectorized) == the former per-detection
    dict pass, including output ORDER (first-occurrence) and tie rule
    (earliest max score wins), fuzzed with exact-duplicate boxes, tied
    scores, and near-misses straddling the 0.1px rounding grid."""
    from step_tpu.evaluate import dedupe_frame_detections

    def dict_dedupe(detections):
        best = {}
        for fkey, c, s, box in detections:
            k = (fkey, c, tuple(np.round(box, 1)))
            if k not in best or best[k][2] < s:
                best[k] = (fkey, c, s, box)
        return list(best.values())

    rng = np.random.RandomState(3)
    for trial in range(5):
        dets = []
        for _ in range(rng.randint(0, 400)):
            fkey = (f"v{rng.randint(3)}", int(rng.randint(1, 6)))
            c = int(rng.randint(3))
            box = (rng.rand(4) * 40).astype(np.float32)
            if dets and rng.rand() < 0.5:
                # revisit an existing detection's box exactly or nearly
                box = np.asarray(dets[rng.randint(len(dets))][3],
                                 np.float32)
                if rng.rand() < 0.5:
                    box = box + np.float32(0.04)   # same 0.1px cell (often)
            s = round(float(rng.rand()), 1)        # force score ties
            dets.append((fkey, c, s, box))
        ref = dict_dedupe(dets)
        out = dedupe_frame_detections(dets)
        assert len(ref) == len(out)
        for (ka, ca, sa, ba), (kb, cb, sb, bb) in zip(ref, out):
            assert (ka, ca, sa) == (kb, cb, sb)
            np.testing.assert_array_equal(ba, bb)


def test_vectorized_tube_iou_parity_fuzz():
    """spatio_temporal_iou (one vectorized IoU over the intersection
    frames) == the former per-frame _iou_1vsN loop bit-for-bit, in BOTH
    float32 and float64 — the vectorization must compute in the boxes' own
    dtype (a forced f32 cast drifts f64 tubes by ~1e-7, enough to flip a
    >=threshold video-mAP match), fuzzed over partial/complete/empty
    temporal overlap and degenerate boxes."""
    from step_tpu.eval.detection_metrics import _iou_1vsN, spatio_temporal_iou

    def loop_iou(tube_a, tube_b):
        # the pre-round-5 implementation, verbatim
        frames_a, frames_b = set(tube_a), set(tube_b)
        inter_frames = frames_a & frames_b
        union_frames = frames_a | frames_b
        if not inter_frames:
            return 0.0
        t_iou = len(inter_frames) / len(union_frames)
        s_iou = np.mean(
            [float(_iou_1vsN(np.asarray(tube_a[f]),
                             np.asarray(tube_b[f])[None])[0])
             for f in sorted(inter_frames)]
        )
        return float(t_iou * s_iou)

    rng = np.random.RandomState(7)
    for trial in range(8):
        dtype = np.float32 if trial % 2 else np.float64
        def tube(start, length):
            out = {}
            for f in range(start, start + length):
                x1, y1 = rng.rand(2) * 50
                w, h = rng.rand(2) * 40   # w/h may be ~0 (degenerate box)
                out[f] = np.asarray([x1, y1, x1 + w, y1 + h], dtype)
            return out
        a = tube(rng.randint(0, 5), rng.randint(1, 30))
        b = tube(rng.randint(0, 40), rng.randint(1, 30))
        got, want = spatio_temporal_iou(a, b), loop_iou(a, b)
        assert got == want, (trial, got, want)
        # identical tubes: exact 1.0; disjoint: exact 0.0
        assert spatio_temporal_iou(a, dict(a)) == 1.0
        far = {f + 1000: v for f, v in b.items()}
        assert spatio_temporal_iou(a, far) == 0.0
