"""Per-class Platt score calibration (eval/calibration.py)."""

import numpy as np

from step_tpu.eval.calibration import (
    _fit_platt_1d,
    apply_calibration,
    fit_calibration,
)
from step_tpu.eval.detection_metrics import frame_map

BOX = np.asarray([10, 10, 50, 50], np.float32)


def _make_val_set(rng, cls, n, score_lo, score_hi, precision_at_hi):
    """Detections for one class whose TP probability rises with score."""
    dets, gts = [], []
    for i in range(n):
        s = score_lo + (score_hi - score_lo) * i / (n - 1)
        p_tp = precision_at_hi * (i / (n - 1))
        fkey = (f"v{cls}", i)
        is_tp = rng.rand() < p_tp
        if is_tp:
            gts.append((fkey, cls, BOX.copy()))
            dets.append((fkey, cls, s, BOX.copy()))
        else:
            dets.append((fkey, cls, s, BOX + 200))  # misses any GT
            gts.append((fkey, cls, BOX.copy() + 400))  # unmatched GT
    return dets, gts


def test_platt_1d_monotone_and_centered():
    rng = np.random.RandomState(0)
    scores = rng.rand(500).astype(np.float32)
    tp = rng.rand(500) < scores          # precision == score, perfectly calibrated-ish
    a, b = _fit_platt_1d(scores, np.asarray(tp))
    assert a > 0                         # higher score -> higher P(TP)
    # calibrated curve roughly tracks empirical precision
    hi = 1.0 / (1.0 + np.exp(-(a * 0.9 + b)))
    lo = 1.0 / (1.0 + np.exp(-(a * 0.1 + b)))
    assert hi > 0.6 and lo < 0.4


def test_fit_and_apply_calibration():
    rng = np.random.RandomState(1)
    # class 0 scores live in [0.5, 1.0] and are mostly right at the top;
    # class 1 scores live in [0.0, 0.2] (compressed range, same semantics)
    d0, g0 = _make_val_set(rng, 0, 200, 0.5, 1.0, 0.95)
    d1, g1 = _make_val_set(rng, 1, 200, 0.0, 0.2, 0.95)
    dets, gts = d0 + d1, g0 + g1
    calib = fit_calibration(dets, gts, num_classes=2)
    assert calib["a"][0] > 0 and calib["a"][1] > 0
    out = apply_calibration(dets, calib)

    # per-class AP is invariant under the (monotone) calibration
    before = frame_map(dets, gts, 2)["ap_per_class"]
    after = frame_map(out, gts, 2)["ap_per_class"]
    np.testing.assert_allclose(after, before, rtol=1e-6)

    # cross-class comparability: the top class-1 detection (raw 0.2) now
    # scores comparably to the top class-0 detection instead of 5x lower
    top0 = max(s for _, c, s, _ in out if c == 0)
    top1 = max(s for _, c, s, _ in out if c == 1)
    assert top1 > 0.5 * top0
    raw_top1 = max(s for _, c, s, _ in dets if c == 1)
    assert raw_top1 <= 0.2


def test_calibration_empty_class_defaults():
    calib = fit_calibration([], [], num_classes=3)
    np.testing.assert_allclose(calib["a"], 1.0)
    np.testing.assert_allclose(calib["b"], 0.0)
