"""apply_overrides: literal coercion, comma-separated pairs, type guard.

Regression for the round-4 chip-queue failure where
``--set max_gt_tubes=2,warmup_steps=100`` overlaid the *string*
``"2,warmup_steps=100"`` onto an int field and crashed 90 minutes into a
training run (reference: per-script argparse flags, recon — our generic
--set overlay must be loud about type mistakes instead).
"""

import pytest

from step_tpu.config import StepConfig
from step_tpu.utils.cli import apply_overrides


def test_single_pair_coerces_literal():
    cfg = apply_overrides(StepConfig(), ["max_gt_tubes=2"])
    assert cfg.max_gt_tubes == 2 and isinstance(cfg.max_gt_tubes, int)


def test_comma_separated_pairs_in_one_set():
    cfg = apply_overrides(StepConfig(), ["max_gt_tubes=2,warmup_steps=100"])
    assert cfg.max_gt_tubes == 2
    assert cfg.warmup_steps == 100


def test_tuple_value_commas_survive():
    cfg = apply_overrides(StepConfig(), ["iou_thresholds=(0.4,0.5,0.6)"])
    assert cfg.iou_thresholds == (0.4, 0.5, 0.6)


def test_tuple_value_then_more_pairs():
    cfg = apply_overrides(
        StepConfig(), ["iou_thresholds=(0.4,0.5),num_steps=2,max_gt_tubes=3"])
    assert cfg.iou_thresholds == (0.4, 0.5)
    assert cfg.num_steps == 2
    assert cfg.max_gt_tubes == 3


def test_bare_string_allowed_for_string_fields():
    cfg = apply_overrides(StepConfig(), ["backbone_depth=tiny"])
    assert cfg.backbone_depth == "tiny"


def test_string_onto_numeric_field_raises():
    with pytest.raises(ValueError, match="parsed as a string"):
        apply_overrides(StepConfig(), ["max_gt_tubes=2,oops"])


def test_missing_equals_raises():
    with pytest.raises(ValueError, match="key=value"):
        apply_overrides(StepConfig(), ["max_gt_tubes"])


def test_non_string_onto_string_field_raises():
    # roi_impl=0 would miss every string comparison downstream and fall
    # through to a slow default path silently — the guard must be two-way.
    with pytest.raises(ValueError, match="field is a string"):
        apply_overrides(StepConfig(), ["roi_impl=0"])
