"""Official-AVA-protocol fidelity: sparse action ids 1..80, the evaluated-
class whitelist (label map pbtxt), excluded-timestamp files, and the
dataset → detect → ava_frame_map path on real-format annotations."""

import os

import jax
import numpy as np
import pytest

from step_tpu.config import StepConfig
from step_tpu.data.ava import AVADataset, read_ava_csv
from step_tpu.eval.ava_eval import (
    AVALabelMap,
    ava_frame_map,
    parse_ava_csv_rows,
    read_exclusions,
)

PBTXT_ITEM = """
item {
  name: "bend/bow (at the waist)"
  id: 1
}
item {
  name: "dance"
  id: 4
}
item {
  name: "work on a computer"
  id: 80
}
"""

PBTXT_LABEL = """
label {
  name: "stand"
  label_id: 12
  label_type: PERSON_MOVEMENT
}
label {
  name: "talk to"
  label_id: 79
  label_type: PERSON_INTERACTION
}
"""


def test_label_map_from_pbtxt_item_shape():
    lm = AVALabelMap.from_pbtxt_text(PBTXT_ITEM)
    assert lm.ids == (1, 4, 80)
    assert lm.num_classes == 3
    assert lm.dense(1) == 0 and lm.dense(4) == 1 and lm.dense(80) == 2
    assert lm.dense(2) == -1  # not an evaluated class
    assert lm.sparse(2) == 80
    assert lm.names[2] == "work on a computer"


def test_label_map_from_pbtxt_label_shape():
    lm = AVALabelMap.from_pbtxt_text(PBTXT_LABEL)
    assert lm.ids == (12, 79)
    assert lm.names == ("stand", "talk to")


def test_label_map_identity():
    lm = AVALabelMap.identity(60)
    assert lm.dense(1) == 0 and lm.dense(60) == 59 and lm.dense(61) == -1


def test_read_exclusions(tmp_path):
    p = os.path.join(str(tmp_path), "excl.csv")
    with open(p, "w") as f:
        f.write("vidA,0902\nvidB,1230\n")
    ex = read_exclusions(p)
    assert ("vidA", 902.0) in ex and ("vidB", 1230.0) in ex


def test_parse_csv_rows_whitelist():
    lm = AVALabelMap.from_pbtxt_text(PBTXT_ITEM)
    rows = [
        ("v", "902", "0.1", "0.1", "0.5", "0.5", "80", "0.9"),  # evaluated
        ("v", "902", "0.1", "0.1", "0.5", "0.5", "2", "0.8"),   # NOT evaluated
    ]
    dets = parse_ava_csv_rows(rows, with_scores=True, label_map=lm)
    assert len(dets) == 1
    assert dets[0][1] == lm.dense(80) == 2


def test_ava_frame_map_guards_out_of_range_ids():
    """Raw sparse ids beyond num_classes must be dropped, never IndexError."""
    box = [0.1, 0.1, 0.5, 0.5]
    key = ("v", 902.0)
    gt = [(key, 0, box), (key, 79, box)]          # 79 out of range for C=60
    det = [(key, 0, 0.9, box), (key, 79, 0.8, box)]
    out = ava_frame_map(det, gt, num_classes=60)
    assert out["mAP"] == 1.0
    assert out["num_gt"][0] == 1 and out["num_gt"].sum() == 1


@pytest.fixture(scope="module")
def real_ava_root(tmp_path_factory):
    """On-disk AVA layout with REAL sparse ids (incl. 80 and non-evaluated
    ids) + label map pbtxt + exclusion file."""
    from tests.test_data import _write_jpg

    root = str(tmp_path_factory.mktemp("real_ava"))
    rng = np.random.RandomState(7)
    for video in ("vidA", "vidB"):
        for fn in range(1, 30):
            _write_jpg(
                os.path.join(root, "frames", video, f"{video}_{fn:06d}.jpg"),
                rng.rand(40, 56, 3) * 0.5,
            )
    rows = [
        # person 1: one evaluated (1) and one non-evaluated (2) action
        "vidA,3,0.1,0.2,0.5,0.9,1,1",
        "vidA,3,0.1,0.2,0.5,0.9,2,1",
        # person 2: only NON-evaluated actions -> must not consume a GT slot
        "vidA,3,0.6,0.1,0.9,0.7,3,2",
        # id 80 (the max sparse id) at another keyframe
        "vidA,4,0.2,0.2,0.4,0.8,80,1",
        # a keyframe that the exclusion file removes
        "vidA,5,0.2,0.2,0.4,0.8,4,1",
        # second video
        "vidB,3,0.3,0.3,0.7,0.7,4,5",
    ]
    with open(os.path.join(root, "ava_val.csv"), "w") as f:
        f.write("\n".join(rows))
    with open(os.path.join(root, "label_map.pbtxt"), "w") as f:
        f.write(PBTXT_ITEM)
    with open(os.path.join(root, "excluded.csv"), "w") as f:
        f.write("vidA,5\n")
    return root


def _tiny_ava_cfg(num_classes):
    return StepConfig(
        dataset="ava",
        num_classes=num_classes,
        multilabel=True,
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
        max_gt_tubes=4,
        max_detections=4,
        compute_dtype="float32",
        batch_size=2,
    )


def test_dataset_with_label_map(real_ava_root):
    lm = AVALabelMap.from_pbtxt(os.path.join(real_ava_root, "label_map.pbtxt"))
    cfg = _tiny_ava_cfg(lm.num_classes)
    ds = AVADataset(real_ava_root, cfg, "ava_val.csv", fps=5,
                    label_map=lm, exclusions_file="excluded.csv")
    # (vidA,5) excluded; (vidA,3), (vidA,4), (vidB,3) remain
    assert len(ds) == 3

    # keyframe (vidA, 3): person 1 keeps only the evaluated action (id 1 ->
    # dense 0); person 2's actions are all non-evaluated -> no GT slot.
    i = ds.keyframes.index(("vidA", 3.0))
    item = ds[i]
    assert item["gt_mask"].sum() == 1
    assert item["gt_labels"][0, 0] == 1.0 and item["gt_labels"].sum() == 1.0

    # groundtruth() honors exclusions + whitelist and stays in dense range
    gt = ds.groundtruth()
    assert all(0 <= g[1] < lm.num_classes for g in gt)
    assert all(g[0] != ("vidA", 5.0) for g in gt)
    # id 80 -> dense 2 present
    assert any(g[1] == 2 for g in gt)


def test_person_without_evaluated_actions_skipped_no_label_map(real_ava_root):
    """Even without a label map, out-of-range actions are filtered and a
    person with none left is skipped (train/eval GT agreement)."""
    cfg = _tiny_ava_cfg(2)  # only dense classes {0, 1} in range
    ds = AVADataset(real_ava_root, cfg, "ava_val.csv", fps=5)
    i = ds.keyframes.index(("vidA", 3.0))
    item = ds[i]
    # person 1 has actions {0, 1}; person 2 has {2} -> out of range, skipped
    assert item["gt_mask"].sum() == 1
    gt = [g for g in ds.groundtruth() if g[0] == ("vidA", 3.0)]
    assert len(gt) == 2 and all(0 <= g[1] < 2 for g in gt)


def test_end_to_end_detect_and_eval_real_ids(real_ava_root):
    """dataset → detect (NMS on device) → ava_frame_map: no crash on real
    sparse ids, finite mAP, whitelist honored."""
    from step_tpu.evaluate import evaluate_ava
    from step_tpu.models.detector import STEPDetector
    from step_tpu.utils.init import init_detector_cpu

    lm = AVALabelMap.from_pbtxt(os.path.join(real_ava_root, "label_map.pbtxt"))
    cfg = _tiny_ava_cfg(lm.num_classes)
    ds = AVADataset(real_ava_root, cfg, "ava_val.csv", fps=5,
                    label_map=lm, exclusions_file="excluded.csv")
    model = STEPDetector(cfg)
    variables = init_detector_cpu(cfg, jax.random.PRNGKey(0), model)
    results = evaluate_ava(variables, ds, cfg, model)
    assert np.isfinite(results["frame_mAP@0.5"])
    assert 0.0 <= results["frame_mAP@0.5"] <= 1.0
