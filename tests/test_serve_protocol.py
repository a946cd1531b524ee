"""serve.py ↔ test.py detection-protocol parity (VERDICT r4 weak #1 /
next #1).

serve.py detects with the EVAL ownership protocol by default: sliding
windows at one-chunk stride, each frame scored only by the clip whose
CENTRAL chunk owns it (extension-position detections survive only for
frames no clip owns). These tests pin that protocol three ways:

  * `_load_clips` reproduces `UCFDataset.clip_frame_indices`' tiling math
    (starts, edge clamping, central-chunk ownership) exactly.
  * the full CLI journey — train → test.py --dump vs export → serve.py on
    the same frames with a MULTI-CHUNK config (overlapping windows, the
    regime where the old non-overlap tiling diverged) — produces the SAME
    detections (same frames, classes, scores, boxes).
  * --fast-tiling still works and is the documented divergent mode.

Both subprocesses pin the cv2 decode path (STEP_TPU_DISABLE_NATIVE): the
native libjpeg decoder's pixels are near- but not bit-identical to cv2's.
"""

import os
import pickle

import numpy as np
import pytest

from tests.test_cli_e2e import run_cli

# 3-chunk tiny config: T = 6 total frames, fpc = 2 → overlapping sliding
# windows (the full preset's 18/6 geometry, scaled down for CPU).
TINY3_SET = [
    "--tiny",
    "--set", "frames_per_chunk=2",
    "--set", "num_chunks=3",
    "--set", "num_steps=1",
    "--set", "iou_thresholds=(0.4,)",
    "--set", "step_loss_weights=(1.0,)",
    "--set", "temporal_extension=False",
    "--set", "image_size=32",
    "--set", "pooled_size=4",
    "--set", "max_proposals=12",
    "--set", "max_gt_tubes=2",
    "--set", "max_detections=4",
    "--set", "compute_dtype=float32",
    "--set", "batch_size=2",
    "--set", "warmup_steps=1",
    "--set", "total_steps=4",
    "--set", "num_classes=2",
    "--set", "score_thresh=0.0",
]


def _tiny3_cfg():
    from step_tpu.config import PRESETS

    return PRESETS["ucf_3step"].replace(
        frames_per_chunk=2, num_chunks=3, image_size=32)


@pytest.fixture(scope="module")
def mini_ucf3(tmp_path_factory):
    """Miniature UCF layout at EXACTLY the model resolution (32x32) so
    test.py's native-resolution box scaling is identity and serve.py's
    model-coordinate boxes compare directly."""
    from tests.test_data import _write_jpg

    root = str(tmp_path_factory.mktemp("mini_ucf3"))
    rng = np.random.RandomState(7)
    S = 32
    # v2 (test split) has 11 frames: fpc=2 → central chunks own frames
    # 0..9, frame 10 is UNOWNED — exercises the extension-frame keep rule.
    nframes = {"Run/v1": 8, "Run/v2": 11, "Jump/v3": 8}
    gttubes = {}
    for video, n in nframes.items():
        cls = 0 if video.startswith("Run") else 1
        for f in range(n):
            img = rng.rand(S, S, 3) * 0.3
            img[8:22, 10:26] = 0.9
            _write_jpg(os.path.join(root, "rgb-images", video,
                                    f"{f + 1:05d}.jpg"), img)
        frames = np.arange(1, n + 1, dtype=np.float32)
        tube = np.stack(
            [frames, np.full_like(frames, 10), np.full_like(frames, 8),
             np.full_like(frames, 26), np.full_like(frames, 22)], axis=1)
        gttubes[video] = {cls: [tube]}
    gt = {
        "labels": ["Run", "Jump"],
        "train_videos": [["Run/v1", "Jump/v3"]],
        "test_videos": [["Run/v2"]],
        "nframes": nframes,
        "gttubes": gttubes,
        "resolution": {v: (S, S) for v in nframes},
    }
    with open(os.path.join(root, "UCF101v2-GT.pkl"), "wb") as f:
        pickle.dump(gt, f)
    return root


@pytest.mark.parametrize("fpc,chunks", [(2, 3), (3, 3), (5, 3), (3, 5),
                                        (6, 3)])
def test_sliding_windows_matches_eval_ownership(fpc, chunks):
    """serve._sliding_windows == the dataset's clip_frame_indices over the
    sampled centers, and ownership == evaluate.collect_detections'
    owned_fkeys (brute-force union over the clips' real central-chunk
    indices — the by-construction form; the config's odd-num_chunks
    invariant is what makes the arithmetic start:start+fpc equivalent,
    so ownership is derived from the indices, not that arithmetic).
    Odd-fpc geometries included."""
    from serve import _sliding_windows

    cfg = _tiny3_cfg().replace(frames_per_chunk=fpc, num_chunks=chunks)
    T = cfg.total_frames
    offsets = np.arange(T) - T // 2
    tc0 = (T - fpc) // 2
    for F in (3, 7, 8, 11, 24):   # shorter-than-window through long
        idx, owned = _sliding_windows(F, cfg)
        starts = np.arange(0, max(F - fpc + 1, 1), fpc)
        assert idx.shape == (len(starts), T)
        want_owned = np.zeros(F, bool)
        for li, s in enumerate(starts):
            # the dataset's per-center math, element-for-element
            # (UCFDataset.clip_frame_indices: clip(center + (t-T//2), 0, n-1))
            ds_idx = np.clip(s + fpc // 2 + offsets, 0, F - 1)
            np.testing.assert_array_equal(idx[li], ds_idx)
            # evaluate.collect_detections' owned_fkeys semantics
            for t in range(tc0, tc0 + fpc):
                want_owned[ds_idx[t]] = True
        np.testing.assert_array_equal(owned, want_owned)


def test_serve_matches_test_cli(mini_ucf3, tmp_path):
    """Full journey: the SAME checkpoint served via test.py (eval pipeline)
    and serve.py (exported program + ownership protocol) on the same frames
    must emit identical detections."""
    no_native = {"STEP_TPU_DISABLE_NATIVE": "1"}
    ckpt = str(tmp_path / "ckpt")
    run_cli("train.py", "--dataset", "ucf101_24", "--data-root", mini_ucf3,
            "--ckpt-dir", ckpt, "--epochs", "1", *TINY3_SET,
            extra_env=no_native)

    dump = str(tmp_path / "test_dets.pkl")
    run_cli("test.py", "--preset", "ucf_3step", "--data-root", mini_ucf3,
            "--ckpt-dir", ckpt, "--dump", dump, *TINY3_SET,
            extra_env=no_native)
    with open(dump, "rb") as f:
        test_dets = [d for d in pickle.load(f)["detections"]
                     if d[0][0] == "Run/v2"]

    prog = str(tmp_path / "detect.stablehlo")
    run_cli("export.py", "--preset", "ucf_3step", "--batch-size", "2",
            "--out", prog, *TINY3_SET)
    served = str(tmp_path / "served.pkl")
    run_cli("serve.py", "--program", prog, "--preset", "ucf_3step",
            "--ckpt-dir", ckpt,
            "--frames-dir", os.path.join(mini_ucf3, "rgb-images", "Run", "v2"),
            "--out", served, "--batch-size", "2", *TINY3_SET,
            extra_env=no_native)
    with open(served, "rb") as f:
        serve_dets = pickle.load(f)["detections"]

    assert len(test_dets) > 0
    assert len(serve_dets) == len(test_dets), (
        f"serve emitted {len(serve_dets)} detections, test.py "
        f"{len(test_dets)} — protocol divergence")
    key = lambda d: (d[0][1], d[1], -d[2])
    for (ka, ca, sa, ba), (kb, cb, sb, bb) in zip(
            sorted(serve_dets, key=key), sorted(test_dets, key=key)):
        assert ka[1] == kb[1], "frame mismatch"
        assert ca == cb, "class mismatch"
        np.testing.assert_allclose(sa, sb, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ba, bb, rtol=1e-4, atol=1e-3)

    # detections exist for the unowned tail frame (11 = 1-based frame 10):
    # only extension positions cover it, so the keep rule must admit them
    assert any(k[1] == 11 for k, *_ in serve_dets)

    # --fast-tiling: the explicit divergent mode still runs end-to-end and
    # covers every frame (its mAP cost is measured in VALIDATION.md r5)
    fast = str(tmp_path / "served_fast.pkl")
    run_cli("serve.py", "--program", prog, "--preset", "ucf_3step",
            "--ckpt-dir", ckpt,
            "--frames-dir", os.path.join(mini_ucf3, "rgb-images", "Run", "v2"),
            "--out", fast, "--batch-size", "2", "--fast-tiling", *TINY3_SET,
            extra_env=no_native)
    with open(fast, "rb") as f:
        fast_dets = pickle.load(f)["detections"]
    assert {k[1] for k, *_ in fast_dets} == set(range(1, 12))
