"""End-to-end CLI coverage (VERDICT r1 item 6): drive the real `train.py`
and `test.py` scripts via subprocess over miniature on-disk datasets in the
EXACT real formats (UCF101v2-GT.pkl layout, AVA CSV + pbtxt label map), and
assert checkpoints, metric logs, detection dumps, and finite mAPs come out.

The subprocesses force --platform cpu (the sitecustomize pins the TPU
otherwise) and a tiny config via --set overrides.
"""

import os
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_SET = [
    "--tiny",
    "--set", "frames_per_chunk=2",
    "--set", "num_chunks=1",
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
]


def run_cli(script, *args, timeout=420, extra_env=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if extra_env:
        env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), "--platform", "cpu", *args],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script} rc={proc.returncode}\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    return proc.stdout


@pytest.fixture(scope="module")
def mini_ucf(tmp_path_factory):
    """Miniature dataset in the exact UCF101-24 on-disk layout."""
    from tests.test_data import _write_jpg

    root = str(tmp_path_factory.mktemp("mini_ucf"))
    rng = np.random.RandomState(0)
    H, W = 40, 48
    nframes = {"Run/v1": 8, "Run/v2": 8, "Jump/v3": 8}
    gttubes = {}
    for video, n in nframes.items():
        cls = 0 if video.startswith("Run") else 1
        for f in range(n):
            img = rng.rand(H, W, 3) * 0.3
            img[10:25, 12:30] = 0.9  # a bright "actor" box
            _write_jpg(os.path.join(root, "rgb-images", video,
                                    f"{f + 1:05d}.jpg"), img)
        frames = np.arange(1, n + 1, dtype=np.float32)
        tube = np.stack(
            [frames, np.full_like(frames, 12), np.full_like(frames, 10),
             np.full_like(frames, 30), np.full_like(frames, 25)], axis=1
        )
        gttubes[video] = {cls: [tube]}
    gt = {
        "labels": ["Run", "Jump"],
        "train_videos": [["Run/v1", "Jump/v3"]],
        "test_videos": [["Run/v2"]],
        "nframes": nframes,
        "gttubes": gttubes,
        "resolution": {v: (H, W) for v in nframes},
    }
    with open(os.path.join(root, "UCF101v2-GT.pkl"), "wb") as f:
        pickle.dump(gt, f)
    return root


@pytest.fixture(scope="module")
def mini_ava(tmp_path_factory):
    """Miniature dataset in the exact AVA layout (frames + CSVs + pbtxt)."""
    from tests.test_data import _write_jpg
    from tests.test_ava_protocol import PBTXT_ITEM

    root = str(tmp_path_factory.mktemp("mini_ava"))
    rng = np.random.RandomState(1)
    for video in ("vidA", "vidB"):
        for fn in range(1, 40):
            _write_jpg(os.path.join(root, "frames", video,
                                    f"{video}_{fn:06d}.jpg"),
                       rng.rand(40, 48, 3) * 0.5)
    rows = [
        "vidA,3,0.1,0.2,0.5,0.9,1,1",     # evaluated (id 1)
        "vidA,3,0.1,0.2,0.5,0.9,2,1",     # NOT evaluated (dropped)
        "vidA,4,0.2,0.2,0.6,0.8,80,2",    # evaluated (id 80)
        "vidB,3,0.3,0.3,0.7,0.7,4,5",     # evaluated (id 4)
        "vidB,5,0.3,0.3,0.7,0.7,4,5",     # excluded keyframe
    ]
    for name in ("ava_train.csv", "ava_val.csv"):
        with open(os.path.join(root, name), "w") as f:
            f.write("\n".join(rows))
    with open(os.path.join(root, "label_map.pbtxt"), "w") as f:
        f.write(PBTXT_ITEM)
    with open(os.path.join(root, "excluded.csv"), "w") as f:
        f.write("vidB,5\n")
    return root


def test_ucf_train_then_test_cli(mini_ucf, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    logs = str(tmp_path / "logs")
    out_train = run_cli(
        "train.py", "--dataset", "ucf101_24", "--data-root", mini_ucf,
        "--ckpt-dir", ckpt, "--log-dir", logs, "--epochs", "2",
        "--eval-every-epochs", "1", "--eval-max-batches", "2",
        "--set", "num_classes=2", *TINY_SET)
    # in-train held-out eval (--eval-every-epochs) printed finite mAPs
    m_eval = re.search(r"epoch 0 eval: .*frame_mAP@0\.5.*?([0-9.]+)",
                       out_train)
    assert m_eval, out_train
    assert os.path.isdir(ckpt) and os.listdir(ckpt)
    metrics = open(os.path.join(logs, "metrics.jsonl")).read().splitlines()
    assert len(metrics) >= 1

    dump = str(tmp_path / "dets.pkl")
    out = run_cli("test.py", "--preset", "ucf_3step", "--data-root", mini_ucf,
                  "--ckpt-dir", ckpt, "--dump", dump,
                  "--set", "num_classes=2", *TINY_SET)
    m = re.search(r"frame_mAP@0\.5: ([0-9.nan]+)", out)
    assert m, out
    assert np.isfinite(float(m.group(1)))
    assert "video_mAP@0.2" in out
    with open(dump, "rb") as f:
        assert "detections" in pickle.load(f)

    # --sharded: same eval batch-sharded over an 8-virtual-device CPU mesh
    # must reproduce the single-device metrics.
    out_sh = run_cli(
        "test.py", "--preset", "ucf_3step", "--data-root", mini_ucf,
        "--ckpt-dir", ckpt, "--sharded",
        "--set", "num_classes=2", *TINY_SET,
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert "sharded eval over 8 devices" in out_sh
    for metric in ("frame_mAP@0.5", "video_mAP@0.2"):
        v1 = float(re.search(rf"{metric}: ([0-9.]+)", out).group(1))
        v2 = float(re.search(rf"{metric}: ([0-9.]+)", out_sh).group(1))
        assert v1 == pytest.approx(v2, abs=1e-3), metric

    # --optimized: BN-folded + fused-Inception serving program must
    # reproduce the standard metrics (fold is exact up to reassociation).
    out_opt = run_cli(
        "test.py", "--preset", "ucf_3step", "--data-root", mini_ucf,
        "--ckpt-dir", ckpt, "--optimized",
        "--set", "num_classes=2", *TINY_SET)
    for metric in ("frame_mAP@0.5", "video_mAP@0.2"):
        v1 = float(re.search(rf"{metric}: ([0-9.]+)", out).group(1))
        v3 = float(re.search(rf"{metric}: ([0-9.]+)", out_opt).group(1))
        assert v1 == pytest.approx(v3, abs=2e-2), metric

    # --device-linking: on-device K-tube Viterbi video tubes → finite mAPs
    out_dl = run_cli(
        "test.py", "--preset", "ucf_3step", "--data-root", mini_ucf,
        "--ckpt-dir", ckpt, "--device-linking",
        "--set", "num_classes=2", *TINY_SET)
    for metric in ("frame_mAP@0.5", "video_mAP@0.2", "video_mAP@0.5"):
        m = re.search(rf"{metric}: ([0-9.nan]+)", out_dl)
        assert m, out_dl


def test_ava_train_then_test_cli(mini_ava, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    lm = os.path.join(mini_ava, "label_map.pbtxt")
    ava_set = ["--set", "num_classes=3", "--set", "multilabel=True"]
    run_cli("train.py", "--dataset", "ava", "--data-root", mini_ava,
            "--annotation-file", "ava_train.csv", "--label-map", lm,
            "--fps", "5", "--ckpt-dir", ckpt, "--epochs", "2",
            *TINY_SET, *ava_set)
    assert os.path.isdir(ckpt) and os.listdir(ckpt)

    dump = str(tmp_path / "dets.pkl")
    out = run_cli("test.py", "--preset", "ava_3step", "--data-root", mini_ava,
                  "--annotation-file", "ava_val.csv", "--label-map", lm,
                  "--exclusions", "excluded.csv", "--fps", "5",
                  "--ckpt-dir", ckpt, "--dump", dump, *TINY_SET, *ava_set)
    m = re.search(r"frame_mAP@0\.5: ([0-9.nan]+)", out)
    assert m, out
    assert np.isfinite(float(m.group(1)))
    assert os.path.exists(dump)


def test_classify_cli(tmp_path):
    """classify.py: torch checkpoint → converted I3D classifier → top-k."""
    pytest.importorskip("torch")
    import cv2
    import torch

    from tests._torch_i3d import TorchI3D

    torch.manual_seed(0)
    net = TorchI3D(num_classes=7)
    ckpt = os.path.join(str(tmp_path), "i3d.pth")
    torch.save(net.state_dict(), ckpt)

    frames_dir = os.path.join(str(tmp_path), "frames")
    os.makedirs(frames_dir)
    rng = np.random.RandomState(0)
    for i in range(6):
        cv2.imwrite(os.path.join(frames_dir, f"{i:05d}.jpg"),
                    rng.randint(0, 255, (48, 48, 3), np.uint8))
    labels = os.path.join(str(tmp_path), "labels.txt")
    with open(labels, "w") as f:
        f.write("\n".join(f"action_{i}" for i in range(7)))

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "classify.py"),
         "--frames-dir", frames_dir, "--torch-ckpt", ckpt,
         "--labels", labels, "--num-classes", "7", "--num-frames", "8",
         "--image-size", "64", "--top-k", "3", "--platform", "cpu"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if "action_" in l]
    assert len(lines) == 3
    probs = [float(l.split()[0]) for l in lines]
    assert all(0.0 <= p <= 1.0 for p in probs)
    assert probs == sorted(probs, reverse=True)


def test_export_then_serve_cli(mini_ucf, tmp_path):
    """Full serving journey: train → checkpoint → export StableHLO →
    serve.py over a frames directory → detections pickle."""
    ckpt = str(tmp_path / "ckpt")
    run_cli("train.py", "--dataset", "ucf101_24", "--data-root", mini_ucf,
            "--ckpt-dir", ckpt, "--epochs", "1",
            "--set", "num_classes=2", *TINY_SET)

    prog = str(tmp_path / "detect.stablehlo")
    run_cli("export.py", "--preset", "ucf_3step", "--batch-size", "2",
            "--out", prog, "--set", "num_classes=2", *TINY_SET)
    assert os.path.getsize(prog) > 1000

    # serve over one of the miniature dataset's frame dirs
    frames_root = os.path.join(mini_ucf, "rgb-images", "Run", "v2")
    out = str(tmp_path / "served.pkl")
    # --vmem-limit-kib drives the compile_opts warm-compile path; on CPU
    # the TPU-only option is inert (helper returns the callable unchanged)
    # but the arg plumbing and warm-shape construction still execute.
    r = run_cli("serve.py", "--program", prog, "--preset", "ucf_3step",
                "--ckpt-dir", ckpt, "--frames-dir", frames_root,
                "--out", out, "--batch-size", "2",
                "--set", "num_classes=2", "--set", "score_thresh=0.0",
                "--vmem-limit-kib", "65536",
                *TINY_SET)
    assert "served" in r
    with open(out, "rb") as f:
        dets = pickle.load(f)["detections"]
    assert isinstance(dets, list)
    for (video, frame), c, s, box in dets[:5]:
        assert frame >= 1 and 0 <= c < 2 and np.isfinite(s)

    # multi-video mode: --frames-dir pointing at a directory of per-video
    # directories drives the decode-prefetch overlap loop (next video's
    # JPEGs decode on a worker thread while the current one is served)
    multi_root = os.path.join(mini_ucf, "rgb-images", "Run")  # v1 + v2
    out2 = str(tmp_path / "served_multi.pkl")
    r = run_cli("serve.py", "--program", prog, "--preset", "ucf_3step",
                "--ckpt-dir", ckpt, "--frames-dir", multi_root,
                "--out", out2, "--batch-size", "2",
                "--set", "num_classes=2", "--set", "score_thresh=0.0",
                *TINY_SET)
    assert "v1" in r and "v2" in r
    with open(out2, "rb") as f:
        dets2 = pickle.load(f)["detections"]
    served_videos = {video for (video, _), *_ in dets2}
    assert served_videos == {"v1", "v2"}
    # v2 alone was served above; its detections must be identical whether
    # it is served standalone or via the prefetching multi-video loop
    v2_multi = [d for d in dets2 if d[0][0] == "v2"]
    assert len(v2_multi) == len(dets)
    for (ka, ca, sa, ba), (kb, cb, sb, bb) in zip(
            sorted(dets, key=lambda d: (d[0][1], d[1], -d[2])),
            sorted(v2_multi, key=lambda d: (d[0][1], d[1], -d[2]))):
        assert ka[1] == kb[1] and ca == cb
        np.testing.assert_allclose(sa, sb, rtol=1e-5)
        np.testing.assert_allclose(ba, bb, rtol=1e-4, atol=1e-4)


def test_serve_rejects_flow_stream(tmp_path):
    """serve.py decodes RGB JPEGs; a flow-stream config must be refused
    up front (its exported program takes 2-channel int8 flow that cannot
    be synthesized from frames) rather than crash at call time."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "serve.py"), "--platform", "cpu",
         "--program", "nonexistent.stablehlo", "--ckpt-dir", str(tmp_path),
         "--frames-dir", str(tmp_path), "--set", "input_stream=flow"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode != 0
    assert "RGB-stream programs only" in proc.stderr


def test_demo_cli(tmp_path):
    """demo.py end-to-end: tiny synthetic video in → annotated video out,
    through the single compiled detect_video program (random weights)."""
    import cv2

    src = str(tmp_path / "in.mp4")
    rng = np.random.RandomState(0)
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 5, (48, 40))
    assert w.isOpened()
    for _ in range(6):
        w.write((rng.rand(40, 48, 3) * 255).astype(np.uint8))
    w.release()

    out = str(tmp_path / "out.mp4")
    text = run_cli("demo.py", "--video", src, "--output", out,
                   "--preset", "streaming", "--score-thresh", "0.0",
                   *TINY_SET)
    assert os.path.exists(out) and os.path.getsize(out) > 0, text
    frames = []
    cap = cv2.VideoCapture(out)
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    assert len(frames) == 6
