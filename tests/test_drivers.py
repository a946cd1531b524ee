"""End-to-end driver tests: fit loop, evaluation, vis (tiny configs, CPU)."""

import json
import os
import pickle

import jax
import numpy as np
import pytest

from step_tpu.config import StepConfig
from step_tpu.data.loader import DataLoader
from step_tpu.data.synthetic import SyntheticConfig, make_clip
from step_tpu.models.detector import STEPDetector
from step_tpu.train.fit import fit
from step_tpu.train.trainer import create_train_state
from step_tpu.utils.vis import draw_detections, write_video

CFG = StepConfig(
    dataset="synthetic",
    num_classes=3,
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
    max_gt_tubes=2,
    max_detections=4,
    compute_dtype="float32",
    batch_size=2,
    gt_jitter_proposals=1,
    warmup_steps=1,
    total_steps=4,
)

SYN = SyntheticConfig(image_size=32, num_frames=CFG.total_frames,
                      num_classes=3, max_boxes=2)


class SynDataset:
    def __init__(self, n=8):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return make_clip(i, SYN)


def test_fit_trains_checkpoints_and_resumes(tmp_path):
    ckpt = os.path.join(str(tmp_path), "ckpt")
    logs = os.path.join(str(tmp_path), "logs")
    loader = DataLoader(SynDataset(), CFG, train=True, num_workers=1)
    from step_tpu.parallel.mesh import create_mesh

    mesh = create_mesh((1,), ("data",), devices=jax.devices()[:1])
    state = fit(CFG, loader, num_epochs=1, ckpt_dir=ckpt, log_dir=logs,
                ckpt_every=2, mesh=mesh)
    assert int(state.step) == CFG.total_steps
    # metrics JSONL written
    lines = open(os.path.join(logs, "metrics.jsonl")).read().strip().splitlines()
    assert len(lines) == CFG.total_steps
    rec = json.loads(lines[-1])
    assert np.isfinite(rec["loss"]) and rec["step"] == CFG.total_steps
    # resume restores the final step and stops immediately
    state2 = fit(CFG, loader, num_epochs=1, ckpt_dir=ckpt, resume=True, mesh=mesh)
    assert int(state2.step) >= CFG.total_steps


def test_fit_resumes_mid_epoch_without_replaying_batches(tmp_path):
    """Preemption semantics: a checkpoint taken after batch k of an epoch
    resumes at batch k (deterministic order), not at the epoch start."""
    ckpt = os.path.join(str(tmp_path), "ckpt")
    logs = os.path.join(str(tmp_path), "logs")
    from step_tpu.parallel.mesh import create_mesh

    mesh = create_mesh((1,), ("data",), devices=jax.devices()[:1])
    # 8 clips / batch 2 → 4 batches per epoch; stop after 2 steps
    cfg2 = CFG.replace(total_steps=2)
    loader = DataLoader(SynDataset(), cfg2, train=True, num_workers=1)
    fit(cfg2, loader, num_epochs=1, ckpt_dir=ckpt, log_dir=logs,
        ckpt_every=1, mesh=mesh)

    # resume with a higher step budget: first consumed batch must be index 2
    cfg4 = CFG.replace(total_steps=4)
    fit(cfg4, loader, num_epochs=1, ckpt_dir=ckpt, log_dir=logs,
        ckpt_every=100, resume=True, mesh=mesh)
    recs = [json.loads(l) for l in
            open(os.path.join(logs, "metrics.jsonl")).read().splitlines()]
    resumed = [r for r in recs if r["step"] > 2]
    assert resumed and resumed[0]["batch_index"] == 2
    assert [r["batch_index"] for r in recs] == [0, 1, 2, 3]


@pytest.fixture(scope="module")
def trained_ucf(tmp_path_factory):
    """Reuse the UCF fixture machinery from test_data via a local copy."""
    from tests.test_data import ucf_root as _  # noqa: F401 (fixture import check)

    # Build a tiny UCF-format tree inline (same as test_data's fixture).
    import cv2

    root = str(tmp_path_factory.mktemp("ucfroot"))
    rng = np.random.RandomState(0)
    nframes = {"Run/v1": 8}
    H, W = 48, 64
    gttubes = {}
    for video, n in nframes.items():
        for f in range(n):
            img = (rng.rand(H, W, 3) * 128).astype(np.uint8)
            path = os.path.join(root, "rgb-images", video, f"{f + 1:05d}.jpg")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            cv2.imwrite(path, img)
        frames = np.arange(1, n + 1, dtype=np.float32)
        tube = np.stack([frames, 5 + frames, np.full_like(frames, 10),
                         20 + frames, np.full_like(frames, 30)], -1)
        gttubes[video] = {0: [tube]}
    gt = {
        "labels": ["Run", "Jump", "Wave"],
        "train_videos": [["Run/v1"]],
        "test_videos": [["Run/v1"]],
        "nframes": nframes,
        "gttubes": gttubes,
        "resolution": {v: (H, W) for v in nframes},
    }
    with open(os.path.join(root, "UCF101v2-GT.pkl"), "wb") as f:
        pickle.dump(gt, f)
    return root


def test_evaluate_ucf_pipeline(trained_ucf, tmp_path):
    from step_tpu.data.ucf import UCFDataset
    from step_tpu.evaluate import evaluate_ucf

    cfg = CFG.replace(dataset="ucf101_24", score_thresh=0.0)
    model = STEPDetector(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ds = UCFDataset(trained_ucf, cfg, split="test")
    dump = os.path.join(str(tmp_path), "dets.pkl")
    results = evaluate_ucf(variables, ds, cfg, model, dump_path=dump, max_batches=2)
    for k in ("frame_mAP@0.5", "video_mAP@0.2", "video_mAP@0.5", "video_mAP@0.5:0.95"):
        assert k in results
        assert 0.0 <= results[k] <= 1.0 or np.isnan(results[k])
    assert os.path.exists(dump)
    dets = pickle.load(open(dump, "rb"))["detections"]
    assert isinstance(dets, list)


def test_draw_and_write_video(tmp_path):
    frames = [np.random.RandomState(i).rand(32, 48, 3).astype(np.float32)
              for i in range(4)]
    boxes = np.asarray([[2, 2, 20, 20], [10, 5, 40, 30]], np.float32)
    drawn = [draw_detections(f, boxes, [0, 1], [0.9, 0.7],
                             class_names=["run", "jump"]) for f in frames]
    assert drawn[0].dtype == np.uint8 and drawn[0].shape == (32, 48, 3)
    # drawing changed pixels
    base = (np.clip(frames[0], 0, 1) * 255).astype(np.uint8)
    assert (drawn[0] != base).any()
    out = os.path.join(str(tmp_path), "out.mp4")
    write_video(out, drawn, fps=5)
    assert os.path.getsize(out) > 0


def test_debug_utilities():
    import jax.numpy as jnp

    from step_tpu.utils.debug import assert_finite_tree, checked, tree_norms

    tree = {"a": {"k": jnp.ones((3,))}, "b": {"k": jnp.zeros((2,))}}
    assert_finite_tree(tree)  # no raise
    norms = tree_norms(tree)
    assert norms["a"] == pytest.approx(np.sqrt(3.0))
    bad = {"a": {"k": jnp.asarray([1.0, np.nan])}}
    with pytest.raises(FloatingPointError):
        assert_finite_tree(bad, "bad")

    f = checked(lambda x: jnp.log(x))
    out = f(jnp.asarray([1.0]))
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(Exception):
        f(jnp.asarray([-1.0]))  # nan via log of negative


def test_metrics_logger_tensorboard(tmp_path):
    from step_tpu.train.fit import MetricsLogger

    logs = os.path.join(str(tmp_path), "logs")
    logger = MetricsLogger(logs, tensorboard=True)
    logger.log(1, {"loss": np.float32(1.5), "per_step": np.asarray([1.0, 2.0])})
    logger.close()
    assert os.path.exists(os.path.join(logs, "metrics.jsonl"))
    tb_dir = os.path.join(logs, "tb")
    if os.path.isdir(tb_dir):  # tensorflow present in this image
        assert any(os.scandir(tb_dir))


def test_fit_sigterm_checkpoints_and_resumes(tmp_path):
    """Preemption: SIGTERM mid-training writes a final checkpoint and
    returns cleanly; resume=True continues from the preempted step."""
    import signal

    ckpt = os.path.join(str(tmp_path), "ckpt")
    from step_tpu.parallel.mesh import create_mesh

    mesh = create_mesh((1,), ("data",), devices=jax.devices()[:1])
    cfg = CFG.replace(total_steps=4)

    class PreemptingDataset(SynDataset):
        """Raises SIGTERM in-process while the 3rd batch is being built."""

        def __init__(self):
            super().__init__(n=8)
            self.served = 0

        def __getitem__(self, i):
            self.served += 1
            if self.served == 5:          # batch 2 (0-indexed), first clip
                signal.raise_signal(signal.SIGTERM)
            return super().__getitem__(i)

    loader = DataLoader(PreemptingDataset(), cfg, train=True, num_workers=1,
                        prefetch=1)
    state = fit(cfg, loader, num_epochs=1, ckpt_dir=ckpt, ckpt_every=100,
                mesh=mesh)
    stopped_at = int(state.step)
    assert 0 < stopped_at < cfg.total_steps   # preempted before completion

    # handlers restored
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL,
                                                signal.default_int_handler,
                                                signal.Handlers.SIG_DFL)

    loader2 = DataLoader(SynDataset(), cfg, train=True, num_workers=1)
    state2 = fit(cfg, loader2, num_epochs=2, ckpt_dir=ckpt, resume=True,
                 mesh=mesh)
    assert int(state2.step) == cfg.total_steps


def test_evaluate_ucf_two_stream(tmp_path):
    """Two-stream (early-fusion) configs evaluate end-to-end: the flow
    stream reaches detect (evaluate used to drop batch['flow'] — the model
    then raises 'two_stream=True requires a flow input'), single-device and
    mesh-sharded paths agree."""
    from tests.test_data import _write_jpg

    from step_tpu.data.ucf import UCFDataset
    from step_tpu.evaluate import evaluate_ucf
    from step_tpu.parallel.mesh import create_mesh

    root = str(tmp_path / "ucf")
    rng = np.random.RandomState(0)
    nframes = {"Run/v1": 6, "Jump/v2": 6}
    gttubes = {}
    for video, n in nframes.items():
        for f in range(n):
            img = rng.rand(40, 48, 3) * 0.5
            _write_jpg(os.path.join(root, "rgb-images", video,
                                    f"{f + 1:05d}.jpg"), img)
            _write_jpg(os.path.join(root, "brox-images", video,
                                    f"{f + 1:05d}.jpg"), img)
        frames = np.arange(1, n + 1, dtype=np.float32)
        tube = np.stack([frames, np.full_like(frames, 10),
                         np.full_like(frames, 10),
                         np.full_like(frames, 30),
                         np.full_like(frames, 30)], -1)
        gttubes[video] = {0 if video.startswith("Run") else 1: [tube]}
    import pickle as _pickle

    with open(os.path.join(root, "UCF101v2-GT.pkl"), "wb") as f:
        _pickle.dump({"labels": ["Run", "Jump", "Wave"],
                      "train_videos": [["Run/v1"]],
                      "test_videos": [["Run/v1", "Jump/v2"]],
                      "nframes": nframes, "gttubes": gttubes,
                      "resolution": {v: (40, 48) for v in nframes}}, f)

    cfg = CFG.replace(dataset="ucf101_24", score_thresh=0.0,
                      two_stream=True)
    model = STEPDetector(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ds = UCFDataset(root, cfg, split="test", with_flow=True)

    results = evaluate_ucf(variables, ds, cfg, model)
    assert np.isfinite(results["frame_mAP@0.5"])

    mesh = create_mesh((2,), devices=jax.devices()[:2])
    results_sh = evaluate_ucf(variables, ds, cfg, model, mesh=mesh)
    assert results_sh["frame_mAP@0.5"] == pytest.approx(
        results["frame_mAP@0.5"], abs=1e-3)


def test_evaluate_ucf_late_fusion_protocol(tmp_path):
    """Dataset-level late-fusion eval (reference test-time protocol): two
    single-stream detectors, scores fused pre-NMS, driven through
    evaluate_ucf(variables_flow=...)."""
    from tests.test_data import _write_jpg

    from step_tpu.data.ucf import UCFDataset
    from step_tpu.evaluate import evaluate_ucf

    root = str(tmp_path / "ucf")
    rng = np.random.RandomState(1)
    n = 6
    for f in range(n):
        img = rng.rand(40, 48, 3) * 0.5
        _write_jpg(os.path.join(root, "rgb-images", "Run/v1",
                                f"{f + 1:05d}.jpg"), img)
        _write_jpg(os.path.join(root, "brox-images", "Run/v1",
                                f"{f + 1:05d}.jpg"), img)
    frames = np.arange(1, n + 1, dtype=np.float32)
    tube = np.stack([frames, np.full_like(frames, 10),
                     np.full_like(frames, 10), np.full_like(frames, 30),
                     np.full_like(frames, 30)], -1)
    import pickle as _pickle

    with open(os.path.join(root, "UCF101v2-GT.pkl"), "wb") as f:
        _pickle.dump({"labels": ["Run", "Jump", "Wave"],
                      "train_videos": [[]], "test_videos": [["Run/v1"]],
                      "nframes": {"Run/v1": n},
                      "gttubes": {"Run/v1": {0: [tube]}},
                      "resolution": {"Run/v1": (40, 48)}}, f)

    cfg = CFG.replace(dataset="ucf101_24", score_thresh=0.0,
                      two_stream=False, two_stream_fusion="late")
    cfg_rgb = cfg.replace(input_stream="rgb")
    cfg_flow = cfg.replace(input_stream="flow")
    sr = create_train_state(cfg_rgb, jax.random.PRNGKey(0),
                            STEPDetector(cfg_rgb))
    sf = create_train_state(cfg_flow, jax.random.PRNGKey(1),
                            STEPDetector(cfg_flow))
    v_rgb = {"params": sr.params, "batch_stats": sr.batch_stats}
    v_flow = {"params": sf.params, "batch_stats": sf.batch_stats}

    ds = UCFDataset(root, cfg, split="test", with_flow=True)
    results = evaluate_ucf(v_rgb, ds, cfg, variables_flow=v_flow)
    assert np.isfinite(results["frame_mAP@0.5"])

    # missing flow in the dataset is a clear error, not a crash deep inside
    ds_noflow = UCFDataset(root, cfg, split="test", with_flow=False)
    with pytest.raises(ValueError, match="flow-enabled dataset"):
        evaluate_ucf(v_rgb, ds_noflow, cfg, variables_flow=v_flow)


def test_evaluate_ucf_flow_stream_standalone(tmp_path):
    """A standalone flow-stream detector (input_stream='flow') evaluates:
    the flow tensor is fed as the primary input (evaluate used to always
    feed rgb into the 2-channel stem)."""
    from tests.test_data import _write_jpg

    from step_tpu.data.ucf import UCFDataset
    from step_tpu.evaluate import evaluate_ucf

    root = str(tmp_path / "ucf")
    rng = np.random.RandomState(2)
    n = 6
    for f in range(n):
        img = rng.rand(40, 48, 3) * 0.5
        _write_jpg(os.path.join(root, "rgb-images", "Run/v1",
                                f"{f + 1:05d}.jpg"), img)
        _write_jpg(os.path.join(root, "brox-images", "Run/v1",
                                f"{f + 1:05d}.jpg"), img)
    frames = np.arange(1, n + 1, dtype=np.float32)
    tube = np.stack([frames, np.full_like(frames, 10),
                     np.full_like(frames, 10), np.full_like(frames, 30),
                     np.full_like(frames, 30)], -1)
    import pickle as _pickle

    with open(os.path.join(root, "UCF101v2-GT.pkl"), "wb") as f:
        _pickle.dump({"labels": ["Run", "Jump", "Wave"],
                      "train_videos": [[]], "test_videos": [["Run/v1"]],
                      "nframes": {"Run/v1": n},
                      "gttubes": {"Run/v1": {0: [tube]}},
                      "resolution": {"Run/v1": (40, 48)}}, f)

    cfg = CFG.replace(dataset="ucf101_24", score_thresh=0.0,
                      two_stream=False, input_stream="flow")
    model = STEPDetector(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ds = UCFDataset(root, cfg, split="test", with_flow=True)
    results = evaluate_ucf(variables, ds, cfg, model)
    assert np.isfinite(results["frame_mAP@0.5"])


def test_evaluate_ava_rejects_two_stream():
    from step_tpu.evaluate import evaluate_ava

    cfg = CFG.replace(dataset="ava", two_stream=True, multilabel=True)
    with pytest.raises(ValueError, match="RGB-only"):
        evaluate_ava({}, None, cfg)


def test_evaluate_ucf_device_linking(trained_ucf):
    """The on-device K-tube linker drives video-mAP end-to-end through
    evaluate_ucf (BASELINE north star: cross-clip linking on device)."""
    from step_tpu.data.ucf import UCFDataset
    from step_tpu.evaluate import collect_video_tubes, evaluate_ucf

    cfg = CFG.replace(dataset="ucf101_24", score_thresh=0.0,
                      link_tubes_per_class=2)
    model = STEPDetector(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ds = UCFDataset(trained_ucf, cfg, split="test")

    tubes = collect_video_tubes(variables, ds, cfg, model, clip_batch=4)
    assert isinstance(tubes, list)
    for video, c, score, frames in tubes:
        assert video == "Run/v1" and 0 <= c < cfg.num_classes
        assert np.isfinite(score)
        assert all(isinstance(f, int) and f >= 1 for f in frames)
        # owned central-chunk frames tile the video without duplicates
        assert len(frames) >= 2

    results = evaluate_ucf(variables, ds, cfg, model, device_linking=True)
    for k in ("frame_mAP@0.5", "video_mAP@0.2", "video_mAP@0.5"):
        assert k in results
        assert (0.0 <= results[k] <= 1.0) or np.isnan(results[k])
