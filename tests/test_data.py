"""Dataset loaders against generated on-disk fixtures (UCF pkl / AVA csv)."""

import os
import pickle

import numpy as np
import pytest

from step_tpu.config import StepConfig
from step_tpu.data.augmentations import TubeAugment, TubeAugmentConfig, resize_clip
from step_tpu.data.ava import AVADataset, read_ava_csv
from step_tpu.data.loader import DataLoader
from step_tpu.data.ucf import UCFDataset

CFG = StepConfig(
    dataset="ucf101_24",
    num_classes=3,
    frames_per_chunk=2,
    num_chunks=3,
    num_steps=3,
    temporal_extension=True,
    image_size=32,
    backbone_depth="tiny",
    feature_stride=8,
    pooled_size=4,
    max_proposals=14,
    max_gt_tubes=3,
    batch_size=2,
    gt_jitter_proposals=2,
)


def _write_jpg(path, arr):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor((arr * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))


@pytest.fixture(scope="module")
def ucf_root(tmp_path_factory):
    """Two tiny videos in the standard UCF101-24 layout."""
    root = str(tmp_path_factory.mktemp("ucf"))
    rng = np.random.RandomState(0)
    nframes = {"Run/v1": 10, "Jump/v2": 8}
    gttubes = {}
    H, W = 48, 64
    for video, n in nframes.items():
        for f in range(n):
            _write_jpg(
                os.path.join(root, "rgb-images", video, f"{f + 1:05d}.jpg"),
                rng.rand(H, W, 3) * 0.5,
            )
            _write_jpg(
                os.path.join(root, "brox-images", video, f"{f + 1:05d}.jpg"),
                rng.rand(H, W, 3) * 0.5,
            )
        # one GT tube spanning all frames, moving right
        frames = np.arange(1, n + 1, dtype=np.float32)
        x1 = 5 + frames
        tube = np.stack([frames, x1, np.full_like(x1, 10), x1 + 15, np.full_like(x1, 30)], -1)
        cls = 0 if video.startswith("Run") else 1
        gttubes[video] = {cls: [tube]}
    gt = {
        "labels": ["Run", "Jump", "Wave"],
        "train_videos": [["Run/v1"]],
        "test_videos": [["Jump/v2"]],
        "nframes": nframes,
        "gttubes": gttubes,
        "resolution": {v: (H, W) for v in nframes},
    }
    with open(os.path.join(root, "UCF101v2-GT.pkl"), "wb") as f:
        pickle.dump(gt, f)
    return root


def test_ucf_dataset_basic(ucf_root):
    ds = UCFDataset(ucf_root, CFG, split="train")
    assert len(ds) > 0
    item = ds[0]
    T = CFG.total_frames
    assert item["rgb"].shape == (T, 32, 32, 3)
    assert item["gt_tubes"].shape == (CFG.max_gt_tubes, T, 4)
    assert item["gt_mask"].sum() == 1
    assert item["gt_labels"][0] == 0
    assert 0 <= item["rgb"].min() and item["rgb"].max() <= 1
    # GT scaled into the model resolution
    assert item["gt_tubes"][0].max() <= 32


def test_ucf_dataset_flow_and_split(ucf_root):
    ds = UCFDataset(ucf_root, CFG, split="test", with_flow=True)
    item = ds[0]
    assert item["flow"].shape == (CFG.total_frames, 32, 32, 2)
    assert item["flow"].min() >= -1.01 and item["flow"].max() <= 1.01
    assert item["gt_labels"][0] == 1  # Jump


def test_ucf_edge_clamping(ucf_root):
    ds = UCFDataset(ucf_root, CFG, split="train")
    idx = ds.clip_frame_indices("Run/v1", 0)  # center at first frame
    assert idx.min() == 0 and idx.max() < 10
    assert len(idx) == CFG.total_frames


def test_ucf_orphan_short_tube_is_supervised(tmp_path):
    # A GT tube whose annotated frames miss EVERY clip center (short action
    # between centers) must still supervise exactly one clip — the one
    # whose center is nearest its span — instead of silently vanishing
    # from training while video_groundtruth still counts it at eval.
    n = 20
    # fpc=2 -> clip centers are the odd 0-based frames; a single-frame tube
    # at an even 0-based index (1-based 5) covers no center
    frames = np.asarray([5.0])
    tube = np.stack([frames,
                     np.full_like(frames, 5.0), np.full_like(frames, 10.0),
                     np.full_like(frames, 20.0), np.full_like(frames, 30.0)],
                    axis=-1)
    gt = {
        "labels": ["Run", "Jump", "Wave"],
        "train_videos": [["Run/v1"]],
        "test_videos": [["Run/v1"]],
        "nframes": {"Run/v1": n},
        "gttubes": {"Run/v1": {0: [tube]}},
        "resolution": {"Run/v1": (48, 64)},
    }
    with open(os.path.join(tmp_path, "UCF101v2-GT.pkl"), "wb") as f:
        pickle.dump(gt, f)
    ds = UCFDataset(str(tmp_path), CFG, split="train")
    centers = [c for v, c in ds.samples]
    assert all(int(c) + 1 not in frames for c in centers)  # truly orphaned
    masks = []
    for c in centers:
        fi = ds.clip_frame_indices("Run/v1", c)
        _, labels, mask = ds._gt_for_frames("Run/v1", fi)
        masks.append(float(mask.sum()))
    assert sum(masks) == 1.0                     # exactly one clip owns it
    med = float(np.median(frames - 1))
    nearest = int(np.argmin([abs(c - med) for c in centers]))
    assert masks[nearest] == 1.0
    _, tube_gt = ds.video_groundtruth()
    assert len(tube_gt) == 1                     # eval still counts it


def test_ucf_orphan_short_video_clamped_center(tmp_path):
    # Videos shorter than frames_per_chunk//2 + 1: the nominal clip center
    # exceeds nframes-1, and _gt_for_frames compares the edge-CLAMPED
    # center — the orphan designation must use the same effective center
    # or such videos lose ALL supervision.
    import dataclasses

    cfg8 = dataclasses.replace(CFG, frames_per_chunk=8)
    n = 3
    frames = np.asarray([1.0, 2.0])              # 1-based; 0-based {0,1}
    tube = np.stack([frames,
                     np.full_like(frames, 5.0), np.full_like(frames, 10.0),
                     np.full_like(frames, 20.0), np.full_like(frames, 30.0)],
                    axis=-1)
    gt = {
        "labels": ["Run", "Jump", "Wave"],
        "train_videos": [["Run/v1"]],
        "test_videos": [["Run/v1"]],
        "nframes": {"Run/v1": n},
        "gttubes": {"Run/v1": {0: [tube]}},
        "resolution": {"Run/v1": (48, 64)},
    }
    with open(os.path.join(tmp_path, "UCF101v2-GT.pkl"), "wb") as f:
        pickle.dump(gt, f)
    ds = UCFDataset(str(tmp_path), cfg8, split="train")
    assert len(ds.samples) == 1                  # one clip, nominal center 4
    v, c = ds.samples[0]
    fi = ds.clip_frame_indices(v, c)
    _, _, mask = ds._gt_for_frames(v, fi)
    assert mask.sum() == 1.0                     # clamped-center clip owns it


def test_ucf_video_groundtruth(ucf_root):
    ds = UCFDataset(ucf_root, CFG, split="train")
    frame_gt, tube_gt = ds.video_groundtruth()
    assert len(tube_gt) == 1
    assert len(frame_gt) == 10


def test_dataloader_batches(ucf_root):
    ds = UCFDataset(ucf_root, CFG, split="train")
    dl = DataLoader(ds, CFG, batch_size=2, train=True, num_workers=1)
    batches = list(dl.epoch(0))
    assert len(batches) == len(ds) // 2
    b = batches[0]
    assert b["rgb"].shape == (2, CFG.total_frames, 32, 32, 3)
    assert b["proposals"].shape == (2, CFG.max_proposals, CFG.total_frames, 4)
    assert len(b["meta"]) == 2
    # deterministic across epochs with same seed
    b2 = next(iter(DataLoader(ds, CFG, batch_size=2, train=True, num_workers=1).epoch(0)))
    np.testing.assert_allclose(b["rgb"], b2["rgb"])


@pytest.fixture(scope="module")
def ava_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ava"))
    rng = np.random.RandomState(1)
    video, fps = "vidA", 5
    for fn in range(1, 40):
        _write_jpg(
            os.path.join(root, "frames", video, f"{video}_{fn:06d}.jpg"),
            rng.rand(40, 56, 3) * 0.5,
        )
    rows = [
        # person 1 with two actions at t=3
        f"{video},3,0.1,0.2,0.5,0.9,1,1",
        f"{video},3,0.1,0.2,0.5,0.9,4,1",
        # person 2 with one action
        f"{video},3,0.6,0.1,0.9,0.7,2,2",
        # another keyframe
        f"{video},5,0.2,0.2,0.4,0.8,3,1",
    ]
    with open(os.path.join(root, "ava_train.csv"), "w") as f:
        f.write("\n".join(rows))
    return root


def test_read_ava_csv(ava_root):
    ann = read_ava_csv(os.path.join(ava_root, "ava_train.csv"))
    assert ("vidA", 3.0) in ann and ("vidA", 5.0) in ann
    assert len(ann[("vidA", 3.0)]) == 3


def test_ava_dataset_multihot(ava_root):
    cfg = CFG.replace(dataset="ava", num_classes=6, multilabel=True)
    ds = AVADataset(ava_root, cfg, "ava_train.csv", fps=5)
    assert len(ds) == 2
    item = ds[0]
    assert item["rgb"].shape == (cfg.total_frames, 32, 32, 3)
    assert item["gt_labels"].shape == (cfg.max_gt_tubes, 6)
    # person 1: actions 1&4 (1-based) → classes 0 and 3 multi-hot
    assert item["gt_mask"].sum() == 2
    p1 = item["gt_labels"][0]
    assert p1[0] == 1.0 and p1[3] == 1.0 and p1.sum() == 2.0


def test_ava_excluded_keyframes(ava_root):
    cfg = CFG.replace(dataset="ava", num_classes=6, multilabel=True)
    ds = AVADataset(ava_root, cfg, "ava_train.csv", fps=5,
                    excluded_keyframes={("vidA", 5.0)})
    assert len(ds) == 1


def test_augmentations_keep_tubes_consistent():
    rng = np.random.RandomState(0)
    T, H, W = 4, 40, 60
    frames = rng.rand(T, H, W, 3).astype(np.float32)
    tubes = np.tile(np.asarray([10, 10, 30, 30], np.float32), (2, T, 1))
    mask = np.asarray([1.0, 0.0])
    aug = TubeAugment(TubeAugmentConfig(hflip_prob=1.0, photometric_prob=1.0,
                                        expand_prob=1.0, crop_prob=1.0))
    out_f, out_t, out_m = aug(frames, tubes, mask, rng)
    assert out_f.ndim == 4 and out_f.shape[0] == T
    assert out_t.shape == tubes.shape
    assert np.isfinite(out_t).all()
    assert out_f.min() >= 0 and out_f.max() <= 1


def test_augment_keeps_flow_registered_with_rgb():
    """Geometric transforms must move flow exactly like RGB; hflip must also
    negate flow-x (a mirrored scene moves the other way)."""
    rng = np.random.RandomState(3)
    T, H, W = 2, 40, 60
    frames = np.zeros((T, H, W, 3), np.float32)
    flow = np.zeros((T, H, W, 2), np.float32)
    # a marker blob co-located in both streams, with flow-x = +0.5
    frames[:, 10:14, 20:24] = 1.0
    flow[:, 10:14, 20:24, 0] = 0.5
    tubes = np.tile(np.asarray([18, 8, 26, 16], np.float32), (1, T, 1))
    mask = np.asarray([1.0])

    aug = TubeAugment(TubeAugmentConfig(hflip_prob=1.0, photometric_prob=0.0,
                                        expand_prob=1.0, crop_prob=1.0,
                                        crop_min_overlap=0.1))
    out_f, out_t, out_m, out_flow = aug(frames, tubes, mask, rng, flow=flow)
    assert out_f.shape[:3] == out_flow.shape[:3]
    # marker pixels coincide after expand+crop+flip
    rgb_hot = out_f[0, :, :, 0] > 0.5
    flow_hot = np.abs(out_flow[0, :, :, 0]) > 0.25
    assert rgb_hot.any()
    np.testing.assert_array_equal(rgb_hot, flow_hot)
    # hflip negated the x component
    assert out_flow[0, :, :, 0][flow_hot].max() <= -0.25 + 1e-6

    # without flow the same rng seed yields the same RGB/tubes (draw-order
    # invariance)
    rng2 = np.random.RandomState(3)
    out_f2, out_t2, _ = aug(frames, tubes, mask, rng2)
    np.testing.assert_allclose(out_f, out_f2)
    np.testing.assert_allclose(out_t, out_t2)


def test_resize_clip_scales_boxes():
    frames = np.zeros((2, 40, 80, 3), np.float32)
    tubes = np.asarray([[[8, 4, 16, 8], [8, 4, 16, 8]]], np.float32)
    out_f, out_t = resize_clip(frames, tubes, 32)
    assert out_f.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(out_t[0, 0], [8 * 0.4, 4 * 0.8, 16 * 0.4, 8 * 0.8])


def test_native_loader_matches_python_path(ucf_root):
    """C++ clip loader vs the cv2 path on the same dataset item."""
    from step_tpu.data import native_loader

    if not native_loader.native_available():
        pytest.skip("native loader not built in this environment")
    ds_native = UCFDataset(ucf_root, CFG, split="test", use_native=True)
    ds_python = UCFDataset(ucf_root, CFG, split="test", use_native=False)
    a, b = ds_native[0], ds_python[0]
    assert a["rgb"].shape == b["rgb"].shape
    # same decode + bilinear resize semantics (tiny numeric slack)
    assert np.abs(a["rgb"] - b["rgb"]).max() < 2e-2
    np.testing.assert_allclose(a["gt_tubes"], b["gt_tubes"], atol=1e-3)
    np.testing.assert_array_equal(a["gt_mask"], b["gt_mask"])


def test_native_loader_missing_file_error():
    from step_tpu.data import native_loader

    if not native_loader.native_available():
        pytest.skip("native loader not built in this environment")
    with pytest.raises(FileNotFoundError):
        native_loader.decode_clip(["/nonexistent/frame.jpg"], 32)


def test_dataloader_propagates_worker_errors():
    class Exploding:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("decode failed")

    dl = DataLoader(Exploding(), CFG, batch_size=2, train=False, num_workers=1)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(dl.epoch(0))


def test_loader_uint8_transfer_default():
    """DataLoader ships rgb as uint8 by default (cfg.uint8_transfer) — the
    4x host->device bandwidth saving — and as float32 when disabled; the
    uint8 batch is the exact 1/255 quantization of the float batch."""
    from step_tpu.config import StepConfig
    from step_tpu.data.loader import DataLoader
    from step_tpu.data.synthetic import SyntheticConfig, make_clip

    cfg = StepConfig(dataset="synthetic", num_classes=3, frames_per_chunk=2,
                     num_chunks=1, num_steps=1, iou_thresholds=(0.4,),
                     step_loss_weights=(1.0,), temporal_extension=False,
                     image_size=32, backbone_depth="tiny", feature_stride=8,
                     max_gt_tubes=2, batch_size=2)
    assert cfg.uint8_transfer
    syn = SyntheticConfig(image_size=32, num_frames=2, num_classes=3,
                          max_boxes=2)

    class _DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return make_clip(i, syn)

    # train=False: no augmentation, so the two loaders see identical pixels
    b_u8 = next(iter(DataLoader(_DS(), cfg, batch_size=2, train=False,
                                shuffle=False, num_workers=1)))
    b_f32 = next(iter(DataLoader(_DS(), cfg, batch_size=2, train=False,
                                 shuffle=False, num_workers=1,
                                 emit_uint8=False)))
    assert b_u8["rgb"].dtype == np.uint8
    assert b_f32["rgb"].dtype == np.float32
    np.testing.assert_allclose(
        b_u8["rgb"].astype(np.float32) / 255.0, b_f32["rgb"],
        atol=0.5 / 255.0)
    # non-rgb keys stay float regardless
    for k in ("proposals", "prop_mask", "gt_tubes", "gt_mask"):
        assert b_u8[k].dtype == np.float32


def test_loader_int8_flow_transfer():
    """uint8_transfer ships flow as int8 (near-lossless for JPEG-sourced
    flow); device_preprocess_flow dequantizes back within 1/254."""
    from step_tpu.data.pipeline import build_model_batch
    from step_tpu.preprocess import device_preprocess_flow

    rng = np.random.RandomState(0)
    # flow as it comes from uint8 flow images: quantized at 1/127.5
    u8 = rng.randint(0, 256, (1, 4, 8, 8, 2)).astype(np.float32)
    flow = u8 / 255.0 * 2.0 - 1.0
    raw = {
        "rgb": rng.rand(1, 4, 8, 8, 3).astype(np.float32),
        "flow": flow,
        "gt_tubes": np.zeros((1, 2, 4, 4), np.float32),
        "gt_labels": np.zeros((1, 2), np.int32),
        "gt_mask": np.zeros((1, 2), np.float32),
    }
    cfg = StepConfig(dataset="synthetic", num_classes=4, frames_per_chunk=4,
                     num_chunks=1, num_steps=1, iou_thresholds=(0.5,),
                     step_loss_weights=(1.0,), temporal_extension=False,
                     image_size=8, max_gt_tubes=2)
    import jax.numpy as jnp

    b = build_model_batch(raw, cfg, emit_uint8=True)
    assert b["flow"].dtype == np.int8
    deq = np.asarray(device_preprocess_flow(jnp.asarray(b["flow"])))
    np.testing.assert_allclose(deq, flow, atol=1.0 / 254.0 + 1e-6)
    # f32 path untouched
    b32 = build_model_batch(raw, cfg, emit_uint8=False)
    assert b32["flow"].dtype == np.float32


def test_ava_native_loader_matches_python_path(ava_root):
    """AVA clips decoded by the C++ loader match the python cv2 path (the
    UCF parity guarantee, extended to AVA in round 3)."""
    from step_tpu.data import native_loader

    if not native_loader.native_available():
        pytest.skip("native loader not built")
    cfg = CFG.replace(dataset="ava", multilabel=True, num_classes=3)
    ds_nat = AVADataset(ava_root, cfg, "ava_train.csv", fps=5, use_native=True)
    ds_py = AVADataset(ava_root, cfg, "ava_train.csv", fps=5, use_native=False)
    a, b = ds_nat[0], ds_py[0]
    assert a["rgb"].shape == b["rgb"].shape
    np.testing.assert_allclose(a["rgb"], b["rgb"], atol=2e-2)
    np.testing.assert_allclose(a["gt_tubes"], b["gt_tubes"], atol=1e-3)
    np.testing.assert_array_equal(a["gt_labels"], b["gt_labels"])


def test_augmentation_redraws_per_epoch(ucf_root):
    """Augmentation RNG is epoch-salted: the same sample gets a fresh draw
    each epoch (the torch DataLoader behavior) while staying deterministic
    within an epoch."""
    ds = UCFDataset(ucf_root, CFG, split="train", augment=True)
    ds._epoch = 0
    a0 = ds[0]["rgb"].copy()
    a0_again = ds[0]["rgb"]
    np.testing.assert_array_equal(a0, a0_again)   # deterministic per epoch
    ds._epoch = 1
    a1 = ds[0]["rgb"]
    assert not np.array_equal(a0, a1)             # new epoch, new draw

    # DataLoader.epoch() wires the salt
    from step_tpu.data.loader import DataLoader

    loader = DataLoader(ds, CFG, batch_size=1, shuffle=False, num_workers=1,
                        drop_last=False)
    next(loader.epoch(3))
    assert ds._epoch == 3


def test_loader_producer_exits_on_abandoned_epoch(ucf_root):
    """Abandoning the epoch iterator (max_batches-style early break) must
    release the producer thread — a blocking q.put on the full prefetch
    queue used to pin it (plus its prefetched batches) forever."""
    import threading
    import time as _time

    from step_tpu.data.loader import DataLoader

    ds = UCFDataset(ucf_root, CFG, split="train")
    before = threading.active_count()
    loader = DataLoader(ds, CFG, batch_size=1, shuffle=False, num_workers=1,
                        prefetch=1, drop_last=False)
    gen = loader.epoch(0)
    next(gen)          # producer now blocks on the full prefetch queue
    gen.close()        # abandon: generator finally sets the stop event
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_synthetic_same_class_actors():
    """same_class_actors: always max_boxes actors, one shared class, and
    per-frame IoU between actors stays below the separation bound (best
    effort — assert the typical case over several seeds)."""
    from step_tpu.data.synthetic import SyntheticConfig, make_clip

    cfg = SyntheticConfig(image_size=64, num_frames=6, num_classes=4,
                          max_boxes=2, same_class_actors=True)
    seen_overlapping_ok = 0
    for seed in range(8):
        clip = make_clip(seed, cfg)
        assert clip["gt_mask"].sum() == 2                  # always 2 actors
        assert clip["gt_labels"][0] == clip["gt_labels"][1]  # same class
        a, b = clip["gt_tubes"][0], clip["gt_tubes"][1]
        lt = np.maximum(a[:, :2], b[:, :2])
        rb = np.minimum(a[:, 2:], b[:, 2:])
        inter = np.prod(np.clip(rb - lt, 0, None), axis=1)
        area = lambda x: np.prod(x[:, 2:] - x[:, :2], axis=1)
        iou = inter / np.maximum(area(a) + area(b) - inter, 1e-6)
        if iou.mean() < 0.3:
            seen_overlapping_ok += 1
    assert seen_overlapping_ok >= 6   # resampling keeps actors separable


def test_synthetic_default_stream_unchanged_by_same_class_flag():
    """The default config's rng draw order must be untouched by the
    same_class_actors feature (golden forward tests depend on it) — the
    fingerprint below was captured from the pre-feature implementation."""
    from step_tpu.data.synthetic import SyntheticConfig, make_clip

    cfg = SyntheticConfig(image_size=32, num_frames=4, num_classes=3,
                          max_boxes=2)
    c = make_clip(5, cfg)
    assert float(c["rgb"].astype(np.float64).sum()) == pytest.approx(
        4144.192923530936, abs=1e-6)
    assert float(c["gt_tubes"].astype(np.float64).sum()) == pytest.approx(
        299.4209622144699, abs=1e-9)
    assert c["gt_labels"].tolist() == [0, 0]
