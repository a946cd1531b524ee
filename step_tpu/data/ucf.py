"""UCF101-24 dataset (frame JPEGs + corrected-annotation pickle).

Reference parity: ``data/customize.py`` / UCF dataset (recon). Consumes the
standard UCF101-24 layout used across the action-detection literature
(ACT/MOC/STEP all share it):

  <root>/rgb-images/<ClassName>/<video>/{%05d}.jpg      (1-indexed frames)
  <root>/brox-images/...                                 (optical flow, opt.)
  <root>/UCF101v2-GT.pkl  — pickle with keys:
      'labels'        list[str] 24 class names
      'train_videos'  [list[video]] per split
      'test_videos'   [list[video]] per split
      'nframes'       {video: int}
      'gttubes'       {video: {class_idx: [ndarray [n, 5] (frame,x1,y1,x2,y2)]}}
      'resolution'    {video: (H, W)}

Emits fixed-shape clip dicts (rgb [T,H,W,3] float [0,1], gt_tubes [G,T,4]
pixel coords at the model resolution, gt_labels [G], gt_mask [G]) where
T = frames_per_chunk * num_chunks centered on a sampled keyframe; frame
indices are edge-clamped at video boundaries (the reference loads neighbor
chunks the same way).
"""

from __future__ import annotations

import os
import pickle
import zlib
from typing import Optional

import numpy as np

from step_tpu.config import StepConfig
from step_tpu.data.augmentations import TubeAugment, resize_clip


def _load_image(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


class UCFDataset:
    """Clip sampler over UCF101-24 (or any dataset in the same format)."""

    def __init__(
        self,
        root: str,
        cfg: StepConfig,
        split: str = "train",
        annotation_file: str = "UCF101v2-GT.pkl",
        clip_stride: Optional[int] = None,
        augment: bool = False,
        with_flow: bool = False,
        use_native: bool = True,
    ):
        self.root = root
        self.cfg = cfg
        self.split = split
        self.augment = TubeAugment() if augment else None
        self.with_flow = with_flow
        # The native C++ loader decodes straight to the model resolution, so
        # it only serves the un-augmented path (augmentation crops/expands at
        # native resolution first).
        self.use_native = use_native and not augment

        with open(os.path.join(root, annotation_file), "rb") as f:
            gt = pickle.load(f, encoding="latin1")
        self.labels = gt["labels"]
        self.nframes = gt["nframes"]
        self.gttubes = gt["gttubes"]
        self.resolution = gt.get("resolution", {})
        videos = gt["train_videos"][0] if split == "train" else gt["test_videos"][0]
        self.videos = list(videos)

        # keyframe samples: slide a window of frames_per_chunk over each video
        stride = clip_stride or cfg.frames_per_chunk
        T_c = cfg.frames_per_chunk
        self.samples = []
        self._centers_by_video: dict = {}
        for v in self.videos:
            n = self.nframes[v]
            centers = []
            for start in range(0, max(n - T_c + 1, 1), stride):
                centers.append(start + T_c // 2)            # center frame (0-based)
                self.samples.append((v, centers[-1]))
            self._centers_by_video[v] = np.asarray(centers)
        self._orphan_owner_cache: dict = {}

    def __len__(self):
        return len(self.samples)

    # ------------------------------------------------------------- frames
    def _frame_path(self, video: str, idx0: int) -> str:
        return os.path.join(self.root, "rgb-images", video, f"{idx0 + 1:05d}.jpg")

    def _flow_path(self, video: str, idx0: int) -> str:
        return os.path.join(self.root, "brox-images", video, f"{idx0 + 1:05d}.jpg")

    def clip_frame_indices(self, video: str, center: int) -> np.ndarray:
        """T edge-clamped 0-based frame indices spanning all chunks,
        sampled every `temporal_stride` frames around the center."""
        cfg = self.cfg
        T = cfg.total_frames
        offsets = (np.arange(T) - T // 2) * cfg.temporal_stride
        return np.clip(center + offsets, 0, self.nframes[video] - 1)

    def _orphan_owners(self, video: str) -> dict:
        """{(cls, tube_idx): designated center} for GT tubes covering NO
        sampled clip center of their video.

        The central-coverage rule in `_gt_for_frames` would otherwise drop
        a short tube that lives between clip centers (or after the last
        one) from EVERY clip's supervision — while `video_groundtruth`
        still emits it, making it a guaranteed eval miss. Such orphans are
        claimed by the clip whose center is nearest the tube's median
        annotated frame."""
        if video not in self._orphan_owner_cache:
            centers = self._centers_by_video.get(video)
            owners = {}
            if centers is not None and len(centers):
                # EFFECTIVE centers: `_gt_for_frames` compares against
                # frame_idx[T//2], which is edge-clamped — for a video
                # shorter than frames_per_chunk//2 + 1 the nominal center
                # exceeds nframes-1 and would never match
                centers = np.minimum(centers, self.nframes[video] - 1)
                for cls, tubes in self.gttubes.get(video, {}).items():
                    for ti, tube in enumerate(tubes):
                        frames0 = tube[:, 0].astype(np.int64) - 1
                        covered = set(int(f) for f in frames0)
                        if not covered.intersection(int(c) for c in centers):
                            med = float(np.median(frames0))
                            owners[(cls, ti)] = int(
                                centers[np.argmin(np.abs(centers - med))])
            self._orphan_owner_cache[video] = owners
        return self._orphan_owner_cache[video]

    def _gt_for_frames(self, video: str, frame_idx: np.ndarray):
        """GT tubes restricted to the clip's frames (edge frames clamp to the
        tube's nearest annotated frame if the tube covers the clamped index)."""
        cfg = self.cfg
        G, T = cfg.max_gt_tubes, len(frame_idx)
        gt_tubes = np.zeros((G, T, 4), np.float32)
        gt_labels = np.zeros((G,), np.int32)
        gt_mask = np.zeros((G,), np.float32)
        g = 0
        orphan_owners = self._orphan_owners(video)
        center = int(frame_idx[T // 2])
        for cls, tubes in self.gttubes.get(video, {}).items():
            for ti, tube in enumerate(tubes):
                frames = tube[:, 0].astype(np.int64) - 1  # annotations 1-based
                lookup = {int(f): tube[i, 1:5] for i, f in enumerate(frames)}
                # tube must cover the central frame of the clip — a tube
                # that only grazes the clip edge would otherwise supervise
                # the whole window with stale nearest-frame replicas of a
                # box where the actor no longer is. Exception: a tube that
                # covers NO clip's center (short action between centers)
                # is supervised from its designated nearest clip.
                if (center not in lookup
                        and orphan_owners.get((cls, ti)) != center):
                    continue
                boxes = np.zeros((T, 4), np.float32)
                for t, f in enumerate(frame_idx):
                    if int(f) in lookup:
                        boxes[t] = lookup[int(f)]
                    else:
                        # clamp to the tube's nearest annotated frame
                        nearest = int(frames[np.argmin(np.abs(frames - f))])
                        boxes[t] = lookup[nearest]
                if g < G:
                    gt_tubes[g] = boxes
                    gt_labels[g] = cls
                    gt_mask[g] = 1.0
                    g += 1
        return gt_tubes, gt_labels, gt_mask

    # ------------------------------------------------------------- access
    def _load_clip_native(self, video: str, frame_idx: np.ndarray):
        """Decode+resize via the C++ loader; returns None if unavailable."""
        from step_tpu.data import native_loader

        if not native_loader.native_available():
            return None
        paths = [self._frame_path(video, int(f)) for f in frame_idx]
        zero = np.zeros(3, np.float32)
        one = np.ones(3, np.float32)
        # mean 0 / std 1 → plain [0,1] pixels; normalization happens later in
        # build_model_batch like the python path.
        return native_loader.decode_clip(paths, self.cfg.image_size, zero, one)

    def __getitem__(self, i: int) -> dict:
        video, center = self.samples[i]
        cfg = self.cfg
        frame_idx = self.clip_frame_indices(video, center)
        gt_tubes, gt_labels, gt_mask = self._gt_for_frames(video, frame_idx)

        # The native loader needs the pkl's resolution entry to scale GT
        # (its frames are already resized to image_size, so falling back to
        # frames.shape would silently leave GT in native pixels); without
        # one, take the python path, which measures the decoded frame size.
        if self.use_native and not self.with_flow and video in self.resolution:
            frames = self._load_clip_native(video, frame_idx)
            if frames is not None:
                H, W = self.resolution[video]
                s = np.asarray(
                    [cfg.image_size / W, cfg.image_size / H] * 2, np.float32
                )
                gt_scaled = np.clip(gt_tubes * s, 0, cfg.image_size)
                return {
                    "rgb": frames,
                    "gt_tubes": gt_scaled.astype(np.float32),
                    "gt_labels": gt_labels,
                    "gt_mask": gt_mask,
                    "video": video,
                    "center_frame": center,
                    "frame_indices": frame_idx,
                }

        frames = np.stack([_load_image(self._frame_path(video, int(f))) for f in frame_idx])

        flow = None
        if self.with_flow:
            flow_imgs = np.stack(
                [_load_image(self._flow_path(video, int(f))) for f in frame_idx]
            )
            flow = flow_imgs[..., :2] * 2.0 - 1.0  # [0,1] → [-1,1], (x, y)

        if self.augment is not None:
            # epoch-salted so each epoch redraws fresh augmentations (the
            # torch DataLoader's behavior); DataLoader.epoch sets _epoch
            ep = getattr(self, "_epoch", 0)
            rng = np.random.RandomState(
                zlib.crc32(f"{video}:{center}:{ep}".encode()))
            if flow is not None:
                frames, gt_tubes, gt_mask, flow = self.augment(
                    frames, gt_tubes, gt_mask, rng, flow=flow
                )
            else:
                frames, gt_tubes, gt_mask = self.augment(frames, gt_tubes, gt_mask, rng)

        frames, gt_tubes = resize_clip(frames, gt_tubes, cfg.image_size)
        gt_tubes = np.clip(gt_tubes, 0, cfg.image_size)
        out = {
            "rgb": frames.astype(np.float32),
            "gt_tubes": gt_tubes.astype(np.float32),
            "gt_labels": gt_labels,
            "gt_mask": gt_mask,
            "video": video,
            "center_frame": center,
            "frame_indices": frame_idx,
        }
        if flow is not None:
            flow_r, _ = resize_clip(flow, np.zeros((0, len(frame_idx), 4), np.float32),
                                    cfg.image_size)
            out["flow"] = flow_r.astype(np.float32)
        return out

    # --------------------------------------------------------- video eval
    def video_groundtruth(self):
        """GT in evaluator format: frame-level and tube-level (see eval/)."""
        frame_gt, tube_gt = [], []
        for v in self.videos:
            for cls, tubes in self.gttubes.get(v, {}).items():
                for tube in tubes:
                    tube_dict = {}
                    for row in tube:
                        f = int(row[0])
                        box = row[1:5].astype(np.float32)
                        frame_gt.append(((v, f), int(cls), box))
                        tube_dict[f] = box
                    tube_gt.append((v, int(cls), tube_dict))
        return frame_gt, tube_gt
