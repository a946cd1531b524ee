#!/usr/bin/env python
"""Precompute optical flow for the two-stream pipeline.

Reference parity: the reference consumes flow frames computed offline
(TV-L1 style, not in-repo — SURVEY §2.1 "Optical flow stream"). This script
is the missing tool: it walks a UCF-style `rgb-images/` tree and writes a
parallel `brox-images/` tree where each JPEG encodes (flow_x, flow_y,
magnitude) in RGB, normalized to [0, 255] around 128 — the standard storage
convention the loaders expect (`UCFDataset(with_flow=True)` reads channels
0..1 and maps [0,1] → [-1,1]).

Uses OpenCV's DIS optical flow (main cv2; TV-L1 lives in contrib which is
not installed here). Flow fields are clipped to ±bound pixels.

Usage:
  python scripts/compute_flow.py --root /data/ucf24 [--bound 20]
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import argparse
import os

import cv2
import numpy as np


def flow_to_image(flow: np.ndarray, bound: float) -> np.ndarray:
    """[H, W, 2] float flow → [H, W, 3] uint8 (x, y, magnitude)."""
    clipped = np.clip(flow, -bound, bound)
    xy = ((clipped + bound) / (2 * bound) * 255.0).astype(np.uint8)
    mag = np.linalg.norm(clipped, axis=-1)
    mag = np.clip(mag / bound * 255.0, 0, 255).astype(np.uint8)
    return np.concatenate([xy, mag[..., None]], axis=-1)


def compute_video_flow(rgb_dir: str, out_dir: str, bound: float):
    frames = sorted(f for f in os.listdir(rgb_dir) if f.endswith(".jpg"))
    if not frames:
        return 0
    os.makedirs(out_dir, exist_ok=True)
    dis = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)
    prev = cv2.cvtColor(cv2.imread(os.path.join(rgb_dir, frames[0])), cv2.COLOR_BGR2GRAY)
    n = 0
    for i, name in enumerate(frames):
        cur = cv2.cvtColor(cv2.imread(os.path.join(rgb_dir, name)), cv2.COLOR_BGR2GRAY)
        flow = dis.calc(prev, cur, None)  # frame i-1 → i (first frame: zero-ish)
        img = flow_to_image(flow, bound)
        cv2.imwrite(os.path.join(out_dir, name), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        prev = cur
        n += 1
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="dataset root with rgb-images/")
    p.add_argument("--out-name", default="brox-images")
    p.add_argument("--bound", type=float, default=20.0)
    args = p.parse_args()

    rgb_root = os.path.join(args.root, "rgb-images")
    out_root = os.path.join(args.root, args.out_name)
    total = 0
    for cls in sorted(os.listdir(rgb_root)):
        for video in sorted(os.listdir(os.path.join(rgb_root, cls))):
            n = compute_video_flow(
                os.path.join(rgb_root, cls, video),
                os.path.join(out_root, cls, video),
                args.bound,
            )
            total += n
            print(f"{cls}/{video}: {n} frames")
    print(f"done: {total} flow frames → {out_root}")


if __name__ == "__main__":
    main()
