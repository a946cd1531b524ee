#!/usr/bin/env python
"""Video classification CLI — the standalone I3D model family.

Reference parity: the reference ships I3D purely as the detection backbone
(``models/i3dpt.py`` (recon)), initialized from a released Kinetics
checkpoint; this driver exposes the same network as a usable video
classifier (the Quo-Vadis protocol: center clip, logits averaged over
time), reading weights either from a converted torch checkpoint
(``models/convert.py``) or an orbax save.

Examples:
  python classify.py --video clip.mp4 --torch-ckpt i3d_kinetics.pth \
      --labels kinetics_400_labels.txt
  python classify.py --frames-dir frames/ --torch-ckpt i3d_kinetics.pth
"""

import argparse

from step_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def parse_args():
    p = argparse.ArgumentParser(description="I3D video classification")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--video", help="video file (decoded via the native "
                                     "clip loader / cv2)")
    src.add_argument("--frames-dir", help="directory of frame images")
    p.add_argument("--torch-ckpt", default=None,
                   help="torch I3D state_dict (.pth) to convert on the fly")
    p.add_argument("--ckpt-dir", default=None, help="orbax checkpoint dir")
    p.add_argument("--labels", default=None,
                   help="text file, one class name per line")
    p.add_argument("--num-classes", type=int, default=400)
    p.add_argument("--num-frames", type=int, default=64,
                   help="center-clip length (Quo Vadis eval uses 64+)")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--top-k", type=int, default=5)
    from step_tpu.utils.cli import add_common_args

    add_common_args(p)
    return p.parse_args()


def load_frames(args):
    import numpy as np

    if args.frames_dir:
        import os

        import cv2

        names = sorted(os.listdir(args.frames_dir))
        frames = [
            cv2.cvtColor(cv2.imread(os.path.join(args.frames_dir, n)),
                         cv2.COLOR_BGR2RGB)
            for n in names if n.lower().endswith((".jpg", ".jpeg", ".png"))
        ]
    else:
        import cv2

        cap = cv2.VideoCapture(args.video)
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
    if not frames:
        raise SystemExit("no frames decoded")
    import cv2

    frames = [cv2.resize(f, (args.image_size, args.image_size))
              for f in frames]
    clip = np.stack(frames).astype(np.float32) / 255.0
    # center clip, edge-clamped
    T = args.num_frames
    if len(clip) >= T:
        s = (len(clip) - T) // 2
        clip = clip[s : s + T]
    else:
        pad = T - len(clip)
        clip = np.concatenate([clip, np.repeat(clip[-1:], pad, 0)])
    return clip[None]  # [1, T, H, W, 3]


def main():
    args = parse_args()
    from step_tpu.utils.cli import force_platform

    force_platform(args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from step_tpu.models.i3d import I3DClassifier
    from step_tpu.preprocess import device_preprocess

    model = I3DClassifier(num_classes=args.num_classes,
                          dtype=jnp.bfloat16)
    if args.torch_ckpt:
        import torch

        from step_tpu.models.convert import convert_torch_i3d

        sd = torch.load(args.torch_ckpt, map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items()}
        variables = convert_torch_i3d(sd, include_logits=True)
    elif args.ckpt_dir:
        import orbax.checkpoint as ocp

        variables = ocp.StandardCheckpointer().restore(args.ckpt_dir)
    else:
        raise SystemExit("need --torch-ckpt or --ckpt-dir")

    clip = jnp.asarray(load_frames(args))

    @jax.jit
    def classify(variables, clip):
        logits = model.apply(variables, device_preprocess(clip))
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    probs = np.asarray(classify(variables, clip), np.float32)[0]
    labels = None
    if args.labels:
        labels = [l.strip() for l in open(args.labels)]
    top = np.argsort(-probs)[: args.top_k]
    for i in top:
        name = labels[i] if labels and i < len(labels) else f"class_{i}"
        print(f"{probs[i]:.4f}  {name}")


if __name__ == "__main__":
    main()
