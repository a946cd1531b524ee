#!/usr/bin/env python
"""Training CLI (reference parity: ``train.py`` (recon)).

Examples:
  python train.py --preset ucf_3step --data-root /data/ucf24 \
      --ckpt-dir runs/ucf/ckpt --log-dir runs/ucf --epochs 8
  python train.py --preset two_stream_train --data-root /data/ucf24 --flow
  python train.py --dataset synthetic --steps 200      # no data needed
"""

import argparse

from step_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def parse_args():
    p = argparse.ArgumentParser(description="Train the STEP-TPU detector")
    p.add_argument("--preset", default=None, help="named config preset")
    p.add_argument("--dataset", default=None, help="ucf101_24 | ava | synthetic")
    p.add_argument("--data-root", default=None)
    p.add_argument("--annotation-file", default=None)
    p.add_argument("--flow", action="store_true", help="load optical flow (two-stream)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--steps", type=int, default=None, help="total optimizer steps")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--pretrained-i3d", default=None,
                   help="Kinetics-pretrained torch I3D checkpoint "
                        "(.pt/.pth; piergiaj/hassony2/DataParallel namings "
                        "accepted) — converted and loaded into the "
                        "backbone before training. Validate a file first "
                        "with scripts/kinetics_drill.py")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: bootstrap jax.distributed (coordinator "
                        "from JAX_COORDINATOR_ADDRESS / pod metadata) and "
                        "shard the dataset per host")
    p.add_argument("--tiny", action="store_true", help="tiny backbone (debug)")
    p.add_argument("--eval-every-epochs", type=int, default=0,
                   help="held-out eval every N epochs (0 = off). "
                        "ucf101_24 evaluates the test split's frame/video "
                        "mAPs; ava evaluates the val CSV; for synthetic "
                        "use scripts/train_eval_synth.py")
    p.add_argument("--eval-max-batches", type=int, default=25,
                   help="bound each in-train eval to N detection batches")
    p.add_argument("--eval-annotation-file", default=None,
                   help="annotations for --eval-every-epochs (AVA: the val "
                        "CSV, default ava_val_v2.1.csv; UCF shares the "
                        "GT pkl and uses its test split)")
    p.add_argument("--label-map", default=None,
                   help="AVA label-map pbtxt (evaluated-class whitelist)")
    p.add_argument("--exclusions", default=None,
                   help="AVA excluded-timestamps CSV (relative to data root)")
    p.add_argument("--fps", type=int, default=30,
                   help="AVA frame-extraction rate (frames per second)")
    from step_tpu.utils.cli import add_common_args

    add_common_args(p)
    return p.parse_args()


def build_config(args):
    from step_tpu.config import PRESETS, StepConfig
    from step_tpu.utils.cli import apply_overrides

    cfg = PRESETS[args.preset] if args.preset else StepConfig()
    over = {}
    if args.dataset:
        over["dataset"] = args.dataset
        if args.dataset == "synthetic":
            over.update(num_classes=4, image_size=64)
    if args.batch_size:
        over["batch_size"] = args.batch_size
    if args.lr:
        over["learning_rate"] = args.lr
    if args.steps:
        over["total_steps"] = args.steps
    if args.image_size:
        over["image_size"] = args.image_size
    if args.flow:
        over["two_stream"] = True
    if args.tiny:
        over.update(backbone_depth="tiny", feature_stride=8)
    cfg = cfg.replace(**over) if over else cfg
    return apply_overrides(cfg, args.overrides)


def build_dataset(cfg, args):
    if cfg.dataset == "synthetic":
        from step_tpu.data.synthetic import SyntheticConfig, make_clip

        syn = SyntheticConfig(
            image_size=cfg.image_size,
            num_frames=cfg.total_frames,
            num_classes=cfg.num_classes,
            max_boxes=cfg.max_gt_tubes,
        )

        class _Synthetic:
            def __len__(self):
                return 512

            def __getitem__(self, i):
                return make_clip(i, syn)

        return _Synthetic()
    if cfg.dataset == "ava":
        from step_tpu.data.ava import AVADataset

        label_map = None
        if args.label_map:
            from step_tpu.eval.ava_eval import AVALabelMap

            label_map = AVALabelMap.from_pbtxt(args.label_map)
        return AVADataset(args.data_root, cfg,
                          args.annotation_file or "ava_train_v2.1.csv",
                          fps=args.fps, augment=True, label_map=label_map,
                          exclusions_file=args.exclusions)
    from step_tpu.data.ucf import UCFDataset

    return UCFDataset(args.data_root, cfg, split="train",
                      annotation_file=args.annotation_file or "UCF101v2-GT.pkl",
                      augment=True,
                      with_flow=cfg.two_stream or cfg.input_stream == "flow")


def build_eval_fn(cfg, args):
    """Held-out eval closure for fit() (`--eval-every-epochs`): the
    reference tracked only train losses between checkpoints; tracking
    held-out mAP during training is standard production practice."""
    if cfg.dataset == "ucf101_24":
        from step_tpu.data.ucf import UCFDataset
        from step_tpu.evaluate import evaluate_ucf

        val = UCFDataset(args.data_root, cfg, split="test",
                         annotation_file=args.eval_annotation_file
                         or args.annotation_file or "UCF101v2-GT.pkl",
                         with_flow=(cfg.two_stream
                                    or cfg.input_stream == "flow"))

        def eval_fn(state, epoch):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            return evaluate_ucf(variables, val, cfg,
                                max_batches=args.eval_max_batches)

        return eval_fn
    if cfg.dataset == "ava":
        from step_tpu.data.ava import AVADataset
        from step_tpu.evaluate import evaluate_ava

        label_map = None
        if args.label_map:
            from step_tpu.eval.ava_eval import AVALabelMap

            label_map = AVALabelMap.from_pbtxt(args.label_map)
        # --annotation-file is the TRAIN csv here; eval needs its own
        val = AVADataset(args.data_root, cfg,
                         args.eval_annotation_file or "ava_val_v2.1.csv",
                         fps=args.fps, label_map=label_map,
                         exclusions_file=args.exclusions)

        def eval_fn(state, epoch):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            return evaluate_ava(variables, val, cfg,
                                max_batches=args.eval_max_batches)

        return eval_fn
    raise SystemExit("--eval-every-epochs supports ucf101_24/ava; for "
                     "synthetic runs use scripts/train_eval_synth.py")


def main():
    args = parse_args()
    from step_tpu.utils.cli import force_platform

    force_platform(args)
    pi, pc = 0, 1
    if args.distributed:
        from step_tpu.parallel.distributed import init_distributed

        pi, pc = init_distributed()
        print(f"distributed: process {pi}/{pc}", flush=True)
    cfg = build_config(args)
    from step_tpu.data.loader import DataLoader
    from step_tpu.train.fit import fit

    dataset = build_dataset(cfg, args)
    if cfg.batch_size % pc:
        raise SystemExit(f"batch_size {cfg.batch_size} not divisible by "
                         f"{pc} processes")
    loader = DataLoader(dataset, cfg, batch_size=cfg.batch_size // pc,
                        train=True, seed=args.seed,
                        process_count=pc, process_index=pi)
    eval_fn = None
    if args.eval_every_epochs:
        if args.distributed:
            # the eval jit mixes globally-sharded params with host-local
            # batch arrays — invalid in a multi-process runtime (and each
            # host would redundantly run the full eval)
            raise SystemExit("--eval-every-epochs is not supported with "
                             "--distributed; run test.py from one host")
        eval_fn = build_eval_fn(cfg, args)
    fit(
        cfg,
        loader,
        num_epochs=args.epochs,
        ckpt_dir=args.ckpt_dir,
        log_dir=args.log_dir,
        resume=args.resume,
        seed=args.seed,
        eval_fn=eval_fn,
        eval_every_epochs=args.eval_every_epochs or 1,
        pretrained_i3d=args.pretrained_i3d,
    )


if __name__ == "__main__":
    main()
