#!/usr/bin/env python
"""Evaluation CLI (reference parity: ``test.py`` (recon)).

Loads a checkpoint, runs the 3-step progressive inference with on-device
NMS over the test split, dumps detections, and prints frame-/video-mAP
(UCF) or keyframe frame-mAP (AVA).
"""

import argparse

from step_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate the STEP-TPU detector")
    p.add_argument("--preset", default="ucf_3step")
    p.add_argument("--data-root", required=True)
    p.add_argument("--annotation-file", default=None)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--dump", default=None, help="detections pickle output path")
    p.add_argument("--calibration", default=None,
                   help="per-class Platt .npz to apply to scores (UCF)")
    p.add_argument("--fit-calibration", default=None,
                   help="fit per-class Platt on this run and save .npz (UCF)")
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--max-videos", type=int, default=None,
                   help="bound the --device-linking pass to N whole videos "
                        "(defaults to --max-batches when only that is set)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--label-map", default=None,
                   help="AVA label-map pbtxt (evaluated-class whitelist)")
    p.add_argument("--exclusions", default=None,
                   help="AVA excluded-timestamps CSV (relative to data root)")
    p.add_argument("--fps", type=int, default=30,
                   help="AVA frame-extraction rate (frames per second)")
    p.add_argument("--sharded", action="store_true",
                   help="batch-shard detection over all devices (DP eval)")
    p.add_argument("--flow-ckpt-dir", default=None,
                   help="second (flow-stream) checkpoint — enables the "
                        "reference late-fusion protocol (UCF only)")
    p.add_argument("--optimized", action="store_true",
                   help="evaluate with the inference-optimized program "
                        "(BN folded + fused Inception 1x1; measured +4.7% "
                        "throughput — models/optimize.py)")
    p.add_argument("--device-linking", action="store_true",
                   help="assemble video tubes with the on-device K-tube "
                        "Viterbi linker instead of the host greedy pass "
                        "(UCF only)")
    from step_tpu.utils.cli import add_common_args

    add_common_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    from step_tpu.utils.cli import apply_overrides, force_platform

    force_platform(args)
    import jax

    from step_tpu.config import PRESETS
    from step_tpu.models.detector import STEPDetector
    from step_tpu.train.trainer import create_train_state
    from step_tpu.utils.checkpoint import restore_checkpoint

    cfg = PRESETS[args.preset]
    if args.tiny:
        cfg = cfg.replace(backbone_depth="tiny", feature_stride=8)
    cfg = apply_overrides(cfg, args.overrides)
    if args.flow_ckpt_dir:
        # late fusion: the primary checkpoint is the single-stream RGB
        # detector regardless of the preset's two_stream flag
        cfg = cfg.replace(two_stream=False, input_stream="rgb")
    model = STEPDetector(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    state, _ = restore_checkpoint(args.ckpt_dir, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.optimized:
        if args.flow_ckpt_dir:
            raise SystemExit("--optimized does not combine with "
                             "--flow-ckpt-dir (transform each stream "
                             "explicitly via models/optimize.py)")
        from step_tpu.models.optimize import optimize_for_inference_cli

        # explicit --set serving flags win over the optimized defaults
        cfg, variables = optimize_for_inference_cli(
            cfg, args.overrides, variables)
        model = STEPDetector(cfg)

    mesh = None
    if args.sharded:
        from step_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()
        print(f"sharded eval over {mesh.devices.size} devices", flush=True)

    variables_flow = None
    if args.flow_ckpt_dir and cfg.dataset == "ava":
        raise SystemExit("--flow-ckpt-dir is UCF-only: AVA has no flow "
                         "stream, the late-fusion protocol does not apply")
    if args.flow_ckpt_dir:
        # late-fusion protocol: a second single-stream detector on flow
        cfg_flow = cfg.replace(two_stream=False, input_stream="flow")
        state_flow = create_train_state(
            cfg_flow, jax.random.PRNGKey(0), STEPDetector(cfg_flow))
        state_flow, _ = restore_checkpoint(args.flow_ckpt_dir, state_flow)
        variables_flow = {"params": state_flow.params,
                          "batch_stats": state_flow.batch_stats}

    if cfg.dataset == "ava":
        from step_tpu.data.ava import AVADataset
        from step_tpu.evaluate import evaluate_ava

        label_map = None
        if args.label_map:
            from step_tpu.eval.ava_eval import AVALabelMap

            label_map = AVALabelMap.from_pbtxt(args.label_map)
        dataset = AVADataset(args.data_root, cfg,
                             args.annotation_file or "ava_val_v2.1.csv",
                             fps=args.fps, label_map=label_map,
                             exclusions_file=args.exclusions)
        results = evaluate_ava(variables, dataset, cfg, model,
                               dump_path=args.dump, max_batches=args.max_batches,
                               mesh=mesh)
    else:
        from step_tpu.data.ucf import UCFDataset
        from step_tpu.evaluate import evaluate_ucf

        dataset = UCFDataset(args.data_root, cfg, split="test",
                             annotation_file=args.annotation_file or "UCF101v2-GT.pkl",
                             with_flow=(cfg.two_stream or bool(args.flow_ckpt_dir)
                                        or cfg.input_stream == "flow"))
        results = evaluate_ucf(variables, dataset, cfg, model,
                               dump_path=args.dump, max_batches=args.max_batches,
                               calibration=args.calibration,
                               fit_calibration_path=args.fit_calibration,
                               mesh=mesh, variables_flow=variables_flow,
                               device_linking=args.device_linking,
                               max_videos=args.max_videos)
    for k, v in results.items():
        # results mixes floats (mAPs) with strings ("eval_subset") and the
        # phase-timing dict; a blanket :.4f raised ValueError on any
        # --max-batches run (the string "N videos" hit the float format)
        if isinstance(v, float):
            print(f"{k}: {v:.4f}")
        elif isinstance(v, dict):
            print(k + ": " + ", ".join(
                f"{a}={b:.2f}" if isinstance(b, float) else f"{a}={b}"
                for a, b in v.items()))
        else:
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
