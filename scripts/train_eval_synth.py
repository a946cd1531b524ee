"""Synthetic-oracle train → held-out frame-mAP harness.

The measurement tool behind VALIDATION.md's accuracy entries: trains a
config on fresh synthetic moving-box clips (new seeds every step — no
memorization) and evaluates held-out frame-mAP@{0.5,0.2}. Used for the
parity-risk A/Bs (reg_head, chunk_stem, cuboid_layout — VERDICT r2 item 5)
and the full-scale preset-3/5 synthetic runs (item 7).

Examples (run on the TPU):
  python scripts/train_eval_synth.py --tag baseline --steps 700
  python scripts/train_eval_synth.py --tag frame_fc --set reg_head=frame_fc
  python scripts/train_eval_synth.py --tag ava60 --classes 60 \
      --set multilabel=True,num_classes=60 --steps 1500
  python scripts/train_eval_synth.py --tag two_stream --set two_stream=True

Prints ONE JSON line with the config tag and held-out mAPs.
"""

import _bootstrap  # noqa: F401  (sys.path -> repo root)

import argparse
import json
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--tag", required=True)
    p.add_argument("--steps", type=int, default=700)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--image-size", type=int, default=112)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--eval-clips", type=int, default=48)
    p.add_argument("--eval-batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--set", dest="overrides", default=None,
                   help="comma-separated cfg overrides, e.g. reg_head=frame_fc")
    p.add_argument("--video-eval", type=int, default=0,
                   help="also evaluate held-out VIDEO-mAP on this many "
                        "synthetic long videos via BOTH linkers (host "
                        "greedy + on-device K-tube)")
    p.add_argument("--video-windows", type=int, default=11,
                   help="sliding windows per long video (stride = one chunk)")
    p.add_argument("--same-class-actors", action="store_true",
                   help="synthetic scenes with max_gt_tubes actors all "
                        "sharing one class (trains AND evals the official "
                        "no-reassignment matcher on scenes where it bites)")
    p.add_argument("--save-variables", default=None, metavar="PATH",
                   help="after training, serialize {params, batch_stats} "
                        "(msgpack) so eval-protocol changes can be re-measured "
                        "without retraining")
    p.add_argument("--load-variables", default=None, metavar="PATH",
                   help="skip training; restore variables saved by "
                        "--save-variables (config must match)")
    p.add_argument("--load-ckpt-dir", default=None, metavar="DIR",
                   help="skip training; restore an orbax checkpoint saved "
                        "by the production fit() loop (train.py) — the "
                        "train -> checkpoint -> fresh-process restore -> "
                        "evaluate journey (config must match)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from step_tpu.config import StepConfig
    from step_tpu.data.pipeline import build_model_batch
    from step_tpu.data.synthetic import SyntheticConfig, make_batch, make_flow
    from step_tpu.eval.detection_metrics import frame_map
    from step_tpu.inference import detect_clip
    from step_tpu.models.detector import STEPDetector
    from step_tpu.parallel.mesh import create_mesh, replicated_sharding
    from step_tpu.parallel.distributed import make_global_batch
    from step_tpu.train.trainer import (create_train_state,
                                        make_parallel_train_step)
    from step_tpu.utils.cli import apply_overrides
    from step_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    cfg = StepConfig(
        dataset="synthetic", num_classes=args.classes,
        image_size=args.image_size, batch_size=args.batch,
        learning_rate=args.lr, warmup_steps=min(100, args.steps // 5),
        total_steps=args.steps, max_gt_tubes=2,
    )
    if args.overrides:
        # Pass the whole string: apply_overrides splits on pair-boundary
        # commas itself, keeping tuple literals like iou_thresholds=(0.4,0.5)
        # intact (a naive .split(",") would shred them).
        cfg = apply_overrides(cfg, [args.overrides])
    syn = SyntheticConfig(image_size=cfg.image_size,
                          num_frames=cfg.total_frames,
                          num_classes=cfg.num_classes,
                          max_boxes=cfg.max_gt_tubes,
                          same_class_actors=args.same_class_actors)

    model = STEPDetector(cfg)
    mesh = create_mesh((1,), cfg.mesh_axes)
    rng = jax.random.PRNGKey(args.seed + 1)

    def model_batch(seed):
        raw = make_batch(seed, cfg.batch_size, syn)
        if cfg.two_stream:
            raw["flow"] = np.stack([make_flow(r) for r in raw["rgb"]])
        b = build_model_batch(raw, cfg, train=True, seed=seed,
                              emit_uint8=cfg.uint8_transfer)
        return make_global_batch({k: v for k, v in b.items() if k != "meta"},
                                 mesh)

    t0 = time.time()
    losses = []
    if args.load_variables:
        from flax import serialization

        with open(args.load_variables, "rb") as f:
            variables = serialization.msgpack_restore(f.read())
        variables = jax.device_put(variables, replicated_sharding(mesh))
    elif args.load_ckpt_dir:
        from step_tpu.utils.checkpoint import restore_checkpoint

        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            template = create_train_state(cfg, jax.random.PRNGKey(args.seed),
                                          model)
        restored, _ = restore_checkpoint(args.load_ckpt_dir, template)
        print(f"restored step {int(restored.step)} from {args.load_ckpt_dir}",
              flush=True)
        variables = jax.device_put(
            {"params": restored.params, "batch_stats": restored.batch_stats},
            replicated_sharding(mesh))
    else:
        # train state only when training — the relay's real upload rate is
        # ~43 MB/s, so a dead params+optimizer upload in --load-variables
        # mode would cost tens of seconds for nothing
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            state = create_train_state(cfg, jax.random.PRNGKey(args.seed),
                                       model)
        state = jax.device_put(state, replicated_sharding(mesh))
        pstep = make_parallel_train_step(cfg, model, mesh)
        for step in range(args.steps):
            batch = model_batch(args.seed * 1000 + step * cfg.batch_size)
            state, metrics = pstep(state, batch, rng)
            # Per-step VALUE readback: the axon relay stalls pathologically
            # on back-to-back heavy dispatches with no readback (CLAUDE.md
            # round-3 failure mode); a concrete float costs ~ms and keeps
            # it honest.
            loss = round(float(metrics["loss"]), 3)
            if step % 50 == 0 or step == args.steps - 1:
                losses.append(loss)
                print(f"step {step}: loss={loss}", flush=True)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    train_s = (time.time() - t0
               if not (args.load_variables or args.load_ckpt_dir) else 0.0)

    if args.save_variables:
        from flax import serialization

        host_vars = jax.tree.map(np.asarray, variables)
        with open(args.save_variables, "wb") as f:
            f.write(serialization.msgpack_serialize(host_vars))
        print(f"saved variables -> {args.save_variables}", flush=True)

    # ---- held-out eval (seeds disjoint from every training seed) ----

    @jax.jit
    def detect(variables, rgb, proposals, prop_mask, flow=None):
        return detect_clip(variables, rgb, proposals, prop_mask, cfg, model,
                           flow)

    detections, frame_gt = [], []
    EV = 10_000_000
    # loop-invariant device proposals (two host->device round-trips each
    # on the relay — CLAUDE.md); ragged tail rebuilds its own size
    props_full, pmask_full = STEPDetector.initial_proposals(
        cfg, args.eval_batch)
    for start in range(0, args.eval_clips, args.eval_batch):
        n = min(args.eval_batch, args.eval_clips - start)
        raw = make_batch(EV + start, n, syn)
        flow = None
        if cfg.two_stream:
            flow = jnp.asarray(np.stack([make_flow(r) for r in raw["rgb"]]))
        b = build_model_batch(raw, cfg, train=False)
        props, pmask = ((props_full, pmask_full) if n == args.eval_batch
                        else STEPDetector.initial_proposals(cfg, n))
        out = detect(variables, jnp.asarray(b["rgb"]), props, pmask, flow)
        boxes = np.asarray(out["frame_boxes"])
        scores = np.asarray(out["frame_scores"])
        mask = np.asarray(out["frame_mask"])
        T = cfg.total_frames
        for bi in range(n):
            vid = start + bi
            # GT per frame
            for g in range(raw["gt_mask"].shape[1]):
                if raw["gt_mask"][bi, g] <= 0:
                    continue
                cls = int(raw["gt_labels"][bi, g])
                for t in range(T):
                    frame_gt.append(((vid, t), cls, raw["gt_tubes"][bi, g, t]))
            keep = np.argwhere((mask[bi] > 0) & (scores[bi] > cfg.score_thresh))
            for t, c, k in keep:
                detections.append(
                    ((vid, int(t)), int(c), float(scores[bi, t, c, k]),
                     boxes[bi, t, c, k]))

    m50 = frame_map(detections, frame_gt, cfg.num_classes, 0.5)["mAP"]
    m20 = frame_map(detections, frame_gt, cfg.num_classes, 0.2)["mAP"]

    # ---- held-out VIDEO-mAP over synthetic long videos (both linkers) ----
    video_metrics = {}
    if args.video_eval > 0:
        from step_tpu.data.synthetic import SyntheticVideoDataset
        from step_tpu.eval.detection_metrics import video_map
        from step_tpu.evaluate import (collect_detections, collect_video_tubes,
                                       dedupe_frame_detections,
                                       link_frame_detections)

        W, T, fpc = args.video_windows, cfg.total_frames, cfg.frames_per_chunk
        vds = SyntheticVideoDataset(
            SyntheticConfig(image_size=cfg.image_size,
                            num_frames=(W - 1) * fpc + T,
                            num_classes=cfg.num_classes,
                            max_boxes=cfg.max_gt_tubes,
                            same_class_actors=args.same_class_actors),
            num_videos=args.video_eval, num_windows=W, window_frames=T,
            stride=fpc, seed=20_000_000,
            # two-stream / flow-stream detectors need the flow channel in
            # the video-eval windows too
            with_flow=cfg.two_stream or cfg.input_stream == "flow")
        gt = vds.video_gt()
        # host path: per-frame detections → greedy temporal linking
        dets = collect_detections(variables, vds, cfg, model,
                                  batch_size=args.eval_batch,
                                  image_scale_to_gt=False)
        host_tubes = link_frame_detections(dedupe_frame_detections(dets))
        # device path: on-device K-tube Viterbi linking with temporal trim
        dev_tubes = collect_video_tubes(variables, vds, cfg, model,
                                        image_scale_to_gt=False)
        for name, tubes in (("host", host_tubes), ("device", dev_tubes)):
            for thr in (0.2, 0.5):
                v = video_map(tubes, gt, cfg.num_classes, thr)["mAP"]
                video_metrics[f"video_mAP@{thr}_{name}"] = round(float(v), 4)

    print(json.dumps({
        "tag": args.tag,
        "overrides": args.overrides,
        "steps": args.steps,
        "batch": cfg.batch_size,
        "image_size": cfg.image_size,
        "num_classes": cfg.num_classes,
        "frame_mAP@0.5": round(float(m50), 4),
        "frame_mAP@0.2": round(float(m20), 4),
        **video_metrics,
        "loss_curve": losses,
        "train_s": round(train_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
