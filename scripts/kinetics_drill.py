#!/usr/bin/env python
"""Kinetics-checkpoint drill (VERDICT r4 next #8b): ONE command from a
torch I3D checkpoint FILE to a converted tree + activation-parity report.

The container is zero-egress, so no real released checkpoint has ever been
loadable — this drill is the day-one procedure for the moment one appears:

    python scripts/kinetics_drill.py --checkpoint rgb_imagenet.pt

Steps (all local, CPU):
  1. load + unwrap the file (`convert.load_torch_checkpoint`),
  2. normalize the naming (piergiaj / hassony2 / `module.` DataParallel
     prefixes) and print the dry-run report (scheme, mapped/missing/
     ignored keys) — a wrong-architecture file fails loudly HERE,
  3. convert to the flax I3D tree (`convert_torch_i3d`),
  4. activation parity: run the from-spec torch oracle
     (tests/_torch_i3d.TorchI3D) loaded with the SAME normalized weights
     against the flax I3D on an odd-sized input (asymmetric TF-SAME pads
     exercised) and report per-endpoint max |Δ|,
  5. load the backbone into a fresh STEPDetector tree (the exact transform
     train.py --pretrained-i3d applies) and report the touched subtrees.

Exit code 0 = every parity endpoint within --tol (default 1e-4).
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--checkpoint", required=True, help=".pt/.pth file")
    p.add_argument("--tol", type=float, default=1e-4,
                   help="max per-endpoint |Δ| accepted (f32 conv chains)")
    p.add_argument("--preset", default="ucf_3step",
                   help="detector preset for the backbone-load step")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from step_tpu.models.convert import (convert_torch_i3d,
                                         load_i3d_into_detector,
                                         load_torch_checkpoint,
                                         normalize_i3d_state_dict)

    sd = load_torch_checkpoint(args.checkpoint)
    print(f"loaded {args.checkpoint}: {len(sd)} tensors")
    canonical, report = normalize_i3d_state_dict(sd)
    print(f"scheme={report['scheme']!r} mapped={len(report['mapped'])} "
          f"missing={len(report['missing'])} "
          f"ignored={len(report['ignored'])}")
    if report["missing"]:
        print(f"missing keys (first 10): {report['missing'][:10]}")
        print("NOT an I3D checkpoint this converter recognizes — aborting")
        return 2
    if report["ignored"]:
        print(f"ignored keys (first 10): {report['ignored'][:10]}")

    has_logits = "logits.conv3d.weight" in canonical
    i3d = convert_torch_i3d(sd, include_logits=has_logits)

    # ---- activation parity vs the from-spec torch oracle ----
    try:
        import torch

        from tests._torch_i3d import TorchI3D

        num_classes = (int(canonical["logits.conv3d.weight"].shape[0])
                       if has_logits else 400)
        net = TorchI3D(num_classes=num_classes)
        # the oracle's own state_dict naming is one of the normalizer's
        # schemes — normalize IT to get oracle_key -> canonical_key, then
        # feed the checkpoint's canonical tensors back through that map
        # (scheme-agnostic: works whatever naming the file used)
        _, omap = normalize_i3d_state_dict(
            {k: v.numpy() for k, v in net.state_dict().items()})
        oracle_sd = {src: torch.from_numpy(np.asarray(canonical[dst]))
                     for src, dst in omap["mapped"].items()
                     if dst in canonical}
        missing, unexpected = net.load_state_dict(oracle_sd, strict=False)
        missing = [m for m in missing
                   if "num_batches_tracked" not in m
                   and not (not has_logits and m.startswith("logits"))]
        if missing:
            print(f"oracle load_state_dict missing: {missing[:10]}")
        net.eval()

        rng = np.random.RandomState(0)
        x = rng.randn(1, 9, 39, 39, 3).astype(np.float32) * 0.5
        with torch.no_grad():
            xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
            stem_t, tail_t, logits_t = net(xt)
        to_ndhwc = lambda t: np.transpose(t.numpy(), (0, 2, 3, 4, 1))

        from step_tpu.models.i3d import I3DClassifier, I3DStem, I3DTail

        stem_vars = {"params": i3d["params"]["stem"],
                     "batch_stats": i3d["batch_stats"]["stem"]}
        stem_j = I3DStem().apply(stem_vars, jnp.asarray(x))
        tail_vars = {"params": i3d["params"]["tail"],
                     "batch_stats": i3d["batch_stats"]["tail"]}
        tail_j = I3DTail(pool_5a=True).apply(tail_vars, stem_j)
        ok = True
        pairs = [("stem (→Mixed_4f)", to_ndhwc(stem_t), stem_j),
                 ("tail (→Mixed_5c)", to_ndhwc(tail_t), tail_j)]
        if has_logits:
            logits_j = I3DClassifier(num_classes=num_classes).apply(
                i3d, jnp.asarray(x))
            pairs.append(("logits", logits_t.numpy(), logits_j))
        for name, want, got in pairs:
            d = float(np.max(np.abs(np.asarray(got) - want)))
            status = "OK" if d <= args.tol else "FAIL"
            if d > args.tol:
                ok = False
            print(f"parity {name}: max|Δ| = {d:.3e}  [{status}]")
    except ImportError:
        print("torch not available — skipping the oracle parity stage")
        ok = True

    # ---- backbone → detector tree (what --pretrained-i3d applies) ----
    from step_tpu.config import PRESETS
    from step_tpu.models.detector import STEPDetector
    from step_tpu.utils.init import init_detector_cpu

    cfg = PRESETS[args.preset]
    variables = init_detector_cpu(cfg, jax.random.PRNGKey(0),
                                  STEPDetector(cfg))
    i3d_nolog = (convert_torch_i3d(sd, include_logits=False)
                 if has_logits else i3d)
    loaded = load_i3d_into_detector(variables, i3d_nolog, cfg)
    n_leaves = len(jax.tree_util.tree_leaves(loaded["params"]))
    print(f"backbone loaded into {args.preset} detector tree "
          f"({n_leaves} param leaves; stems + per-step tails replaced) — "
          f"train with: python train.py --pretrained-i3d "
          f"{args.checkpoint} ...")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
