#!/usr/bin/env python
"""Export the compiled detect program as a serving artifact.

Serializes jitted ``detect_clip`` for a preset to versioned StableHLO bytes
(``jax.export``) that a serving process loads with
``step_tpu.utils.export.load_detect_fn`` — no model-building Python, no
retrace/recompile at serving time. Params stay in the orbax checkpoint and
are passed at call time.

    python export.py --preset ucf_3step --batch-size 8 --out detect.stablehlo
"""

import argparse


def parse_args():
    p = argparse.ArgumentParser(description="Export a compiled detect program")
    p.add_argument("--preset", default="ucf_3step")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--out", required=True, help="output .stablehlo path")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets, e.g. tpu,cpu")
    p.add_argument("--optimized", action="store_true",
                   help="export the inference-optimized program (BN folded "
                        "+ fused Inception 1x1 — models/optimize.py; pass "
                        "variables transformed by optimize_for_inference "
                        "at serving time)")
    p.add_argument("--tiny", action="store_true")
    from step_tpu.utils.cli import add_common_args

    add_common_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    from step_tpu.utils.cli import apply_overrides, force_platform

    force_platform(args)
    from step_tpu.config import PRESETS
    from step_tpu.utils.export import export_detect_fn

    cfg = PRESETS[args.preset]
    if args.tiny:
        cfg = cfg.replace(backbone_depth="tiny", feature_stride=8)
    cfg = apply_overrides(cfg, args.overrides)
    if args.optimized:
        # program-shape change only — the matching folded variables are
        # produced at serving time by optimize_for_inference; the config
        # half is shared so the exported program carries the FULL serving
        # flag set (incl. the measured scan_unroll win). Explicit --set
        # overrides of serving flags win over the optimized defaults
        # (mirror them on the serving side so the variable tree matches).
        from step_tpu.models.optimize import optimize_for_inference_cli

        cfg, _ = optimize_for_inference_cli(cfg, args.overrides)
    platforms = args.platforms.split(",") if args.platforms else None
    blob = export_detect_fn(cfg, batch_size=args.batch_size,
                            platforms=platforms)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob)} bytes -> {args.out} "
          f"(preset={args.preset}, batch={args.batch_size})")


if __name__ == "__main__":
    main()
