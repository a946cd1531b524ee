"""Shared CLI helpers for the driver scripts (train.py / test.py / demo.py).

The reference spreads flags across per-script argparse blocks; here every
script gets the same two generic affordances:

  * ``--set key=value`` — overlay any StepConfig field (values parsed as
    Python literals, so ``--set iou_thresholds=(0.4,)`` works); keeps the
    CLI surface thin while every config knob stays reachable.
  * ``--platform cpu|tpu`` — force the JAX platform before backend init
    (the image's sitecustomize pins the TPU; env vars are too late, the
    config update is not — see tests/conftest.py).
"""

from __future__ import annotations

import ast


def add_common_args(parser):
    parser.add_argument(
        "--set", dest="overrides", action="append", default=[],
        metavar="KEY=VALUE", help="StepConfig field override (repeatable)",
    )
    parser.add_argument(
        "--platform", default=None,
        help="force the JAX platform (e.g. 'cpu') before backend init",
    )
    return parser


def force_platform(args) -> None:
    """Apply --platform. Call before any jax op runs."""
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)


def apply_overrides(cfg, overrides):
    """Overlay ``key=value`` strings onto a StepConfig."""
    over = {}
    for item in overrides:
        key, _, raw = item.partition("=")
        if not _:
            raise ValueError(f"--set expects key=value, got {item!r}")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw  # bare strings (e.g. backbone_depth=tiny)
        over[key.replace("-", "_")] = value
    return cfg.replace(**over) if over else cfg
