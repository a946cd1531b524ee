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
import re

# Split one --set payload on commas that start a new key=value pair, so
# ``--set a=1,b=2`` works while tuple values like ``iou_thresholds=(0.4,)``
# stay intact (their commas are not followed by ``ident=``).
_PAIR_SPLIT = re.compile(r",(?=[A-Za-z_][A-Za-z0-9_\-]*=)")


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
    """Overlay ``key=value[,key=value...]`` strings onto a StepConfig."""
    over = parse_overrides(cfg, overrides)
    return cfg.replace(**over) if over else cfg


def parse_overrides(cfg, overrides) -> dict:
    """Parse ``key=value[,key=value...]`` strings into a typed dict.

    Values are parsed as Python literals; a value that stays a *string* while
    the config field is numeric/bool/tuple raises instead of silently
    overlaying (the round-4 chip queue lost a 90-minute run to
    ``max_gt_tubes="2,warmup_steps=100"`` sliding through unparsed).

    Exposed separately from `apply_overrides` so --optimized surfaces can
    see WHICH flags the user set explicitly (models/optimize.py::
    optimize_for_inference_cli lets those win over the serving defaults).
    """
    over = {}
    for item in overrides:
        for pair in _PAIR_SPLIT.split(item):
            key, eq, raw = pair.partition("=")
            if not eq:
                raise ValueError(f"--set expects key=value, got {pair!r}")
            try:
                value = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                value = raw  # bare strings (e.g. backbone_depth=tiny)
            key = key.replace("-", "_")
            current = getattr(cfg, key, None)
            if (isinstance(value, str)
                    and current is not None
                    and not isinstance(current, str)):
                raise ValueError(
                    f"--set {key}={raw!r} parsed as a string but the config "
                    f"field is {type(current).__name__} ({current!r})")
            if (isinstance(current, str) and not isinstance(value, str)):
                # The reverse direction is just as silent: roi_impl=0 would
                # miss every string comparison downstream and fall through
                # to a slow default path with no error.
                raise ValueError(
                    f"--set {key}={raw!r} parsed as "
                    f"{type(value).__name__} but the config field is a "
                    f"string ({current!r})")
            over[key] = value
    return over
