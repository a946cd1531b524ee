"""Inference-time variable optimization: BN folding + Inception 1x1 fusion.

Reference parity: none — the reference serves the raw training graph
(``test.py`` loads the train-time nn.Modules (recon)). On TPU the
inference program is worth specializing: BatchNorm in inference mode is a
per-channel affine that can be folded INTO the conv weights (removing the
op, its params, and its epilogue traffic entirely), and the three 1x1x1
branch convs of every Inception block can be merged into one conv
(one HBM read of the block input instead of three).

Checkpoints stay in the standard (trainable) layout; this module derives
the optimized variable tree at load time:

    cfg_opt, vars_opt = optimize_for_inference(cfg, variables)
    detect = make_detect_fn(cfg_opt)
    out = detect(vars_opt, rgb, proposals, prop_mask)

Both transforms are exact up to float reassociation (parity-tested in
tests/test_optimize.py). The optimized model has no batch_stats collection
and cannot train.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from step_tpu.config import StepConfig
from step_tpu.models.i3d import BN_EPS

# An InceptionBlock scope is recognized by exactly its six branch children.
_INCEPTION_KEYS = {"b0", "b1a", "b1b", "b2a", "b2b", "b3b"}


def _as_mutable(tree):
    """FrozenDict / dict → plain nested dict (leaves shared, not copied)."""
    if hasattr(tree, "items"):
        return {k: _as_mutable(v) for k, v in tree.items()}
    return tree


def _bcast_last(vec, ndim: int):
    """Reshape a [..., C] per-channel vector to broadcast against a
    [..., k, k, k, Cin, C]-style tensor of rank `ndim` (leading stack dims
    — e.g. the scanned per-step axis — stay aligned)."""
    lead = vec.shape[:-1]
    return vec.reshape(lead + (1,) * (ndim - vec.ndim) + vec.shape[-1:])


def fold_bn_variables(variables) -> Dict[str, Any]:
    """Fold every (conv, bn) Unit3D pair into a (kernel', bias') conv.

    Works on the standard variable tree ({"params", "batch_stats"}); returns
    {"params": ...} for the same model built with ``bn_folded=True``.
    Handles scan-stacked per-step params (leading S axis) transparently.
    """
    params = _as_mutable(variables["params"])
    stats = _as_mutable(variables.get("batch_stats", {}))

    def walk(p, s):
        if not isinstance(p, dict):
            return p
        if "conv" in p and "bn" in p and "kernel" in p.get("conv", {}):
            # numpy on purpose: this is a host-side load-time transform —
            # jnp here would dispatch per-leaf device ops (costly through
            # the relay transport; see CLAUDE.md).
            bn_p, bn_s = p["bn"], (s or {}).get("bn", {})
            kernel = np.asarray(p["conv"]["kernel"], np.float32)
            gamma = np.asarray(bn_p["scale"], np.float32)
            beta = np.asarray(bn_p["bias"], np.float32)
            mean = np.asarray(bn_s["mean"], np.float32)
            var = np.asarray(bn_s["var"], np.float32)
            scale = gamma / np.sqrt(var + BN_EPS)
            bias = beta - mean * scale
            if "bias" in p["conv"]:
                bias = bias + np.asarray(p["conv"]["bias"], np.float32) * scale
            out = {k: walk(v, (s or {}).get(k)) for k, v in p.items()
                   if k not in ("conv", "bn")}
            out["conv"] = {"kernel": kernel * _bcast_last(scale, kernel.ndim),
                           "bias": bias}
            return out
        return {k: walk(v, (s or {}).get(k)) for k, v in p.items()}

    return {"params": walk(params, stats)}


def fuse_inception_variables(folded: Dict[str, Any]) -> Dict[str, Any]:
    """Merge each InceptionBlock's b0/b1a/b2a folded convs into one "b012"
    conv (kernel/bias concatenated on the output-channel axis). Input must
    already be BN-folded (`fold_bn_variables`)."""

    def walk(p):
        if not isinstance(p, dict):
            return p
        out = {k: walk(v) for k, v in p.items()}
        if _INCEPTION_KEYS.issubset(out.keys()):
            parts = [out.pop(k)["conv"] for k in ("b0", "b1a", "b2a")]
            for c in parts:
                if "bias" not in c:
                    raise ValueError(
                        "fuse_inception_variables needs BN-folded convs "
                        "(run fold_bn_variables first)")
            out["b012"] = {"conv": {
                "kernel": np.concatenate(
                    [np.asarray(c["kernel"], np.float32) for c in parts],
                    axis=-1),
                "bias": np.concatenate(
                    [np.asarray(c["bias"], np.float32) for c in parts],
                    axis=-1),
            }}
        return out

    return {"params": walk(folded["params"])}


def fuse_inception3_variables(
    fused: Dict[str, Any], scope: str = "tail"
) -> Dict[str, Any]:
    """Merge each InceptionBlock's b1b/b2b 3x3x3 convs into one
    block-diagonal "b12" conv (off-diagonal kernel blocks zero — exact).
    Input must already be Inception-1x1-fused (`fuse_inception_variables`).

    scope "tail" rewrites only the Mixed_5* blocks (the per-step tail, the
    measured low-MFU shapes); "all" rewrites every Inception block. Handles
    scan-stacked per-step params (leading stack dims) transparently.
    """
    if scope not in ("tail", "all"):
        raise ValueError(f"scope must be 'tail' or 'all', got {scope!r}")

    def walk(p, name=""):
        if not isinstance(p, dict):
            return p
        out = {k: walk(v, k) for k, v in p.items()}
        in_scope = scope == "all" or name.startswith("Mixed_5")
        if in_scope and {"b012", "b1b", "b2b", "b3b"}.issubset(out.keys()):
            c1 = out.pop("b1b")["conv"]
            c2 = out.pop("b2b")["conv"]
            k1 = np.asarray(c1["kernel"], np.float32)
            k2 = np.asarray(c2["kernel"], np.float32)
            if "bias" not in c1 or "bias" not in c2:
                raise ValueError(
                    "fuse_inception3_variables needs BN-folded convs "
                    "(run fold_bn_variables first)")
            # kernels are [*stack, 3,3,3, cin, cout]; block-diagonal merge
            # on the trailing (cin, cout) axes, stack dims broadcast along.
            lead = k1.shape[:-2]
            cin1, co1 = k1.shape[-2:]
            cin2, co2 = k2.shape[-2:]
            kernel = np.zeros(lead + (cin1 + cin2, co1 + co2), np.float32)
            kernel[..., :cin1, :co1] = k1
            kernel[..., cin1:, co1:] = k2
            out["b12"] = {"conv": {
                "kernel": kernel,
                "bias": np.concatenate(
                    [np.asarray(c1["bias"], np.float32),
                     np.asarray(c2["bias"], np.float32)], axis=-1),
            }}
        return out

    return {"params": walk(fused["params"])}


def inference_optimized_config(
    cfg: StepConfig, fuse_inception: bool = True,
    fuse_inception3: str = "none",
) -> StepConfig:
    """The config half of `optimize_for_inference` (no variables needed).

    Single owner of the serving-config flag set so CLI surfaces that only
    shape the PROGRAM (export.py --optimized: the folded variables are
    produced at serving time) cannot drift from the serving path — the
    round-4 audit found export.py hand-setting bn_folded/fused_inception
    but missing scan_unroll (the measured +1.6% unroll win) and
    fused_bn_relu=False.
    """
    return cfg.replace(bn_folded=True, fused_inception=fuse_inception,
                       fused_inception3=fuse_inception3,
                       fused_bn_relu=False, scan_unroll=True)


def optimize_for_inference(
    cfg: StepConfig, variables, fuse_inception: bool = True,
    fuse_inception3: str = "none",
) -> Tuple[StepConfig, Dict[str, Any]]:
    """Standard (cfg, variables) → inference-optimized (cfg', variables').

    The returned config builds the BN-free (and optionally
    fused-Inception) model; the returned variables are the matching folded
    tree. Run the pair through any inference entry point (detect_clip,
    make_detect_fn, evaluate_*).
    """
    if cfg.bn_folded:
        raise ValueError("variables for a bn_folded config are already folded")
    if fuse_inception3 != "none" and not fuse_inception:
        raise ValueError("fuse_inception3 requires fuse_inception")
    out = fold_bn_variables(variables)
    if fuse_inception:
        out = fuse_inception_variables(out)
    if fuse_inception3 != "none":
        out = fuse_inception3_variables(out, scope=fuse_inception3)
    # scan_unroll: serving programs compile once (persistent cache) and the
    # unrolled refinement loop drops the scan's carry materialization —
    # measured 455.8 vs 448.8 clips/s at B=128 (scripts/bench_unroll.py,
    # bit-exact: max |Δscores| = 0 — same stacked per-step params, indexed
    # instead of scanned).
    cfg_opt = inference_optimized_config(cfg, fuse_inception=fuse_inception,
                                         fuse_inception3=fuse_inception3)
    return cfg_opt, out


def optimize_for_inference_cli(cfg, overrides, variables=None):
    """``--optimized`` honoring explicit ``--set`` flags.

    `inference_optimized_config` force-sets the full serving flag set
    (bn_folded, fused_inception[3], fused_bn_relu, scan_unroll), which the
    round-4 review found silently clobbering explicit --set overrides of
    those same flags (e.g. ``--optimized --set scan_unroll=False`` exported
    the unrolled program anyway). Here the user's explicit flags win:
    fused_inception / fused_inception3 are routed into the variable
    transformation so program and variable tree stay matched, and every
    override is re-applied on top of the optimized config. ``bn_folded``
    cannot be overridden — the folded tree is what --optimized *means*.

    With ``variables=None`` only the config is transformed (export.py,
    which ships the program shape; the matching variables are produced at
    serving time). Returns ``(cfg, variables_or_None)``.
    """
    from step_tpu.utils.cli import apply_overrides, parse_overrides

    ov = parse_overrides(cfg, overrides)
    if ov.get("bn_folded") is False:
        raise ValueError("--set bn_folded=False conflicts with --optimized")
    fuse = ov.get("fused_inception", True)
    fuse3 = ov.get("fused_inception3", "none")
    if variables is None:
        cfg = inference_optimized_config(cfg, fuse_inception=fuse,
                                         fuse_inception3=fuse3)
        out = None
    else:
        cfg, out = optimize_for_inference(cfg, variables, fuse_inception=fuse,
                                          fuse_inception3=fuse3)
    return apply_overrides(cfg, overrides), out
