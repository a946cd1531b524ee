"""Pretrained-weight conversion: torch I3D checkpoints → step_tpu pytrees.

Reference parity: ``models/networks.py::BaseNet.__init__`` loading
Kinetics-pretrained I3D weights (recon). The released PyTorch I3D
checkpoints (piergiaj/pytorch-i3d naming) use keys like::

  Conv3d_1a_7x7.conv3d.weight                [O, I, D, H, W]
  Conv3d_1a_7x7.batch3d.{weight,bias,running_mean,running_var}
  Mixed_3b.b0.conv3d.weight                  (branch units b0, b1a, b1b, ...)
  logits.conv3d.{weight,bias}

Conversion rules:
  * conv kernels transpose torch OIDHW → flax DHWIO;
  * batch-norm weight/bias → params.bn.{scale,bias}, running stats →
    batch_stats.bn.{mean,var};
  * the flow stream's first conv (2-ch input) is made by channel-mean
    inflation of the RGB kernel when no flow checkpoint is given (standard
    two-stream initialization).

`load_i3d_into_detector` splits the classifier tree at the reference's cut
(stem → Mixed_4f into the shared FeatureNet; Mixed_5b/5c into every
refinement step's head tail, stacked S times along the scan axis).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp


_STEM_LAYERS = [
    "Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3",
    "Mixed_3b", "Mixed_3c",
    "Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f",
]
_TAIL_LAYERS = ["Mixed_5b", "Mixed_5c"]
_BRANCHES = ["b0", "b1a", "b1b", "b2a", "b2b", "b3b"]


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIDHW → flax DHWIO."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def _unit(sd: Dict[str, np.ndarray], prefix: str):
    """One Unit3D (conv + bn) from torch keys under `prefix`."""
    params = {"conv": {"kernel": _conv_kernel(np.asarray(sd[f"{prefix}.conv3d.weight"]))}}
    if f"{prefix}.conv3d.bias" in sd:
        params["conv"]["bias"] = np.asarray(sd[f"{prefix}.conv3d.bias"])
    stats = {}
    if f"{prefix}.batch3d.weight" in sd:
        params["bn"] = {
            "scale": np.asarray(sd[f"{prefix}.batch3d.weight"]),
            "bias": np.asarray(sd[f"{prefix}.batch3d.bias"]),
        }
        stats["bn"] = {
            "mean": np.asarray(sd[f"{prefix}.batch3d.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.batch3d.running_var"]),
        }
    return params, stats


def _torch_branch_names(name: str):
    """Map our branch names to the torch checkpoint's module names."""
    return {
        "b0": f"{name}.branch_0.conv3d_0a_1x1",
        "b1a": f"{name}.branch_1.conv3d_0a_1x1",
        "b1b": f"{name}.branch_1.conv3d_0b_3x3",
        "b2a": f"{name}.branch_2.conv3d_0a_1x1",
        "b2b": f"{name}.branch_2.conv3d_0b_3x3",
        "b3b": f"{name}.branch_3.conv3d_0b_1x1",
    }


def _layer(sd, name: str):
    """Stem conv or Inception block → (params, batch_stats) subtree."""
    if name.startswith("Conv3d"):
        return _unit(sd, name)
    params, stats = {}, {}
    mapping = _torch_branch_names(name)
    # fall back to flat "<name>.<branch>" naming if the nested one is absent
    for ours, theirs in mapping.items():
        prefix = theirs if f"{theirs}.conv3d.weight" in sd else f"{name}.{ours}"
        p, s = _unit(sd, prefix)
        params[ours] = p
        if s:
            stats[ours] = s
    return params, stats


# ---------------------------------------------------------------------------
# Key normalization across the public torch-I3D checkpoint families.
#
# The released Kinetics checkpoints come in (at least) two namings:
#   * piergiaj/pytorch-i3d  — CamelCase layers, branches b0/b1a/.../b3b,
#     batch-norm module named `bn`, classifier under `logits.conv3d`;
#   * hassony2/kinetics_i3d_pytorch — lowercase layers, branches are
#     Sequential indices (`branch_1.0`, `branch_1.1`, `branch_3.1`),
#     batch-norm named `batch3d`, classifier under `conv3d_0c_1x1.conv3d`.
# `normalize_i3d_state_dict` maps either (plus the already-canonical
# flat/nested namings used by our from-spec oracle) onto ONE canonical
# flat naming — `{Layer}.{branch}.conv3d.*` / `{Layer}.{branch}.batch3d.*`
# — and returns a dry-run report (scheme, mapped/missing/ignored keys) so a
# real checkpoint's load can be inspected before any weight math runs.
# ---------------------------------------------------------------------------

# our branch name → source module path per scheme (relative to the block)
_SCHEME_BRANCHES = {
    "piergiaj": {
        "b0": "b0", "b1a": "b1a", "b1b": "b1b",
        "b2a": "b2a", "b2b": "b2b", "b3b": "b3b",
    },
    "hassony2": {
        "b0": "branch_0", "b1a": "branch_1.0", "b1b": "branch_1.1",
        "b2a": "branch_2.0", "b2b": "branch_2.1", "b3b": "branch_3.1",
    },
    "nested": {
        "b0": "branch_0.conv3d_0a_1x1",
        "b1a": "branch_1.conv3d_0a_1x1", "b1b": "branch_1.conv3d_0b_3x3",
        "b2a": "branch_2.conv3d_0a_1x1", "b2b": "branch_2.conv3d_0b_3x3",
        "b3b": "branch_3.conv3d_0b_1x1",
    },
    "flat": {
        "b0": "b0", "b1a": "b1a", "b1b": "b1b",
        "b2a": "b2a", "b2b": "b2b", "b3b": "b3b",
    },
}
# (scheme → (layer-name transform, bn module name, logits prefix))
_SCHEME_STYLE = {
    "piergiaj": (lambda n: n, "bn", "logits"),
    "hassony2": (lambda n: n.lower(), "batch3d", "conv3d_0c_1x1"),
    "nested": (lambda n: n, "batch3d", "logits"),
    "flat": (lambda n: n, "batch3d", "logits"),
}


def _detect_scheme(sd: Dict[str, np.ndarray]) -> str:
    if "conv3d_1a_7x7.conv3d.weight" in sd:
        return "hassony2"
    if "Mixed_3b.branch_0.conv3d_0a_1x1.conv3d.weight" in sd:
        return "nested"
    if "Mixed_3b.b0.bn.weight" in sd:
        return "piergiaj"
    if "Mixed_3b.b0.batch3d.weight" in sd:
        return "flat"
    raise KeyError(
        "unrecognized I3D state_dict naming: found none of the known "
        "signature keys (hassony2 'conv3d_1a_7x7...', nested "
        "'Mixed_3b.branch_0.conv3d_0a_1x1...', piergiaj 'Mixed_3b.b0.bn...', "
        f"flat 'Mixed_3b.b0.batch3d...'); sample keys: {sorted(sd)[:5]}")


def normalize_i3d_state_dict(sd: Dict[str, np.ndarray], scheme: str | None = None):
    """Map any known torch-I3D checkpoint naming onto the canonical flat
    naming consumed by `convert_torch_i3d`. Returns (canonical_sd, report);
    `report` is a dict with `scheme`, `mapped` ({src: dst}), `missing`
    (expected source keys absent), and `ignored` (source keys not consumed,
    e.g. `num_batches_tracked`) — the key-mapping dry run."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    if scheme is None:
        scheme = _detect_scheme(sd)
    layer_name, bn_name, logits_prefix = _SCHEME_STYLE[scheme]
    branches = _SCHEME_BRANCHES[scheme]

    out: Dict[str, np.ndarray] = {}
    mapped: Dict[str, str] = {}
    missing = []

    def _take(src: str, dst: str, required: bool = True):
        if src in sd:
            out[dst] = sd[src]
            mapped[src] = dst
        elif required:
            missing.append(src)

    def _unit(src_prefix: str, dst_prefix: str):
        _take(f"{src_prefix}.conv3d.weight", f"{dst_prefix}.conv3d.weight")
        _take(f"{src_prefix}.conv3d.bias", f"{dst_prefix}.conv3d.bias",
              required=False)
        has_bn = f"{src_prefix}.{bn_name}.weight" in sd
        for ours, theirs in (("weight", "weight"), ("bias", "bias"),
                             ("running_mean", "running_mean"),
                             ("running_var", "running_var")):
            _take(f"{src_prefix}.{bn_name}.{theirs}",
                  f"{dst_prefix}.batch3d.{ours}", required=has_bn)

    for name in _STEM_LAYERS + _TAIL_LAYERS:
        src_layer = layer_name(name)
        if name.startswith("Conv3d"):
            _unit(src_layer, name)
        else:
            for ours, theirs in branches.items():
                _unit(f"{src_layer}.{theirs}", f"{name}.{ours}")
    # classifier head (optional — detection fine-tunes drop it)
    _take(f"{logits_prefix}.conv3d.weight", "logits.conv3d.weight",
          required=False)
    _take(f"{logits_prefix}.conv3d.bias", "logits.conv3d.bias",
          required=False)

    ignored = sorted(set(sd) - set(mapped))
    report = {"scheme": scheme, "mapped": mapped, "missing": missing,
              "ignored": ignored}
    return out, report


def convert_torch_i3d(sd: Dict[str, np.ndarray], include_logits: bool = True):
    """torch state_dict → {'params', 'batch_stats'} for `I3DClassifier`
    (stem/tail submodules named 'stem' and 'tail').

    Accepts any naming `normalize_i3d_state_dict` recognizes (piergiaj,
    hassony2, nested, flat — incl. a `module.` DataParallel prefix) and
    raises with the normalizer's missing-key list if a checkpoint is
    structurally incomplete."""
    sd, report = normalize_i3d_state_dict(sd)
    if report["missing"]:
        raise KeyError(
            f"I3D checkpoint (scheme={report['scheme']!r}) is missing "
            f"{len(report['missing'])} expected keys, e.g. "
            f"{report['missing'][:5]}")
    params = {"stem": {}, "tail": {}}
    stats = {"stem": {}, "tail": {}}
    for name in _STEM_LAYERS:
        p, s = _layer(sd, name)
        params["stem"][name] = p
        stats["stem"][name] = s
    for name in _TAIL_LAYERS:
        p, s = _layer(sd, name)
        params["tail"][name] = p
        stats["tail"][name] = s
    if include_logits and "logits.conv3d.weight" in sd:
        kernel = _conv_kernel(np.asarray(sd["logits.conv3d.weight"]))
        # The normalizer treats the classifier bias as optional (some public
        # ports build the logits conv bias-less); substitute zeros rather
        # than KeyError — the flax head always carries a bias param.
        bias = sd.get("logits.conv3d.bias")
        bias = (np.asarray(bias) if bias is not None
                else np.zeros(kernel.shape[-1], np.float32))
        params["logits"] = {"kernel": kernel, "bias": bias}
    as_jnp = lambda tree: jnp.asarray(tree) if isinstance(tree, np.ndarray) else tree
    import jax

    return {
        "params": jax.tree_util.tree_map(as_jnp, params),
        "batch_stats": jax.tree_util.tree_map(as_jnp, stats),
    }


def inflate_rgb_to_flow(kernel: jnp.ndarray, in_channels: int = 2) -> jnp.ndarray:
    """First-conv inflation: average RGB input channels, replicate to
    `in_channels`, rescale to preserve activation magnitude."""
    mean = jnp.mean(kernel, axis=3, keepdims=True)          # DHW 1 O
    return jnp.tile(mean, (1, 1, 1, in_channels, 1)) * (3.0 / in_channels)


def load_i3d_into_detector(detector_vars, i3d_vars, cfg, strict: bool = True):
    """Copy converted I3D weights into a STEPDetector variable tree.

    stem → features/stem_rgb (and stem_flow via first-conv inflation);
    tail → steps/head/tail, replicated along the per-step scan axis.
    Returns a new variable dict (does not mutate inputs).
    """
    import copy

    import jax

    from collections.abc import Mapping

    def shallow(tree, depth):
        """Copy mapping levels down to `depth` (handles FrozenDict) so the
        replaced subtrees below can be reassigned without mutating — or
        deep-copying — the input; leaves are immutable arrays, and a full
        deepcopy would transiently double the 22M-param tree in host
        memory."""
        if depth == 0 or not isinstance(tree, Mapping):
            return tree
        return {k: shallow(v, depth - 1) for k, v in tree.items()}

    params = shallow(detector_vars["params"], 3)
    stats = shallow(detector_vars["batch_stats"], 3)

    # --- stem(s) ---
    params["features"]["stem_rgb"] = i3d_vars["params"]["stem"]
    stats["features"]["stem_rgb"] = i3d_vars["batch_stats"]["stem"]
    if cfg.two_stream:
        flow_p = copy.deepcopy(i3d_vars["params"]["stem"])
        k = flow_p["Conv3d_1a_7x7"]["conv"]["kernel"]
        flow_p["Conv3d_1a_7x7"]["conv"]["kernel"] = inflate_rgb_to_flow(k)
        params["features"]["stem_flow"] = flow_p
        stats["features"]["stem_flow"] = copy.deepcopy(i3d_vars["batch_stats"]["stem"])

    # --- per-step head tails (stacked along the scan axis) ---
    S = cfg.num_steps
    stack = lambda x: jnp.stack([x] * S)
    params["steps"]["head"]["tail"] = jax.tree_util.tree_map(
        stack, i3d_vars["params"]["tail"]
    )
    stats["steps"]["head"]["tail"] = jax.tree_util.tree_map(
        stack, i3d_vars["batch_stats"]["tail"]
    )

    if strict:
        # shapes must agree with the randomly-initialized tree
        ref_p = jax.tree_util.tree_leaves(detector_vars["params"])
        new_p = jax.tree_util.tree_leaves(params)
        assert len(ref_p) == len(new_p), (len(ref_p), len(new_p))
        for a, b in zip(ref_p, new_p):
            assert a.shape == jnp.shape(b), (a.shape, jnp.shape(b))
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """A .pt/.pth file → flat {key: np.ndarray} state dict.

    Unwraps the containers public releases ship ({'state_dict': ...},
    {'model': ...}, a bare OrderedDict) and detaches every tensor to
    numpy. Naming normalization happens downstream
    (`normalize_i3d_state_dict`), so any recognized public scheme works."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "net"):
        if isinstance(obj, dict) and key in obj and isinstance(
                obj[key], dict):
            obj = obj[key]
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state-dict-like mapping, got "
                         f"{type(obj).__name__}")
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        if isinstance(v, np.ndarray):
            out[k] = v
    if not out:
        raise ValueError(f"{path}: no tensors found in checkpoint")
    return out


def pretrained_detector_variables(detector_vars, path: str, cfg,
                                  verbose: bool = True):
    """One call: torch I3D checkpoint FILE → detector variables with the
    Kinetics backbone loaded (reference ``BaseNet.__init__`` pretrained
    init (recon)). train.py's --pretrained-i3d surface.

    Prints the normalizer's scheme/missing/unused report when `verbose`
    (the dry-run report — a wrong-architecture file fails loudly here,
    before any training step)."""
    sd = load_torch_checkpoint(path)
    _, report = normalize_i3d_state_dict(sd)
    if verbose:
        print(f"pretrained I3D: scheme={report['scheme']!r} "
              f"mapped={len(report['mapped'])} "
              f"missing={len(report['missing'])} "
              f"ignored={len(report['ignored'])}")
        if report["missing"]:
            print(f"  missing (first 5): {report['missing'][:5]}")
    i3d = convert_torch_i3d(sd, include_logits=False)
    return load_i3d_into_detector(detector_vars, i3d, cfg)
