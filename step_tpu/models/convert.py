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


def convert_torch_i3d(sd: Dict[str, np.ndarray], include_logits: bool = True):
    """torch state_dict → {'params', 'batch_stats'} for `I3DClassifier`
    (stem/tail submodules named 'stem' and 'tail')."""
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
        params["logits"] = {
            "kernel": _conv_kernel(np.asarray(sd["logits.conv3d.weight"])),
            "bias": np.asarray(sd["logits.conv3d.bias"]),
        }
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
