"""Parity tests for the inference optimizations (models/optimize.py +
cfg.head_compact): BN folding, fused Inception 1x1 branches, and
active-slot head compaction must not change what any masked consumer sees.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from step_tpu.config import StepConfig
from step_tpu.inference import detect_clip
from step_tpu.models.detector import STEPDetector
from step_tpu.models.optimize import (fold_bn_variables,
                                      fuse_inception_variables,
                                      optimize_for_inference)

CFG = StepConfig(
    dataset="synthetic", num_classes=4, frames_per_chunk=2, num_chunks=3,
    num_steps=2, iou_thresholds=(0.4, 0.5), step_loss_weights=(1.0, 1.0),
    temporal_extension=True, image_size=32, backbone_depth="tiny",
    feature_stride=8, pooled_size=4, max_proposals=12, max_detections=4,
    compute_dtype="float32", batch_size=1, head_compact=False,
)


def _randomized_variables(cfg, seed=0):
    """Init + randomized batch_stats (mean/var identity would make BN
    folding trivially correct)."""
    model = STEPDetector(cfg)
    B, T = 1, cfg.total_frames
    rng = np.random.RandomState(seed)
    rgb = jnp.asarray(rng.rand(B, T, cfg.image_size, cfg.image_size, 3),
                      jnp.float32)
    props, pmask = STEPDetector.initial_proposals(cfg, B)
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), rgb, props)
    bs = jax.tree.map(lambda x: x, variables["batch_stats"])

    def rand_stats(path, leaf):
        name = path[-1].key
        r = np.random.RandomState(abs(hash(tuple(str(p) for p in path))) % 2**31)
        if name == "mean":
            return jnp.asarray(r.randn(*leaf.shape) * 0.2, leaf.dtype)
        return jnp.asarray(1.0 + r.rand(*leaf.shape), leaf.dtype)  # var

    bs = jax.tree_util.tree_map_with_path(rand_stats, bs)
    return model, {"params": variables["params"], "batch_stats": bs}, rgb, props, pmask


@pytest.fixture(scope="module")
def setup():
    return _randomized_variables(CFG)


def test_fold_bn_parity(setup):
    model, variables, rgb, props, pmask = setup
    ref = model.apply(variables, rgb, props, train=False)

    folded = fold_bn_variables(variables)
    cfg_f = CFG.replace(bn_folded=True)
    out = STEPDetector(cfg_f).apply(folded, rgb, props, train=False)

    np.testing.assert_allclose(np.asarray(out["cls_logits"]),
                               np.asarray(ref["cls_logits"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["tubes"]),
                               np.asarray(ref["tubes"]),
                               rtol=1e-4, atol=1e-3)


def test_fold_bn_removes_bn(setup):
    _, variables, *_ = setup
    folded = fold_bn_variables(variables)
    assert "batch_stats" not in folded

    def no_bn(tree):
        if isinstance(tree, dict):
            assert "bn" not in tree
            for v in tree.values():
                no_bn(v)

    no_bn(folded["params"])


def test_fused_inception_parity(setup):
    model, variables, rgb, props, pmask = setup
    ref = model.apply(variables, rgb, props, train=False)

    cfg_opt, vars_opt = optimize_for_inference(CFG, variables)
    assert cfg_opt.bn_folded and cfg_opt.fused_inception
    out = STEPDetector(cfg_opt).apply(vars_opt, rgb, props, train=False)

    np.testing.assert_allclose(np.asarray(out["cls_logits"]),
                               np.asarray(ref["cls_logits"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["tubes"]),
                               np.asarray(ref["tubes"]),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("scope", ["tail", "all"])
def test_fused_inception3_parity(setup, scope):
    """Block-diagonal merged 3x3x3 conv is exact (off-diagonal kernel
    blocks are zeros) vs the standard model, at both scopes."""
    model, variables, rgb, props, pmask = setup
    ref = model.apply(variables, rgb, props, train=False)

    cfg_opt, vars_opt = optimize_for_inference(CFG, variables,
                                               fuse_inception3=scope)
    assert cfg_opt.fused_inception3 == scope

    def check(p, name="", in_tail=False):
        if not isinstance(p, dict):
            return
        in_tail = in_tail or name == "tail" or name.startswith("Mixed_5")
        if "b012" in p:
            merged = scope == "all" or in_tail
            assert ("b12" in p) == merged, (name, scope)
            assert ("b1b" in p) == (not merged)
        for k, v in p.items():
            check(v, k, in_tail)

    check(vars_opt["params"])
    out = STEPDetector(cfg_opt).apply(vars_opt, rgb, props, train=False)
    np.testing.assert_allclose(np.asarray(out["cls_logits"]),
                               np.asarray(ref["cls_logits"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["tubes"]),
                               np.asarray(ref["tubes"]),
                               rtol=1e-4, atol=1e-3)


def test_fused_inception3_requires_fuse(setup):
    _, variables, *_ = setup
    with pytest.raises(ValueError):
        optimize_for_inference(CFG, variables, fuse_inception=False,
                               fuse_inception3="tail")
    with pytest.raises(ValueError):
        CFG.replace(bn_folded=True, fused_inception3="tail")
    with pytest.raises(ValueError):
        CFG.replace(bn_folded=True, fused_inception=True,
                    fused_inception3="bogus")


def test_fused_inception_requires_fold(setup):
    _, variables, *_ = setup
    with pytest.raises(ValueError):
        fuse_inception_variables({"params": variables["params"]})
    with pytest.raises(ValueError):
        CFG.replace(fused_inception=True)  # without bn_folded


def test_head_compact_parity(setup):
    """Active slots' logits/deltas and the whole detection surface match
    between the compacted and full head; padding slots' raw head outputs
    are allowed to differ (they are masked everywhere)."""
    model, variables, rgb, props, pmask = setup
    n_act = CFG.active_proposals
    assert n_act == 11 and CFG.max_proposals == 12

    ref = model.apply(variables, rgb, props, train=False)
    cfg_c = CFG.replace(head_compact=True)
    out = STEPDetector(cfg_c).apply(variables, rgb, props, train=False)

    np.testing.assert_allclose(
        np.asarray(out["cls_logits"])[:, :, :n_act],
        np.asarray(ref["cls_logits"])[:, :, :n_act], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["deltas"])[:, :, :n_act],
        np.asarray(ref["deltas"])[:, :, :n_act], rtol=1e-5, atol=1e-5)
    # padded slots' outputs are exactly zero
    assert float(np.abs(np.asarray(out["cls_logits"])[:, :, n_act:]).sum()) == 0.0

    det_ref = detect_clip(variables, rgb, props, pmask, CFG, model)
    det_c = detect_clip(variables, rgb, props, pmask, cfg_c,
                        STEPDetector(cfg_c))
    np.testing.assert_allclose(np.asarray(det_c["frame_scores"]),
                               np.asarray(det_ref["frame_scores"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(det_c["frame_boxes"]),
                               np.asarray(det_ref["frame_boxes"]),
                               rtol=1e-5, atol=1e-4)


def test_optimized_plus_compact_detection(setup):
    """The full serving stack (fold + fuse + compact) reproduces the
    standard detection surface."""
    model, variables, rgb, props, pmask = setup
    det_ref = detect_clip(variables, rgb, props, pmask, CFG, model)

    cfg_opt, vars_opt = optimize_for_inference(
        CFG.replace(head_compact=True), variables)
    det = detect_clip(vars_opt, rgb, props, pmask, cfg_opt,
                      STEPDetector(cfg_opt))
    np.testing.assert_allclose(np.asarray(det["frame_scores"]),
                               np.asarray(det_ref["frame_scores"]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(det["frame_boxes"]),
                               np.asarray(det_ref["frame_boxes"]),
                               rtol=1e-3, atol=5e-2)


def test_optimize_cli_overrides_win(setup):
    """--optimized + explicit --set serving flags: the user's flags must
    survive inference_optimized_config's force-set (round-4 review
    finding: export.py --optimized --set scan_unroll=False silently
    exported the unrolled program)."""
    from step_tpu.models.optimize import optimize_for_inference_cli

    _, variables, *_ = setup

    # default: the full serving flag set
    cfg, out = optimize_for_inference_cli(CFG, [], variables)
    assert cfg.scan_unroll and cfg.bn_folded and cfg.fused_inception
    assert out is not None and "bn_scale" not in str(out)

    # program-only flag override wins
    cfg, _ = optimize_for_inference_cli(
        CFG, ["scan_unroll=False"], variables)
    assert cfg.scan_unroll is False and cfg.bn_folded

    # variable-affecting flag override routes into the transformation:
    # fused_inception=False keeps the separate 1x1 branch convs
    cfg, out = optimize_for_inference_cli(
        CFG, ["fused_inception=False"], variables)
    assert cfg.fused_inception is False

    def _has_key(tree, name):
        if isinstance(tree, dict):
            return name in tree or any(_has_key(v, name) for v in tree.values())
        return False

    assert not _has_key(out["params"], "b12")  # unfused tree

    # config-only path (export.py: no variables at export time)
    cfg, out = optimize_for_inference_cli(CFG, ["scan_unroll=False"])
    assert out is None and cfg.scan_unroll is False and cfg.bn_folded

    # unfolding is not a thing --optimized can mean
    with pytest.raises(ValueError, match="bn_folded"):
        optimize_for_inference_cli(CFG, ["bn_folded=False"], variables)
