"""Weight converter: torch-naming state_dict → flax trees, conv parity."""

import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from step_tpu.config import StepConfig
from step_tpu.models.convert import (
    convert_torch_i3d,
    inflate_rgb_to_flow,
    load_i3d_into_detector,
    _STEM_LAYERS,
    _TAIL_LAYERS,
    _torch_branch_names,
)
from step_tpu.models.detector import STEPDetector
from step_tpu.models.i3d import I3DClassifier, INCEPTION_CHANNELS


def _fake_unit(sd, prefix, cin, cout, k, rng, bias=False):
    sd[f"{prefix}.conv3d.weight"] = rng.randn(cout, cin, *k).astype(np.float32) * 0.05
    if bias:
        sd[f"{prefix}.conv3d.bias"] = rng.randn(cout).astype(np.float32)
    else:
        sd[f"{prefix}.batch3d.weight"] = rng.rand(cout).astype(np.float32) + 0.5
        sd[f"{prefix}.batch3d.bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.batch3d.running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.batch3d.running_var"] = rng.rand(cout).astype(np.float32) + 0.5


def _fake_block(sd, name, cin, rng):
    c = INCEPTION_CHANNELS[name]
    names = _torch_branch_names(name)
    _fake_unit(sd, names["b0"], cin, c[0], (1, 1, 1), rng)
    _fake_unit(sd, names["b1a"], cin, c[1], (1, 1, 1), rng)
    _fake_unit(sd, names["b1b"], c[1], c[2], (3, 3, 3), rng)
    _fake_unit(sd, names["b2a"], cin, c[3], (1, 1, 1), rng)
    _fake_unit(sd, names["b2b"], c[3], c[4], (3, 3, 3), rng)
    _fake_unit(sd, names["b3b"], cin, c[5], (1, 1, 1), rng)
    return sum(c[i] for i in (0, 2, 4, 5))


def make_fake_torch_i3d(num_classes=400, seed=0):
    """A random state_dict in the torch I3D naming, correct shapes."""
    rng = np.random.RandomState(seed)
    sd = {}
    _fake_unit(sd, "Conv3d_1a_7x7", 3, 64, (7, 7, 7), rng)
    _fake_unit(sd, "Conv3d_2b_1x1", 64, 64, (1, 1, 1), rng)
    _fake_unit(sd, "Conv3d_2c_3x3", 64, 192, (3, 3, 3), rng)
    cin = 192
    for name in _STEM_LAYERS[3:] + _TAIL_LAYERS:
        cin = _fake_block(sd, name, cin, rng)
    sd["logits.conv3d.weight"] = rng.randn(num_classes, 1024, 1, 1, 1).astype(np.float32) * 0.01
    sd["logits.conv3d.bias"] = np.zeros(num_classes, np.float32)
    return sd


def test_converted_tree_matches_classifier_init():
    sd = make_fake_torch_i3d(num_classes=400)
    converted = convert_torch_i3d(sd)
    model = I3DClassifier(num_classes=400)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3)))

    ref_shapes = jax.tree_util.tree_map(jnp.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(jnp.shape, converted["params"])
    assert jax.tree_util.tree_structure(ref_shapes) == jax.tree_util.tree_structure(got_shapes)
    for a, b in zip(jax.tree_util.tree_leaves(ref_shapes), jax.tree_util.tree_leaves(got_shapes)):
        assert a == b
    bs_ref = jax.tree_util.tree_map(jnp.shape, ref["batch_stats"])
    bs_got = jax.tree_util.tree_map(jnp.shape, converted["batch_stats"])
    assert jax.tree_util.tree_structure(bs_ref) == jax.tree_util.tree_structure(bs_got)

    # converted weights actually run
    out = model.apply(converted, jnp.ones((1, 8, 32, 32, 3)))
    assert out.shape == (1, 400)
    assert np.isfinite(np.asarray(out)).all()


def test_conv_kernel_numerics_vs_torch():
    """Single Conv3d parity torch↔flax under the converter's transpose."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 8, 8, 3).astype(np.float32)  # NDHWC
    w = rng.randn(5, 3, 3, 3, 3).astype(np.float32) * 0.1  # OIDHW

    with torch.no_grad():
        conv = torch.nn.Conv3d(3, 5, 3, padding=1, bias=False)
        conv.weight.copy_(torch.from_numpy(w))
        xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))  # NCDHW
        want = conv(xt).numpy()
    want = np.transpose(want, (0, 2, 3, 4, 1))  # → NDHWC

    import flax.linen as nn
    from step_tpu.models.convert import _conv_kernel

    m = nn.Conv(5, kernel_size=(3, 3, 3), padding="SAME", use_bias=False)
    got = m.apply({"params": {"kernel": jnp.asarray(_conv_kernel(w))}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_full_model_activation_parity_vs_torch_i3d():
    """End-to-end conversion oracle (VERDICT r1 item 5): build the real
    torch I3D (TF-SAME semantics, checkpoint key naming), convert its
    randomly-initialized state_dict, and assert stem/tail/logits activations
    match layer-by-layer — on odd input sizes so TF-SAME's asymmetric
    padding (the classic silent killer, SURVEY §7) is exercised."""
    pytest.importorskip("torch")
    import torch

    from tests._torch_i3d import TorchI3D, randomize_bn_stats

    torch.manual_seed(0)
    net = TorchI3D(num_classes=17)
    randomize_bn_stats(net)
    net.eval()

    rng = np.random.RandomState(4)
    # odd T/H/W → asymmetric SAME pads in every strided conv/pool
    x = rng.randn(1, 9, 39, 39, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))  # NCDHW
        stem_t, tail_t, logits_t = net(xt)
    to_ndhwc = lambda t: np.transpose(t.numpy(), (0, 2, 3, 4, 1))

    converted = convert_torch_i3d(
        {k: v.numpy() for k, v in net.state_dict().items()}
    )

    from step_tpu.models.i3d import I3DStem, I3DTail

    stem_vars = {"params": converted["params"]["stem"],
                 "batch_stats": converted["batch_stats"]["stem"]}
    stem_j = I3DStem().apply(stem_vars, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(stem_j), to_ndhwc(stem_t),
                               rtol=1e-3, atol=5e-4)

    tail_vars = {"params": converted["params"]["tail"],
                 "batch_stats": converted["batch_stats"]["tail"]}
    tail_j = I3DTail(pool_5a=True).apply(tail_vars, stem_j)
    np.testing.assert_allclose(np.asarray(tail_j), to_ndhwc(tail_t),
                               rtol=1e-3, atol=1e-3)

    logits_j = I3DClassifier(num_classes=17).apply(converted, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               rtol=1e-3, atol=1e-3)

    # the space-to-depth stem must preserve converted-weight parity too
    stem_s2d = I3DStem(s2d=True).apply(stem_vars, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(stem_s2d), np.asarray(stem_j),
                               rtol=1e-4, atol=1e-4)


def test_inflate_rgb_to_flow():
    k = jnp.asarray(np.random.RandomState(0).randn(7, 7, 7, 3, 64).astype(np.float32))
    flow_k = inflate_rgb_to_flow(k, 2)
    assert flow_k.shape == (7, 7, 7, 2, 64)
    # responses to a constant input are preserved: sum over in-channels equal
    np.testing.assert_allclose(
        np.asarray(flow_k.sum(3)), np.asarray(k.sum(3)), rtol=1e-5
    )


def test_load_into_detector():
    cfg = StepConfig(
        dataset="ucf101_24", num_classes=4, frames_per_chunk=2, num_chunks=1,
        num_steps=2, iou_thresholds=(0.4, 0.5), step_loss_weights=(1.0, 1.0),
        temporal_extension=False, image_size=32, max_proposals=12,
        compute_dtype="float32",
    )
    model = STEPDetector(cfg)
    rgb = jnp.zeros((1, cfg.total_frames, 32, 32, 3))
    props, _ = STEPDetector.initial_proposals(cfg, 1)
    variables = model.init(jax.random.PRNGKey(0), rgb, props)

    i3d = convert_torch_i3d(make_fake_torch_i3d(), include_logits=False)
    loaded = load_i3d_into_detector(variables, i3d, cfg)

    # stem copied
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["features"]["stem_rgb"]["Conv3d_1a_7x7"]["conv"]["kernel"]),
        np.asarray(i3d["params"]["stem"]["Conv3d_1a_7x7"]["conv"]["kernel"]),
    )
    # tail stacked per step
    tail_k = loaded["params"]["steps"]["head"]["tail"]["Mixed_5b"]["b0"]["conv"]["kernel"]
    assert tail_k.shape[0] == cfg.num_steps
    np.testing.assert_allclose(np.asarray(tail_k[0]), np.asarray(tail_k[1]))
    # loaded tree still runs
    out = model.apply(loaded, rgb, props)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()


# ---------------------------------------------------------------------------
# Checkpoint-naming robustness (VERDICT r3 Next #6): the two common public
# torch-I3D key namings must both load, leaf-identical to the nested naming.
# ---------------------------------------------------------------------------

_NESTED_TO_BRANCH = {
    "branch_0.conv3d_0a_1x1": "b0",
    "branch_1.conv3d_0a_1x1": "b1a",
    "branch_1.conv3d_0b_3x3": "b1b",
    "branch_2.conv3d_0a_1x1": "b2a",
    "branch_2.conv3d_0b_3x3": "b2b",
    "branch_3.conv3d_0b_1x1": "b3b",
}
_BRANCH_TO_HASSONY = {
    "b0": "branch_0", "b1a": "branch_1.0", "b1b": "branch_1.1",
    "b2a": "branch_2.0", "b2b": "branch_2.1", "b3b": "branch_3.1",
}


def _rekey_piergiaj(sd):
    """nested fixture naming → piergiaj/pytorch-i3d naming."""
    out = {}
    for k, v in sd.items():
        for nested, ours in _NESTED_TO_BRANCH.items():
            k = k.replace(f".{nested}.", f".{ours}.")
        k = k.replace(".batch3d.", ".bn.")
        out[k] = v
        if k.endswith(".bn.running_var"):
            out[k.replace("running_var", "num_batches_tracked")] = np.int64(1)
    return out


def _rekey_hassony2(sd):
    """nested fixture naming → hassony2/kinetics_i3d_pytorch naming."""
    out = {}
    for k, v in sd.items():
        for nested, ours in _NESTED_TO_BRANCH.items():
            k = k.replace(f".{nested}.", f".{_BRANCH_TO_HASSONY[ours]}.")
        layer = k.split(".")[0]
        if layer.startswith(("Conv3d", "Mixed")):
            k = layer.lower() + k[len(layer):]
        elif layer == "logits":
            k = "conv3d_0c_1x1" + k[len(layer):]
        out[k] = v
    return out


@pytest.mark.parametrize("rekey,scheme", [(_rekey_piergiaj, "piergiaj"),
                                          (_rekey_hassony2, "hassony2")])
def test_convert_public_namings_leaf_identical(rekey, scheme):
    from step_tpu.models.convert import normalize_i3d_state_dict

    sd = make_fake_torch_i3d(num_classes=400)
    want = convert_torch_i3d(sd)
    renamed = rekey(sd)
    _, report = normalize_i3d_state_dict(renamed)
    assert report["scheme"] == scheme
    assert not report["missing"]
    got = convert_torch_i3d(renamed)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_module_prefix_stripped():
    """DataParallel-saved checkpoints carry a `module.` prefix."""
    sd = {f"module.{k}": v for k, v in make_fake_torch_i3d().items()}
    got = convert_torch_i3d(sd)
    want = convert_torch_i3d(make_fake_torch_i3d())
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_missing_keys_report_and_raise():
    from step_tpu.models.convert import normalize_i3d_state_dict

    sd = make_fake_torch_i3d()
    dropped = "Mixed_4c.branch_1.conv3d_0b_3x3.conv3d.weight"
    del sd[dropped]
    _, report = normalize_i3d_state_dict(sd)
    assert dropped in report["missing"]
    with pytest.raises(KeyError, match="missing"):
        convert_torch_i3d(sd)


def test_convert_report_ignored_keys():
    from step_tpu.models.convert import normalize_i3d_state_dict

    sd = _rekey_piergiaj(make_fake_torch_i3d())
    _, report = normalize_i3d_state_dict(sd)
    assert all(k.endswith("num_batches_tracked") for k in report["ignored"])
    assert len(report["ignored"]) > 0


def test_convert_unknown_naming_raises():
    with pytest.raises(KeyError, match="unrecognized"):
        convert_torch_i3d({"backbone.blocks.0.weight": np.zeros(3)})


def test_convert_biasless_classifier_gets_zero_bias():
    """The normalizer treats logits.conv3d.bias as optional (some public
    ports build the classifier conv bias-less); conversion must substitute
    zeros, not KeyError."""
    sd = make_fake_torch_i3d()
    del sd["logits.conv3d.bias"]
    out = convert_torch_i3d(sd)
    bias = np.asarray(out["params"]["logits"]["bias"])
    kernel = np.asarray(out["params"]["logits"]["kernel"])
    assert bias.shape == (kernel.shape[-1],)
    np.testing.assert_array_equal(bias, 0.0)


def test_load_torch_checkpoint_file_and_pretrained_helper(tmp_path):
    """The one-command pretrained path (train.py --pretrained-i3d): a
    saved .pt file (wrapped in a {'state_dict': ...} container, like the
    public releases) loads, converts, and lands in the detector's
    stem/tail subtrees — and fails loudly on a non-I3D file."""
    torch = pytest.importorskip("torch")

    from step_tpu.models.convert import (load_torch_checkpoint,
                                         pretrained_detector_variables)

    sd = make_fake_torch_i3d(num_classes=7)
    path = str(tmp_path / "fake_i3d.pt")
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd.items()}}, path)

    loaded_sd = load_torch_checkpoint(path)
    assert "logits.conv3d.weight" in loaded_sd

    cfg = StepConfig(
        dataset="ucf101_24", num_classes=4, frames_per_chunk=2,
        num_chunks=1, num_steps=2, iou_thresholds=(0.4, 0.5),
        step_loss_weights=(1.0, 1.0), temporal_extension=False,
        image_size=64, max_proposals=12, compute_dtype="float32",
    )
    model = STEPDetector(cfg)
    rgb = jnp.zeros((1, cfg.total_frames, 64, 64, 3))
    props, _ = STEPDetector.initial_proposals(cfg, 1)
    variables = model.init(jax.random.PRNGKey(0), rgb, props)
    out = pretrained_detector_variables(variables, path, cfg, verbose=False)
    # the stem conv kernel is the checkpoint's, transposed OIDHW -> DHWIO
    want = np.transpose(np.asarray(sd["Conv3d_1a_7x7.conv3d.weight"]),
                        (2, 3, 4, 1, 0))
    got = np.asarray(
        out["params"]["features"]["stem_rgb"]["Conv3d_1a_7x7"]["conv"]
           ["kernel"])
    np.testing.assert_allclose(got, want)
    # per-step tails stacked S times along the scan axis
    tail_kernel = jax.tree_util.tree_leaves(
        out["params"]["steps"]["head"]["tail"])[0]
    assert jnp.shape(tail_kernel)[0] == cfg.num_steps

    bad = str(tmp_path / "not_i3d.pt")
    torch.save({"state_dict": {"fc.weight": torch.zeros(3, 3)}}, bad)
    with pytest.raises(KeyError, match="unrecognized I3D"):
        pretrained_detector_variables(variables, bad, cfg, verbose=False)


def test_kinetics_drill_cli(tmp_path):
    """scripts/kinetics_drill.py end-to-end on a saved oracle checkpoint:
    prints the scheme report, passes activation parity, exits 0."""
    torch = pytest.importorskip("torch")
    import subprocess
    import sys

    from tests._torch_i3d import TorchI3D, randomize_bn_stats

    torch.manual_seed(3)
    net = TorchI3D(num_classes=11)
    randomize_bn_stats(net, seed=4)
    path = str(tmp_path / "oracle.pt")
    torch.save(net.state_dict(), path)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "kinetics_drill.py"),
         "--checkpoint", path],
        capture_output=True, text=True, env=env, cwd=repo, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "scheme='nested'" in proc.stdout
    assert proc.stdout.count("[OK]") == 3
    assert "backbone loaded" in proc.stdout
