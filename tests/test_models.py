"""Shape/behavior tests for I3D and the progressive detector (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from step_tpu.config import StepConfig
from step_tpu.models.i3d import I3DStem, I3DTail, I3DClassifier
from step_tpu.models.detector import STEPDetector, feature_time_indices

TINY = StepConfig(
    dataset="synthetic",
    num_classes=4,
    frames_per_chunk=4,
    num_chunks=1,
    num_steps=2,
    iou_thresholds=(0.5, 0.6),
    step_loss_weights=(1.0, 1.0),
    temporal_extension=False,
    image_size=32,
    backbone_depth="tiny",
    feature_stride=8,
    pooled_size=4,
    max_proposals=12,
    compute_dtype="float32",
    batch_size=1,
)

TINY_EXT = TINY.replace(num_chunks=3, temporal_extension=True, num_steps=2)


def test_i3d_stem_shapes():
    m = I3DStem()
    x = jnp.zeros((1, 8, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    # temporal stride 4 (ceil), spatial stride 16, 832 channels
    assert out.shape == (1, 2, 4, 4, 832)


def test_i3d_tail_shapes():
    m = I3DTail(pool_5a=False)
    x = jnp.zeros((5, 2, 7, 7, 832))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (5, 2, 7, 7, 1024)


def test_i3d_classifier():
    m = I3DClassifier(num_classes=10)
    x = jnp.zeros((2, 8, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("kernel,H,W", [((7, 7, 7), 32, 32), ((3, 7, 7), 33, 30),
                                        ((7, 7, 7), 31, 35), ((1, 3, 3), 16, 16)])
def test_s2d_conv_matches_lax_same_conv(kernel, H, W):
    """space_to_depth_conv3d must be bit-equivalent (f32 tolerance) to the
    plain stride-(2,2,2) TF-SAME conv it replaces."""
    from step_tpu.ops.stem_conv import space_to_depth_conv3d

    rng = np.random.RandomState(0)
    C, F = 3, 8
    x = jnp.asarray(rng.randn(2, 6, H, W, C), jnp.float32)
    k = jnp.asarray(rng.randn(*kernel, C, F) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2, 2), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    out = space_to_depth_conv3d(x, k, (2, 2, 2))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_unit3d_s2d_same_params_same_output():
    """Unit3D(s2d=True) shares the parameter tree with the plain path and
    produces the same activations from the same variables."""
    from step_tpu.models.i3d import Unit3D

    x = jnp.asarray(np.random.RandomState(1).randn(1, 6, 32, 32, 3), jnp.float32)
    plain = Unit3D(16, (7, 7, 7), (2, 2, 2), s2d=False)
    s2d = Unit3D(16, (7, 7, 7), (2, 2, 2), s2d=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    v2 = s2d.init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(jnp.shape, v) == jax.tree.map(jnp.shape, v2)
    np.testing.assert_allclose(
        np.asarray(plain.apply(v, x)), np.asarray(s2d.apply(v, x)),
        rtol=1e-5, atol=1e-5,
    )


def test_unit3d_fused_bn_relu_matches_batchnorm_inference():
    """Unit3D(fuse_bn_relu=True) at inference == BatchNorm+ReLU path, from
    identical variables (incl. non-trivial running stats)."""
    from step_tpu.models.i3d import Unit3D

    x = jnp.asarray(np.random.RandomState(2).randn(2, 4, 8, 8, 3), jnp.float32)
    plain = Unit3D(8, (3, 3, 3))
    fused = Unit3D(8, (3, 3, 3), fuse_bn_relu=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    assert (jax.tree.map(jnp.shape, fused.init(jax.random.PRNGKey(0), x))
            == jax.tree.map(jnp.shape, v))
    # roll the running stats off their init values
    rng = np.random.RandomState(3)
    v = jax.tree.map(lambda a: a, v)
    bs = dict(v["batch_stats"])
    bs["bn"] = {
        "mean": jnp.asarray(rng.randn(8), jnp.float32) * 0.5,
        "var": jnp.asarray(rng.rand(8), jnp.float32) + 0.5,
    }
    v = {"params": v["params"], "batch_stats": bs}
    ref = plain.apply(v, x, train=False)
    out = fused.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_feature_time_indices():
    np.testing.assert_array_equal(np.asarray(feature_time_indices(4, 4)), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(feature_time_indices(18, 5)), [1, 5, 9, 12, 16])


@pytest.fixture(scope="module")
def tiny_detector():
    cfg = TINY
    model = STEPDetector(cfg)
    B, T = 1, cfg.total_frames
    rgb = jnp.asarray(np.random.RandomState(0).rand(B, T, cfg.image_size, cfg.image_size, 3), jnp.float32)
    props, pmask = STEPDetector.initial_proposals(cfg, B)
    variables = model.init(jax.random.PRNGKey(0), rgb, props)
    return cfg, model, variables, rgb, props


def test_detector_output_shapes(tiny_detector):
    cfg, model, variables, rgb, props = tiny_detector
    out = model.apply(variables, rgb, props)
    S, B, P, T = cfg.num_steps, 1, cfg.max_proposals, cfg.total_frames
    assert out["cls_logits"].shape == (S, B, P, cfg.num_cls_outputs)
    assert out["deltas"].shape == (S, B, P, T, 4)
    assert out["tubes"].shape == (S, B, P, T, 4)
    assert out["proposals"].shape == (S, B, P, T, 4)
    for k in ("cls_logits", "deltas", "tubes"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_detector_per_step_params_differ(tiny_detector):
    cfg, model, variables, rgb, props = tiny_detector
    # scan stacks per-step head params along axis 0 and they must differ
    kernel = variables["params"]["steps"]["head"]["cls"]["kernel"]
    assert kernel.shape[0] == cfg.num_steps
    assert not np.allclose(np.asarray(kernel[0]), np.asarray(kernel[1]))


def test_detector_proposals_chain(tiny_detector):
    cfg, model, variables, rgb, props = tiny_detector
    out = model.apply(variables, rgb, props)
    # step s+1's proposals are step s's refined tubes
    np.testing.assert_allclose(
        np.asarray(out["proposals"][1]), np.asarray(out["tubes"][0]), rtol=1e-5
    )
    # step 0's proposals are the initial cuboids
    np.testing.assert_allclose(np.asarray(out["proposals"][0]), np.asarray(props))


def test_detector_tubes_inside_image(tiny_detector):
    cfg, model, variables, rgb, props = tiny_detector
    out = model.apply(variables, rgb, props)
    tubes = np.asarray(out["tubes"])
    assert tubes.min() >= 0.0 and tubes.max() <= cfg.image_size


def test_detector_temporal_extension_masks():
    cfg = TINY_EXT
    model = STEPDetector(cfg)
    B, T = 1, cfg.total_frames
    rgb = jnp.zeros((B, T, cfg.image_size, cfg.image_size, 3))
    props, _ = STEPDetector.initial_proposals(cfg, B)
    variables = model.init(jax.random.PRNGKey(0), rgb, props)
    out = model.apply(variables, rgb, props)
    fm = np.asarray(out["frame_mask"])  # [S, T]
    Tc = cfg.frames_per_chunk
    # step 0: central chunk only; step 1: all three chunks
    np.testing.assert_allclose(fm[0], [0] * Tc + [1] * Tc + [0] * Tc)
    np.testing.assert_allclose(fm[1], [1] * (3 * Tc))


def test_detector_train_mode_mutates_batch_stats(tiny_detector):
    cfg, model, variables, rgb, props = tiny_detector
    out, mutated = model.apply(
        variables,
        rgb,
        props,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    before = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_detector_scan_unroll_is_exact(tiny_detector):
    """cfg.scan_unroll changes lowering only: outputs are bit-identical and
    the variable tree (stacked per-step params) is unchanged."""
    cfg, model, variables, rgb, props = tiny_detector
    ucfg = cfg.replace(scan_unroll=True)
    umodel = STEPDetector(ucfg)
    out = jax.jit(lambda v, r, p: model.apply(v, r, p))(variables, rgb, props)
    uout = jax.jit(lambda v, r, p: umodel.apply(v, r, p))(variables, rgb, props)
    assert set(out) == set(uout)
    for k in out:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(uout[k]),
                                      err_msg=k)
    # init under unroll produces the same tree/shapes (checkpoints portable)
    uvars = umodel.init(jax.random.PRNGKey(0), rgb, props, train=False)
    assert jax.tree.map(lambda a: a.shape, uvars) == \
        jax.tree.map(lambda a: a.shape, variables)


def test_all_presets_construct_and_validate():
    """Every BASELINE config preset constructs (StepConfig.__post_init__
    runs its invariant checks) with coherent step/threshold shapes."""
    from step_tpu.config import PRESETS
    assert set(PRESETS) == {"pr1_ref", "ucf_3step", "ava_3step",
                            "streaming", "two_stream_train"}
    for name, cfg in PRESETS.items():
        assert len(cfg.iou_thresholds) >= cfg.num_steps, name
        assert len(cfg.step_loss_weights) >= cfg.num_steps, name
        assert cfg.total_frames == cfg.frames_per_chunk * cfg.num_chunks, name
        assert cfg.max_proposals >= cfg.num_proposals, name
    assert PRESETS["pr1_ref"].num_steps == 1
    assert PRESETS["ava_3step"].multilabel
    assert PRESETS["two_stream_train"].two_stream


def test_scan_broadcast_inputs_bit_exact():
    """cfg.scan_broadcast_inputs moves the loop-invariant feat/ctx from the
    scan carry to nn.broadcast inputs — outputs AND gradients must be
    bit-identical (same math, same param tree), train and eval mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from step_tpu.config import StepConfig
    from step_tpu.models.detector import STEPDetector

    cfg = StepConfig(
        dataset="synthetic", num_classes=3, frames_per_chunk=2, num_chunks=3,
        num_steps=3, iou_thresholds=(0.4, 0.5, 0.6),
        step_loss_weights=(1.0, 1.0, 1.0), temporal_extension=True,
        image_size=32, backbone_depth="tiny", feature_stride=8,
        pooled_size=4, max_proposals=12, compute_dtype="float32",
        dropout_rate=0.0,
    )
    cfg_b = cfg.replace(scan_broadcast_inputs=True)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(2, cfg.total_frames, 32, 32, 3), jnp.float32)
    props, _ = STEPDetector.initial_proposals(cfg, 2)

    model = STEPDetector(cfg)
    model_b = STEPDetector(cfg_b)
    variables = model.init(jax.random.PRNGKey(0), rgb, props)
    # identical param tree: broadcast-input init must equal carry init
    vb = model_b.init(jax.random.PRNGKey(0), rgb, props)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(vb))
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(vb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    for train in (False, True):
        kw = ({"train": True, "rngs": {"dropout": jax.random.PRNGKey(7)},
               "mutable": ["batch_stats"]} if train else {})
        out_a = model.apply(variables, rgb, props, **kw)
        out_b = model_b.apply(variables, rgb, props, **kw)
        if train:
            out_a, out_b = out_a[0], out_b[0]
        for k in ("cls_logits", "deltas", "tubes", "proposals"):
            np.testing.assert_array_equal(np.asarray(out_a[k]),
                                          np.asarray(out_b[k]), err_msg=k)

    def loss(m):
        def f(params):
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                rgb, props, train=True,
                rngs={"dropout": jax.random.PRNGKey(7)},
                mutable=["batch_stats"])
            return (jnp.sum(out["cls_logits"].astype(jnp.float32) ** 2)
                    + jnp.sum(out["deltas"].astype(jnp.float32) ** 2))
        return jax.grad(f)(variables["params"])

    ga, gb = loss(model), loss(model_b)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
