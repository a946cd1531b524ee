"""Losses, matching, synthetic data, and an end-to-end overfit smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from step_tpu.config import StepConfig
from step_tpu.data.pipeline import build_model_batch, jitter_gt_proposals
from step_tpu.data.synthetic import SyntheticConfig, make_batch
from step_tpu.models.detector import STEPDetector
from step_tpu.train.losses import match_tubes, smooth_l1, step_losses
from step_tpu.train.trainer import create_train_state, train_step

CFG = StepConfig(
    dataset="synthetic",
    num_classes=4,
    frames_per_chunk=4,
    num_chunks=1,
    num_steps=2,
    iou_thresholds=(0.4, 0.5),
    step_loss_weights=(1.0, 1.0),
    temporal_extension=False,
    image_size=32,
    backbone_depth="tiny",
    feature_stride=8,
    pooled_size=4,
    max_proposals=14,
    max_gt_tubes=2,
    compute_dtype="float32",
    batch_size=2,
    gt_jitter_proposals=3,
    warmup_steps=2,
    total_steps=50,
    learning_rate=2e-3,
)

SYN = SyntheticConfig(image_size=32, num_frames=4, num_classes=4, max_boxes=2)


def test_smooth_l1():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    np.testing.assert_allclose(smooth_l1(x), [1.5, 0.125, 0.0, 0.125, 1.5])


def test_match_tubes():
    T = 4
    props = jnp.asarray(
        np.stack(
            [
                np.tile([[0, 0, 10, 10]], (T, 1)),
                np.tile([[0, 0, 9, 10]], (T, 1)),
                np.tile([[50, 50, 60, 60]], (T, 1)),
            ]
        ),
        jnp.float32,
    )
    gt = jnp.asarray(np.tile([[0, 0, 10, 10]], (1, T, 1)), jnp.float32)
    gt_mask = jnp.asarray([1.0])
    fmask = jnp.ones((T,))
    best_gt, best_iou, pos = match_tubes(props, gt, gt_mask, fmask, 0.5)
    np.testing.assert_array_equal(np.asarray(pos), [1.0, 1.0, 0.0])
    assert float(best_iou[0]) == pytest.approx(1.0)


def test_match_tubes_padded_gt_never_matches():
    T = 2
    props = jnp.asarray(np.tile([[0, 0, 10, 10]], (1, T, 1)), jnp.float32)
    gt = jnp.asarray(np.tile([[0, 0, 10, 10]], (2, T, 1)), jnp.float32)
    gt_mask = jnp.asarray([0.0, 0.0])  # all GT padded
    _, best_iou, pos = match_tubes(props, gt, gt_mask, jnp.ones((T,)), 0.5)
    assert float(pos.sum()) == 0.0


def test_synthetic_determinism_and_gt_consistency():
    a = make_batch(0, 2, SYN)
    b = make_batch(0, 2, SYN)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    assert a["rgb"].shape == (2, 4, 32, 32, 3)
    assert a["rgb"].min() >= 0 and a["rgb"].max() <= 1
    # GT tubes inside the image
    valid = a["gt_mask"] > 0
    assert a["gt_tubes"][valid].min() >= -1e-3
    assert a["gt_tubes"][valid].max() <= 32 + 1e-3


def test_jitter_gt_proposals():
    rng = np.random.RandomState(0)
    T = 4
    gt = np.tile(np.asarray([[5, 5, 20, 20]], np.float32)[:, None], (1, T, 1))
    jt, jm = jitter_gt_proposals(gt, np.asarray([1.0]), 3, 32.0, rng)
    assert jm.sum() == 3
    # jittered tubes near the GT
    assert np.abs(jt - gt).max() < 8.0
    # no valid GT → nothing
    jt2, jm2 = jitter_gt_proposals(gt, np.asarray([0.0]), 3, 32.0, rng)
    assert jm2.sum() == 0


def test_build_model_batch_shapes():
    raw = make_batch(0, 2, SYN)
    batch = build_model_batch(raw, CFG, train=True, seed=0)
    P, T = CFG.max_proposals, CFG.total_frames
    assert batch["proposals"].shape == (2, P, T, 4)
    assert batch["prop_mask"].shape == (2, P)
    assert batch["prop_mask"].sum() >= 11 * 2  # cuboids + jitters
    assert batch["gt_labels"].dtype == np.int32


@pytest.fixture(scope="module")
def state_and_model():
    model = STEPDetector(CFG)
    state = create_train_state(CFG, jax.random.PRNGKey(0), model)
    return state, model


def test_loss_finite_and_positive(state_and_model):
    state, model = state_and_model
    raw = make_batch(0, CFG.batch_size, SYN)
    batch = build_model_batch(raw, CFG, train=True, seed=0)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    outputs = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["rgb"], batch["proposals"], train=False,
    )
    loss, metrics = step_losses(
        outputs, batch["gt_tubes"], batch["gt_labels"], batch["gt_mask"],
        batch["prop_mask"], CFG,
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert metrics["cls_loss_per_step"].shape == (CFG.num_steps,)


def test_train_overfits_synthetic(state_and_model):
    """End-to-end: a few optimizer steps on one fixed batch must reduce loss."""
    state, model = state_and_model
    raw = make_batch(0, CFG.batch_size, SYN)
    batch = build_model_batch(raw, CFG, train=True, seed=0)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    fast_step = jax.jit(
        lambda s, b, r: train_step(s, b, r, CFG, model)
    )
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(8):
        state, metrics = fast_step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert float(metrics["grad_norm"]) > 0


def test_match_tubes_forced_best_match():
    """Every valid GT claims its best proposal even below the IoU threshold
    (the fix that makes inference-from-cuboids learnable)."""
    T = 4
    # one coarse proposal (low IoU with the small GT) + one far proposal
    props = jnp.asarray(
        np.stack(
            [
                np.tile([[0, 0, 32, 32]], (T, 1)),     # coarse, IoU ~0.04
                np.tile([[100, 100, 120, 120]], (T, 1)),
            ]
        ),
        jnp.float32,
    )
    gt = jnp.asarray(np.tile([[10, 10, 16, 16]], (1, T, 1)), jnp.float32)
    gt_mask = jnp.asarray([1.0])
    fmask = jnp.ones((T,))
    best_gt, best_iou, pos = match_tubes(props, gt, gt_mask, fmask, 0.5)
    np.testing.assert_array_equal(np.asarray(pos), [1.0, 0.0])  # forced
    assert float(best_iou[0]) < 0.5  # reported IoU stays the raw value
    # masked-out (padded) proposals are never forced
    pm = jnp.asarray([0.0, 1.0])
    _, _, pos2 = match_tubes(props, gt, gt_mask, fmask, 0.5, prop_mask=pm)
    np.testing.assert_array_equal(np.asarray(pos2), [0.0, 1.0])
    # forcing off → nothing matches
    _, _, pos3 = match_tubes(props, gt, gt_mask, fmask, 0.5,
                             force_best_match=False)
    assert float(pos3.sum()) == 0.0


def test_flow_stream_detector_trains():
    """input_stream='flow' (late-fusion protocol second detector): init
    builds a 2-channel stem and a train step on (rgb, flow) batches feeds
    the flow tensor as the primary input."""
    from step_tpu.config import StepConfig
    from step_tpu.data.synthetic import SyntheticConfig, make_batch, make_flow
    from step_tpu.data.pipeline import build_model_batch
    from step_tpu.models.detector import STEPDetector
    from step_tpu.train.trainer import create_train_state, train_step

    cfg = StepConfig(
        dataset="synthetic", num_classes=3, frames_per_chunk=2, num_chunks=1,
        num_steps=1, iou_thresholds=(0.4,), step_loss_weights=(1.0,),
        temporal_extension=False, image_size=32, backbone_depth="tiny",
        feature_stride=8, pooled_size=4, max_proposals=12, max_gt_tubes=2,
        compute_dtype="float32", batch_size=2, warmup_steps=1, total_steps=4,
        input_stream="flow", two_stream=False,
    )
    model = STEPDetector(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    stem_kernel = state.params["features"]["stem_rgb"]["Conv3d_1a_7x7"]
    kernels = [l for l in jax.tree_util.tree_leaves(stem_kernel) if l.ndim >= 4]
    assert kernels and kernels[0].shape[-2] == 2   # 2-channel (flow) stem

    raw = make_batch(0, 2, SyntheticConfig(image_size=32, num_frames=2,
                                           num_classes=3, max_boxes=2))
    raw["flow"] = np.stack([make_flow(c) for c in raw["rgb"]])
    batch = {kk: jnp.asarray(v) for kk, v in
             build_model_batch(raw, cfg, train=True, seed=0).items()
             if kk != "meta"}
    state2, metrics = train_step(state, batch, jax.random.PRNGKey(1), cfg, model)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_sigmoid_focal_loss_not_diluted_by_class_count():
    """The multilabel cls loss must punish the all-negative (collapsed)
    predictor more than a correct one, with a margin that does NOT vanish
    as C grows — plain mean-over-(P,C) BCE fails this at C=60 (measured
    mAP-0.0 collapse on the synthetic oracle, round 3)."""
    from step_tpu.train.losses import _cls_loss_sigmoid

    P, C = 11, 60
    rng = np.random.RandomState(0)
    positive = jnp.zeros((P,)).at[3].set(1.0)
    best_gt = jnp.zeros((P,), jnp.int32)
    gt_labels = jnp.zeros((1, C)).at[0, 7].set(1.0)   # one GT, class 7
    prop_mask = jnp.ones((P,))

    collapsed = jnp.full((P, C), -8.0)                 # sigmoid ~ 0 for all
    correct = jnp.full((P, C), -8.0).at[3, 7].set(8.0)
    l_collapsed = float(_cls_loss_sigmoid(collapsed, best_gt, positive,
                                          gt_labels, prop_mask))
    l_correct = float(_cls_loss_sigmoid(correct, best_gt, positive,
                                        gt_labels, prop_mask))
    # collapsed pays ~ a full positive focal-BCE term; correct pays ~0
    assert l_collapsed > l_correct + 1.0, (l_collapsed, l_correct)

    # gradient on the positive logit is not diluted by 1/C: at least ~alpha
    g = jax.grad(lambda x: _cls_loss_sigmoid(x, best_gt, positive, gt_labels,
                                             prop_mask))(collapsed)
    assert abs(float(g[3, 7])) > 0.2, float(g[3, 7])

    # focal_gamma=0 falls back to plain BCE but keeps positive normalization
    l0 = float(_cls_loss_sigmoid(collapsed, best_gt, positive, gt_labels,
                                 prop_mask, focal_gamma=0.0))
    assert np.isfinite(l0) and l0 > l_collapsed  # no modulation -> bigger


def test_multilabel_cls_head_prior_bias_init():
    """Multilabel detectors init the cls-head bias at logit(cls_prior) so
    initial sigmoid scores sit at the detection prior, not 0.5."""
    cfg = CFG.replace(multilabel=True, num_classes=6, cls_prior=0.01)
    model = STEPDetector(cfg)
    raw = make_batch(0, 1, SyntheticConfig(image_size=32, num_frames=4,
                                           num_classes=6, max_boxes=2))
    b = build_model_batch(raw, cfg, train=True, seed=0)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(b["rgb"]),
        jnp.asarray(b["proposals"]))
    bias = np.asarray(
        variables["params"]["steps"]["head"]["cls"]["bias"])
    expected = float(np.log(0.01 / 0.99))
    np.testing.assert_allclose(bias, expected, rtol=1e-5)
    # softmax config keeps zero bias
    model_sm = STEPDetector(CFG)
    v2 = jax.jit(model_sm.init)(
        jax.random.PRNGKey(0), jnp.asarray(b["rgb"]),
        jnp.asarray(b["proposals"]))
    assert np.all(np.asarray(
        v2["params"]["steps"]["head"]["cls"]["bias"]) == 0.0)


def test_remat_steps_gradient_equivalence():
    """cfg.remat_steps recomputes per-step activations in backward; the
    loss and gradients must be bit-comparable to the non-remat program."""
    import functools
    from step_tpu.train.trainer import train_step as _ts

    b = build_model_batch(make_batch(0, 2, SYN), CFG, train=True, seed=0)
    batch = {k: jnp.asarray(v) for k, v in b.items() if k != "meta"}
    rng = jax.random.PRNGKey(1)

    results = {}
    # remat_policy must be explicit: the config default flipped to "dots"
    # in round 4, so remat_steps=True alone would make the "full" arm
    # config-identical to the "dots" arm and leave the policy=None
    # lowering untested.
    arms = {"none": dict(remat_steps=False),
            "full": dict(remat_steps=True, remat_policy="full"),
            "dots": dict(remat_steps=True, remat_policy="dots")}
    for name, over in arms.items():
        cfg = CFG.replace(**over)
        model = STEPDetector(cfg)
        state = create_train_state(cfg, jax.random.PRNGKey(0), model)
        step = jax.jit(functools.partial(_ts, cfg=cfg, model=model))
        new_state, m = step(state, batch, rng)
        results[name] = (float(m["loss"]), float(m["grad_norm"]),
                         new_state.params)
    for arm in ("full", "dots"):
        np.testing.assert_allclose(results["none"][0], results[arm][0],
                                   rtol=1e-6)
        np.testing.assert_allclose(results["none"][1], results[arm][1],
                                   rtol=1e-5)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(np.asarray(a),
                                                     np.asarray(b_),
                                                     atol=1e-6),
            results["none"][2], results[arm][2])


def test_freeze_submodules_finetune_policy():
    """cfg.freeze_submodules=('features',): the frozen trunk gets zero
    param updates AND zero BN-stat updates (eval-mode BN), while the
    refinement steps still train (reference BaseNet freeze flags)."""
    cfg = CFG.replace(freeze_submodules=("features",), gt_jitter_proposals=0)
    model = STEPDetector(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), model)

    raw = make_batch(0, cfg.batch_size, SYN)
    batch = {k: jnp.asarray(v) for k, v in
             build_model_batch(raw, cfg, train=True, seed=0).items()
             if k != "meta"}
    state2 = state
    for i in range(3):   # step past the 0-LR warmup start
        state2, metrics = train_step(state2, batch, jax.random.PRNGKey(1),
                                     cfg, model)
    assert np.isfinite(float(metrics["loss"]))

    # frozen: params and batch_stats bit-identical after the steps
    jax.tree_util.tree_map(
        np.testing.assert_array_equal,
        state.params["features"], state2.params["features"])
    jax.tree_util.tree_map(
        np.testing.assert_array_equal,
        state.batch_stats["features"], state2.batch_stats["features"])
    # trainable: the per-step heads moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.params["steps"], state2.params["steps"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0

    # unfrozen control: the same step DOES move the trunk
    ctrl = CFG.replace(gt_jitter_proposals=0)
    cmodel = STEPDetector(ctrl)
    cstate = create_train_state(ctrl, jax.random.PRNGKey(0), cmodel)
    cstate2 = cstate
    for i in range(3):
        cstate2, _ = train_step(cstate2, batch, jax.random.PRNGKey(1),
                                ctrl, cmodel)
    cmoved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        cstate.params["features"], cstate2.params["features"])
    assert max(jax.tree_util.tree_leaves(cmoved)) > 0


def test_step_lr_schedule_multisteplr_semantics():
    """lr_schedule='step': linear warmup, then constant LR with
    multiplicative drops at ABSOLUTE milestone steps (torch MultiStepLR)."""
    from step_tpu.train.trainer import make_schedule

    cfg = CFG.replace(lr_schedule="step", learning_rate=0.1, warmup_steps=10,
                      lr_decay_milestones=(100, 200), lr_decay_rate=0.1)
    s = make_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), 0.0)
    np.testing.assert_allclose(float(s(5)), 0.05, rtol=1e-6)
    np.testing.assert_allclose(float(s(50)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.01, rtol=1e-6)   # absolute
    np.testing.assert_allclose(float(s(150)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(s(250)), 0.001, rtol=1e-6)
    # no warmup, no milestones: constant
    s2 = make_schedule(cfg.replace(warmup_steps=0, lr_decay_milestones=()))
    np.testing.assert_allclose(float(s2(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s2(999)), 0.1, rtol=1e-6)
    # the reference-shaped optimizer composes: SGD + step decay trains
    import pytest
    with pytest.raises(ValueError):
        make_schedule(cfg.replace(lr_schedule="nope"))
    cfg_sgd = cfg.replace(optimizer="sgd")
    model = STEPDetector(cfg_sgd)
    state = create_train_state(cfg_sgd, jax.random.PRNGKey(0), model)
    raw = make_batch(0, cfg_sgd.batch_size, SYN)
    batch = {k: jnp.asarray(v) for k, v in
             build_model_batch(raw, cfg_sgd, train=True, seed=0).items()
             if k != "meta"}
    state2, metrics = train_step(state, batch, jax.random.PRNGKey(1),
                                 cfg_sgd, model)
    assert np.isfinite(float(metrics["loss"]))


def test_adam_mu_dtype_bfloat16():
    """cfg.adam_mu_dtype="bfloat16" stores AdamW's first moment in bf16
    (halving that buffer's HBM traffic) while nu and the params stay f32,
    and a train step still produces a finite loss and an f32 update."""
    cfg = CFG.replace(adam_mu_dtype="bfloat16")
    model = STEPDetector(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), model)

    def leaf_dtypes(tree):
        return {l.dtype for l in jax.tree_util.tree_leaves(tree)
                if hasattr(l, "dtype")}

    bf16, f32 = jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32)
    adam = state.opt_state[1][0]  # chain(clip, adamw) -> adamw's ScaleByAdam
    assert leaf_dtypes(adam.mu) == {bf16}
    assert f32 in leaf_dtypes(adam.nu)
    assert bf16 not in leaf_dtypes(adam.nu)

    raw = make_batch(0, cfg.batch_size, SYN)
    batch = {k: jnp.asarray(v) for k, v in
             build_model_batch(raw, cfg, train=True, seed=0).items()
             if k != "meta"}
    state2, metrics = train_step(state, batch, jax.random.PRNGKey(1),
                                 cfg, model)
    assert np.isfinite(float(metrics["loss"]))
    assert leaf_dtypes(state2.params) == {f32}
    adam2 = state2.opt_state[1][0]
    assert leaf_dtypes(adam2.mu) == {bf16}


def _accum_batch(cfg, n, seed=0):
    raw = make_batch(seed, n, SYN)
    return {k: jnp.asarray(v) for k, v in
            build_model_batch(raw, cfg, train=True, seed=seed).items()
            if k != "meta"}


def test_grad_accum_identical_micro_batches_exact():
    """k identical micro-batches accumulated == one k×-batch step, exactly:
    with the big batch built as two identical halves, each micro-batch's
    BN statistics EQUAL the big batch's, so (dropout off) the accumulated
    micro-mean gradient, the mean-of-updates batch_stats, and the loss must
    all match the accum=1 program on the same batch (reference DataParallel
    effective-batch semantics (recon §3.1), single-chip analogue)."""
    base = CFG.replace(dropout_rate=0.0, batch_size=4)
    half = _accum_batch(base, 2)
    big = {k: jnp.concatenate([v, v]) for k, v in half.items()}

    results = {}
    for accum in (1, 2):
        cfg = base.replace(grad_accum_steps=accum)
        model = STEPDetector(cfg)
        state = create_train_state(cfg, jax.random.PRNGKey(0), model)
        new_state, m = train_step(state, big, jax.random.PRNGKey(1),
                                  cfg, model)
        results[accum] = (new_state, m)
    s1, m1 = results[1]
    s2, m2 = results[2]
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-5)
    # SUM-semantics metric: positives counted over the EFFECTIVE batch —
    # accumulation must sum micro-sums, not average them (an averaged
    # count would read k-fold low vs the accum=1 step)
    np.testing.assert_allclose(np.asarray(m1["num_positive_per_step"]),
                               np.asarray(m2["num_positive_per_step"]))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6),
        s1.params, s2.params)
    jax.tree.map(
        # 1e-5: big-batch variance sums 4 samples in one pass, the micro
        # path in two — mathematically equal, fp summation order differs
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        s1.batch_stats, s2.batch_stats)


def test_grad_accum_heterogeneous_micro_mean_semantics():
    """On heterogeneous micro-batches the accumulated step's loss is the
    mean of the per-micro losses and its batch_stats are the mean of the
    per-micro one-step updates (the documented semantics — exact for
    running means). Per-micro references come from accum=1 train_step on
    each half from the SAME initial state (dropout off ⇒ identical
    forward)."""
    base = CFG.replace(dropout_rate=0.0, batch_size=4, gt_jitter_proposals=0)
    cfg2 = base.replace(grad_accum_steps=2)
    model = STEPDetector(base)
    state = create_train_state(base, jax.random.PRNGKey(0), model)
    big = _accum_batch(base, 4, seed=3)   # 4 distinct clips
    halves = [{k: v[:2] for k, v in big.items()},
              {k: v[2:] for k, v in big.items()}]

    acc_state, m_acc = train_step(state, big, jax.random.PRNGKey(1), cfg2,
                                  model)

    micro_losses, micro_bs = [], []
    for h in halves:
        s_i, m_i = train_step(state, h, jax.random.PRNGKey(1), base, model)
        micro_losses.append(float(m_i["loss"]))
        micro_bs.append(s_i.batch_stats)
    np.testing.assert_allclose(float(m_acc["loss"]),
                               np.mean(micro_losses), rtol=1e-6)
    mean_bs = jax.tree.map(lambda a, b: (a + b) / 2.0, *micro_bs)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        acc_state.batch_stats, mean_bs)


def test_grad_accum_sharded_compiles_and_runs():
    """grad_accum_steps composes with the data-parallel mesh: the scan over
    micro-batches jits under GSPMD sharding (batch axis 'data') and one
    step produces a finite loss."""
    from step_tpu.parallel.mesh import (create_mesh, replicated_sharding,
                                        shard_batch)
    from step_tpu.train.trainer import make_parallel_train_step

    cfg = CFG.replace(batch_size=16, grad_accum_steps=2, dropout_rate=0.0)
    mesh = create_mesh((8,))
    model = STEPDetector(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    state = jax.device_put(state, replicated_sharding(mesh))
    batch = shard_batch(_accum_batch(cfg, 16), mesh)
    pstep = make_parallel_train_step(cfg, model, mesh)
    _, metrics = pstep(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_grad_accum_config_validation():
    with pytest.raises(ValueError, match="grad_accum_steps"):
        CFG.replace(grad_accum_steps=0)
    with pytest.raises(ValueError, match="micro-batches"):
        CFG.replace(batch_size=4, grad_accum_steps=3)
