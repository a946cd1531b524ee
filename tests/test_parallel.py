"""Mesh/sharding tests on the 8-virtual-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from step_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)


def test_create_mesh_default_uses_all_devices():
    mesh = create_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("data",)


def test_create_mesh_shape_validation():
    with pytest.raises(ValueError):
        create_mesh((len(jax.devices()) + 1,))


def test_shard_batch_places_leading_dim():
    mesh = create_mesh((8,))
    batch = {"x": jnp.arange(16.0).reshape(16, 1), "y": jnp.ones((16, 2, 3))}
    sharded = shard_batch(batch, mesh)
    for v in sharded.values():
        assert v.sharding.spec == P("data")
        # 8 shards of 2 rows each
        assert len(v.addressable_shards) == 8
        assert v.addressable_shards[0].data.shape[0] == 2


def test_replicated_sharding_spec():
    mesh = create_mesh((8,))
    x = jax.device_put(jnp.ones((4, 4)), replicated_sharding(mesh))
    assert x.sharding.spec == P()
    assert len(x.addressable_shards) == 8  # one full copy per device


def test_sharded_train_step_matches_single_device():
    """DP over 8 devices computes the same loss as 1 device (same batch)."""
    from step_tpu.config import StepConfig
    from step_tpu.data.pipeline import build_model_batch
    from step_tpu.data.synthetic import SyntheticConfig, make_batch
    from step_tpu.models.detector import STEPDetector
    from step_tpu.train.trainer import (
        create_train_state,
        make_parallel_train_step,
    )

    cfg = StepConfig(
        dataset="synthetic", num_classes=3, frames_per_chunk=2, num_chunks=1,
        num_steps=1, iou_thresholds=(0.4,), step_loss_weights=(1.0,),
        temporal_extension=False, image_size=32, backbone_depth="tiny",
        feature_stride=8, pooled_size=4, max_proposals=12, max_gt_tubes=2,
        compute_dtype="float32", batch_size=8, gt_jitter_proposals=0,
        warmup_steps=1, total_steps=4, dropout_rate=0.0,
    )
    raw = make_batch(0, 8, SyntheticConfig(image_size=32, num_frames=2,
                                           num_classes=3, max_boxes=2))
    batch = {k: jnp.asarray(v) for k, v in
             build_model_batch(raw, cfg, train=True, seed=0).items()}
    model = STEPDetector(cfg)
    rng = jax.random.PRNGKey(1)

    losses = {}
    for n in (1, 8):
        # fresh state per mesh: the train step donates its input state, and
        # device_put may alias buffers rather than copy
        state = create_train_state(cfg, jax.random.PRNGKey(0), model)
        mesh = create_mesh((n,), devices=jax.devices()[:n])
        st = jax.device_put(state, replicated_sharding(mesh))
        bt = shard_batch(batch, mesh)
        pstep = make_parallel_train_step(cfg, model, mesh)
        _, metrics = pstep(st, bt, rng)
        losses[n] = float(metrics["loss"])
    # Note: BatchNorm statistics are computed per compiled program over the
    # full (replicated-weights) batch either way — GSPMD keeps the math
    # global, so losses agree to float tolerance.
    assert losses[1] == pytest.approx(losses[8], rel=1e-3)


def test_process_shard_disjoint_equal():
    from step_tpu.parallel.distributed import process_shard

    n, pc = 103, 4
    shards = [process_shard(n, pc, i) for i in range(pc)]
    per = n // pc
    assert all(len(s) == per for s in shards)           # equal lengths
    flat = np.concatenate(shards)
    assert len(set(flat.tolist())) == len(flat)         # disjoint


def test_loader_process_sharding():
    """Two-process loaders draw the same global shuffle and split it into
    disjoint, equal-batch-count streams."""
    from step_tpu.config import StepConfig
    from step_tpu.data.loader import DataLoader
    from step_tpu.data.synthetic import SyntheticConfig, make_clip

    cfg = StepConfig(dataset="synthetic", num_classes=4, frames_per_chunk=2,
                     num_chunks=1, num_steps=1, iou_thresholds=(0.5,),
                     step_loss_weights=(1.0,), image_size=32,
                     backbone_depth="tiny", feature_stride=8, batch_size=2)
    syn = SyntheticConfig(image_size=32, num_frames=cfg.total_frames,
                          num_classes=4, max_boxes=2)

    class _DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return make_clip(i, syn)

    ds = _DS()
    loaders = [DataLoader(ds, cfg, batch_size=2, train=False, seed=3,
                          num_workers=1, process_count=2, process_index=i)
               for i in range(2)]
    assert len(loaders[0]) == len(loaders[1]) == 2      # 10 // 2 // 2
    orders = [ld._epoch_order(1) for ld in loaders]
    assert not set(orders[0]).intersection(orders[1])   # disjoint examples
    single = DataLoader(ds, cfg, batch_size=2, train=False, seed=3,
                        num_workers=1)._epoch_order(1)
    # both slices come from the same global shuffle
    assert set(orders[0]) | set(orders[1]) <= set(single.tolist())


def test_make_global_batch_single_process():
    from step_tpu.parallel.distributed import make_global_batch
    from step_tpu.parallel.mesh import create_mesh

    mesh = create_mesh((8,))
    batch = {"rgb": np.zeros((8, 3), np.float32), "meta": ["x"] * 8}
    out = make_global_batch(batch, mesh)
    assert out["rgb"].shape == (8, 3)
    assert out["meta"] == ["x"] * 8                     # passthrough
    shard_shapes = {s.data.shape for s in out["rgb"].addressable_shards}
    assert shard_shapes == {(1, 3)}                     # split over 8 devices


def _tiny_detect_cfg():
    from step_tpu.config import StepConfig

    return StepConfig(
        dataset="synthetic", num_classes=3, frames_per_chunk=2, num_chunks=1,
        num_steps=1, iou_thresholds=(0.4,), step_loss_weights=(1.0,),
        temporal_extension=False, image_size=32, backbone_depth="tiny",
        feature_stride=8, pooled_size=4, max_proposals=12, max_gt_tubes=2,
        compute_dtype="float32", batch_size=8, dropout_rate=0.0,
    )


def test_parallel_detect_matches_single_device():
    """Batch-sharded DP detect over 8 devices == single-device detect_clip."""
    from step_tpu.inference import detect_clip, make_parallel_detect_fn
    from step_tpu.models.detector import STEPDetector

    cfg = _tiny_detect_cfg()
    model = STEPDetector(cfg)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(8, cfg.total_frames, cfg.image_size,
                               cfg.image_size, 3), jnp.float32)
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, 8)
    variables = model.init(jax.random.PRNGKey(0), rgb[:1], proposals[:1],
                           prop_mask[:1])

    single = jax.jit(
        lambda v, r, p, m: detect_clip(v, r, p, m, cfg, model)
    )(variables, rgb, proposals, prop_mask)

    mesh = create_mesh((8,))
    pdetect = make_parallel_detect_fn(cfg, mesh, model)
    sharded = pdetect(variables, rgb, proposals, prop_mask)

    assert sharded["frame_boxes"].sharding.spec == P("data")
    for k in ("tubes", "tube_scores", "frame_boxes", "frame_scores",
              "frame_mask"):
        np.testing.assert_allclose(
            np.asarray(sharded[k]), np.asarray(single[k]),
            rtol=1e-4, atol=1e-4, err_msg=k)


def test_pad_batch_to_and_sharded_collect():
    """pad_batch_to pads ragged eval batches by edge-repeat; mesh-sharded
    collect_detections returns the same detections as single-device."""
    from step_tpu.evaluate import collect_detections
    from step_tpu.inference import pad_batch_to
    from step_tpu.data.synthetic import SyntheticConfig, make_clip
    from step_tpu.models.detector import STEPDetector

    x = np.arange(10, dtype=np.float32).reshape(5, 2)
    padded = pad_batch_to(x, 4)
    assert padded.shape == (8, 2)
    np.testing.assert_array_equal(padded[5:], np.repeat(x[-1:], 3, axis=0))
    assert pad_batch_to(x, 5) is x

    cfg = _tiny_detect_cfg()
    syn = SyntheticConfig(image_size=cfg.image_size,
                          num_frames=cfg.total_frames,
                          num_classes=cfg.num_classes,
                          max_boxes=cfg.max_gt_tubes)

    class _DS:
        def __len__(self):
            return 6                     # batch 4 -> ragged final batch of 2

        def __getitem__(self, i):
            return make_clip(i, syn)

    model = STEPDetector(cfg)
    rgb = jnp.zeros((1, cfg.total_frames, cfg.image_size, cfg.image_size, 3))
    proposals, prop_mask = STEPDetector.initial_proposals(cfg, 1)
    variables = model.init(jax.random.PRNGKey(0), rgb, proposals, prop_mask)

    base = collect_detections(variables, _DS(), cfg, model, batch_size=4)
    mesh = create_mesh((4,), devices=jax.devices()[:4])
    via_mesh = collect_detections(variables, _DS(), cfg, model, batch_size=4,
                                  mesh=mesh)
    assert len(base) == len(via_mesh)
    for (k1, c1, s1, b1), (k2, c2, s2, b2) in zip(base, via_mesh):
        assert k1 == k2 and c1 == c2
        assert s1 == pytest.approx(s2, rel=1e-4)
        np.testing.assert_allclose(b1, b2, rtol=1e-4, atol=1e-3)
