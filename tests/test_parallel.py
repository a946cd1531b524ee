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
