"""Worker process for the 2-process `jax.distributed` data-parallel test.

Runs as `python _dist_worker.py <port> <process_id> <num_processes> <out.json>`
in an environment with the axon TPU client stripped and
`--xla_force_host_platform_device_count=<local devices>` set. Drives the
REAL multi-host glue (`parallel/distributed.py`): `init_distributed` with a
localhost coordinator, `process_shard` to slice the global batch, and
`make_global_batch`'s `jax.make_array_from_process_local_data` branch, then
one sharded train step over the global 2-process mesh. The parent test
compares the loss against a single-process run of the identical batch.
"""

import json
import sys


def make_tiny_cfg():
    """Same tiny DP config as tests/test_parallel.py's single-process
    equivalence test — one clip per global device."""
    from step_tpu.config import StepConfig

    return StepConfig(
        dataset="synthetic", num_classes=3, frames_per_chunk=2, num_chunks=1,
        num_steps=1, iou_thresholds=(0.4,), step_loss_weights=(1.0,),
        temporal_extension=False, image_size=32, backbone_depth="tiny",
        feature_stride=8, pooled_size=4, max_proposals=12, max_gt_tubes=2,
        compute_dtype="float32", batch_size=8, gt_jitter_proposals=0,
        warmup_steps=1, total_steps=4, dropout_rate=0.0,
    )


def make_global_numpy_batch(cfg):
    """The deterministic global batch — identical bytes in every process."""
    from step_tpu.data.pipeline import build_model_batch
    from step_tpu.data.synthetic import SyntheticConfig, make_batch

    raw = make_batch(0, cfg.batch_size,
                     SyntheticConfig(image_size=cfg.image_size,
                                     num_frames=cfg.total_frames,
                                     num_classes=cfg.num_classes,
                                     max_boxes=cfg.max_gt_tubes))
    return build_model_batch(raw, cfg, train=True, seed=0)


def main():
    port, pid, nproc, out_path = (sys.argv[1], int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from step_tpu.models.detector import STEPDetector
    from step_tpu.parallel.distributed import (
        init_distributed,
        make_global_batch,
        process_shard,
    )
    from step_tpu.parallel.mesh import create_mesh, replicated_sharding
    from step_tpu.train.trainer import (
        create_train_state,
        make_parallel_train_step,
    )

    idx, count = init_distributed(f"localhost:{port}", nproc, pid)
    assert (idx, count) == (pid, nproc), (idx, count)

    cfg = make_tiny_cfg()
    full = make_global_numpy_batch(cfg)
    rows = process_shard(cfg.batch_size, count, idx)
    local = {k: np.asarray(v)[rows] for k, v in full.items()}

    mesh = create_mesh((len(jax.devices()),), ("data",))
    batch = make_global_batch(local, mesh)

    model = STEPDetector(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    state = jax.device_put(state, replicated_sharding(mesh))
    pstep = make_parallel_train_step(cfg, model, mesh)
    state, metrics = pstep(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])  # fully-replicated → addressable everywhere

    with open(out_path, "w") as f:
        json.dump({"loss": loss, "process_index": idx,
                   "process_count": count,
                   "global_devices": len(jax.devices()),
                   "local_devices": len(jax.local_devices())}, f)


if __name__ == "__main__":
    main()
