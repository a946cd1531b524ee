"""2-process `jax.distributed` DP equivalence (VERDICT r3 Next #4).

Spawns two real OS processes with a localhost coordinator (Gloo CPU
collectives, 4 virtual devices each → one global 8-device mesh) running
`tests/_dist_worker.py`, which drives `init_distributed` + `process_shard`
+ `make_global_batch` + one sharded train step. The global loss must match
a single-process 8-device run of the identical batch (the strided
process_shard order is a batch permutation; per-example losses are averaged
and BatchNorm statistics are global under GSPMD, so the loss is
permutation-invariant up to float reassociation).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(devices_per_proc: int) -> dict:
    env = dict(os.environ)
    # strip the axon TPU client: worker compiles locally on CPU
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={devices_per_proc}"
    ).strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_two_process_dp_loss_matches_single_process(tmp_path):
    from _dist_worker import make_global_numpy_batch, make_tiny_cfg

    from step_tpu.models.detector import STEPDetector
    from step_tpu.parallel.mesh import (
        create_mesh,
        replicated_sharding,
        shard_batch,
    )
    from step_tpu.train.trainer import (
        create_train_state,
        make_parallel_train_step,
    )

    port = _free_port()
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_dist_worker.py")
    env = _worker_env(devices_per_proc=4)
    outs = [tmp_path / f"proc{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2", str(outs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    results = []
    for p, out in zip(procs, outs):
        stdout, stderr = p.communicate(timeout=900)
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\nstdout:{stdout}\nstderr:{stderr[-3000:]}"
        )
        results.append(json.loads(out.read_text()))

    assert all(r["process_count"] == 2 for r in results)
    assert all(r["global_devices"] == 8 for r in results)
    assert all(r["local_devices"] == 4 for r in results)
    # both processes observe the SAME replicated global loss
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)

    # single-process 8-device reference on the identical batch
    cfg = make_tiny_cfg()
    batch = {k: jnp.asarray(v)
             for k, v in make_global_numpy_batch(cfg).items()}
    model = STEPDetector(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), model)
    mesh = create_mesh((8,))
    st = jax.device_put(state, replicated_sharding(mesh))
    bt = shard_batch(batch, mesh)
    pstep = make_parallel_train_step(cfg, model, mesh)
    _, metrics = pstep(st, bt, jax.random.PRNGKey(1))
    single = float(metrics["loss"])

    assert results[0]["loss"] == pytest.approx(single, rel=1e-3)
