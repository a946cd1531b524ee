"""Multi-host data parallelism glue.

Reference parity: the reference scales with single-node
``torch.nn.DataParallel`` only (``train.py`` (recon)); this module is the
TPU-native extension to multi-host SPMD: ``jax.distributed`` process
bootstrap, per-host slicing of the global batch, and assembly of
host-local shards into one global sharded array (GSPMD then treats the
multi-host mesh exactly like the single-host one — same
``make_parallel_train_step``, XLA rides ICI/DCN for the all-reduce).

Single-process usage is a no-op throughout: every helper degrades to the
local path, so the same driver runs on one chip, one host with 8 chips, or
N hosts without code changes.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Bootstrap ``jax.distributed`` when running multi-host.

    Call ONCE, before any other jax API touches the backend. Arguments
    default from the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``); on TPU pods with no env
    set, ``jax.distributed.initialize()`` auto-detects from the metadata
    server. Single-process (no coordinator configured, no TPU pod) is a
    no-op.

    Returns (process_index, process_count) after initialization.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and jax.distributed.is_initialized():
        return jax.process_index(), jax.process_count()

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    # else: single-process — nothing to initialize.
    return jax.process_index(), jax.process_count()


def process_shard(n: int, process_count: int, process_index: int) -> np.ndarray:
    """Strided per-host slice of range(n), truncated so every host gets the
    SAME number of elements (SPMD requires equal batch counts per host —
    a ragged tail would deadlock the collective on the shorter hosts)."""
    per = n // process_count
    idx = np.arange(n)
    return idx[process_index::process_count][:per]


def make_global_batch(local_batch: dict, mesh, batch_axis: str = "data"):
    """Assemble per-host batch shards into global sharded arrays.

    Each host passes its LOCAL slice (global_batch/process_count examples);
    the result behaves as the global batch sharded over `batch_axis`.
    Single-process, this is exactly ``shard_batch`` (device_put with a
    NamedSharding). Non-array leaves (e.g. "meta") pass through.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(batch_axis))

    def put(x):
        if not isinstance(x, (np.ndarray, jax.Array)):
            return x
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(), *x.shape[1:])
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), global_shape
        )

    return {k: put(v) for k, v in local_batch.items()}
