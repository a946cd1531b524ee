"""Device mesh + sharding specs — the distributed story.

The reference scales with single-process ``nn.DataParallel`` (``train.py``
(recon)); here parallelism is GSPMD: one `jax.sharding.Mesh`, batch sharded
over the 'data' axis, params replicated, gradients all-reduced by XLA over
ICI. Collective choices are owned by sharding specs, not hand-written comms.
"""

from step_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from step_tpu.parallel.distributed import (  # noqa: F401
    init_distributed,
    make_global_batch,
    process_shard,
)
