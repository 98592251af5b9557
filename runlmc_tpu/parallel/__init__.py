from runlmc_tpu.parallel.launcher import (
    global_mesh,
    initialize,
    is_distributed,
)
from runlmc_tpu.parallel.mesh import (
    default_mesh,
    pad_batch,
    probe_grid_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "default_mesh",
    "probe_grid_mesh",
    "shard_batch",
    "pad_batch",
    "replicated",
    "initialize",
    "global_mesh",
    "is_distributed",
]
