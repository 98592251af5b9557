from runlmc_tpu.parallel.mesh import (
    default_mesh,
    pad_batch,
    replicated,
    shard_batch,
)

__all__ = [
    "default_mesh",
    "shard_batch",
    "pad_batch",
    "replicated",
]
