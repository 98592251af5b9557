from runlmc_tpu.parallel.mesh import default_mesh, pad_batch, shard_batch
from runlmc_tpu.parallel.training import AdaDeltaState, make_train_step

__all__ = [
    "default_mesh",
    "shard_batch",
    "pad_batch",
    "make_train_step",
    "AdaDeltaState",
]
