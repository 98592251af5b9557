from runlmc_tpu.mean.functions import Constant, MeanFunction, Zero

__all__ = ["MeanFunction", "Zero", "Constant"]
