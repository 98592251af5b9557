from runlmc_tpu.models.exact_lmc import ExactLMC
from runlmc_tpu.models.interpolated_llgp import InterpolatedLLGP
from runlmc_tpu.models.multigp import MultiGP
from runlmc_tpu.models.optimization import AdaDelta

__all__ = ["MultiGP", "InterpolatedLLGP", "ExactLMC", "AdaDelta"]
