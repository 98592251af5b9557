from runlmc_tpu.lmc.kernel_spec import LMCKernelSpec

__all__ = ["LMCKernelSpec"]
