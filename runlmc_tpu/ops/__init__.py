from runlmc_tpu.ops import bttb, interpolation, operators, solvers

__all__ = ["bttb", "interpolation", "operators", "solvers"]
