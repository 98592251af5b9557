from runlmc_tpu.ops import bttb, interpolation, operators, slq, solvers

__all__ = ["bttb", "interpolation", "operators", "slq", "solvers"]
