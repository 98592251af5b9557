from runlmc_tpu.ops import bttb, interpolation, operators, schur, solvers

__all__ = ["bttb", "interpolation", "operators", "schur", "solvers"]
