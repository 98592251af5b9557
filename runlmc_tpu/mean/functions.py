"""Mean functions (parity: runlmc/mean/*.py).

As in the reference, these are defined and tested but not yet wired into
InterpolatedLLGP, which is zero-mean (reference README.md:22 documents
the same restriction; "mean functions" is roadmap there too,
README.md:107). Kept 1-D-input like the reference
(mean_function.py:26)."""

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MeanFunction:
    """Static spec for a multi-output mean function m_d(x)."""

    input_dim: int = 1
    output_dim: int = 1

    def __post_init__(self):
        if self.input_dim != 1:
            raise ValueError(
                "mean functions only support 1-D inputs (parity with "
                "reference mean_function.py:26)"
            )

    def init_raw_params(self):
        return {}

    def mean(self, raw_params, Xs):
        """Per-output means: list of (n_d,) arrays."""
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Zero(MeanFunction):
    def mean(self, raw_params, Xs):
        return [jnp.zeros(len(X)) for X in Xs]


@dataclasses.dataclass(frozen=True)
class Constant(MeanFunction):
    """Per-output constant offset (parity: runlmc/mean/constant.py)."""

    def init_raw_params(self):
        return {"offsets": np.zeros(self.output_dim)}

    def mean(self, raw_params, Xs):
        c = jnp.asarray(raw_params["offsets"])
        return [jnp.full(len(X), c[d]) for d, X in enumerate(Xs)]
