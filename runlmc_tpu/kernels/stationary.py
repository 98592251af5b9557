"""Stationary kernel functions k(r) as static specs + pure evaluators.

The reference represents kernels as paramz Parameterized objects with
hand-coded per-hyperparameter gradients (runlmc/kern/*.py). Here a kernel
is a *hashable static spec* (usable as a jit static argument) that:

- declares its parameters (names, initial constrained values, transforms),
- evaluates ``k(dists; params)`` as a pure, autodiff-able jnp function on
  *raw* parameter dicts.

Gradients w.r.t. hyperparameters come from autodiff of the evaluation —
the reference's ``kernel_gradient``/``update_gradient`` plumbing has no
analog here by design.

Formula parity (constrained-space):
  RBF         k(r) = exp(-gamma r^2 / 2)                  rbf.py:39-40
  Matern32    k(r) = (1 + sqrt(3) gamma r) exp(-sqrt(3) gamma r)
                                                          matern32.py:39-41
  StdPeriodic k(r) = exp(-gamma sin^2(pi r / T) / 2)      std_periodic.py:44-48
  IdentityKern k(r) = 1[r = 0]                            identity.py:29-30
  Scaled      k(r) = sigma * k_inner(r)                   scaled.py:22-26
"""

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp

from runlmc_tpu.params import IDENTITY, POSITIVE, Softplus


@dataclasses.dataclass(frozen=True)
class StationaryKernel:
    """Base spec. ``active_dims``: tuple of input-dimension indices this
    kernel operates on (None = all; resolved by the model, parity:
    runlmc/kern/stationary_kern.py:37-51)."""

    name: str = "kern"
    active_dims: Optional[Tuple[int, ...]] = None

    def param_spec(self):
        """-> dict name -> (initial constrained value, Transform)."""
        return {}

    def init_raw_params(self):
        """Raw (unconstrained) initial parameter dict."""
        import numpy as np

        return {
            k: np.asarray(tr.inverse(v), dtype=float)
            for k, (v, tr) in self.param_spec().items()
        }

    def from_dist(self, raw_params, dists):
        """Evaluate k on a distance array given raw parameters."""
        raise NotImplementedError

    def with_active_dims(self, dims):
        return dataclasses.replace(self, active_dims=tuple(sorted(dims)))


@dataclasses.dataclass(frozen=True)
class RBF(StationaryKernel):
    name: str = "rbf"
    inv_lengthscale: float = 1.0

    def param_spec(self):
        return {"inv_lengthscale": (self.inv_lengthscale, POSITIVE)}

    def from_dist(self, raw_params, dists):
        gamma = POSITIVE.forward(raw_params["inv_lengthscale"])
        return jnp.exp(-0.5 * jnp.square(dists) * gamma)


@dataclasses.dataclass(frozen=True)
class Matern32(StationaryKernel):
    name: str = "matern32"
    inv_lengthscale: float = 1.0

    def param_spec(self):
        return {"inv_lengthscale": (self.inv_lengthscale, POSITIVE)}

    def from_dist(self, raw_params, dists):
        gamma = POSITIVE.forward(raw_params["inv_lengthscale"])
        scaled = dists * (math.sqrt(3.0) * gamma)
        return (1.0 + scaled) * jnp.exp(-scaled)


@dataclasses.dataclass(frozen=True)
class StdPeriodic(StationaryKernel):
    name: str = "std_periodic"
    inv_lengthscale: float = 1.0
    period: float = 1.0

    def param_spec(self):
        return {
            "inv_lengthscale": (self.inv_lengthscale, POSITIVE),
            "period": (self.period, POSITIVE),
        }

    def from_dist(self, raw_params, dists):
        gamma = POSITIVE.forward(raw_params["inv_lengthscale"])
        period = POSITIVE.forward(raw_params["period"])
        sin = jnp.sin((jnp.pi / period) * dists)
        return jnp.exp(-0.5 * jnp.square(sin) * gamma)


@dataclasses.dataclass(frozen=True)
class IdentityKern(StationaryKernel):
    name: str = "id"

    def from_dist(self, raw_params, dists):
        return (dists == 0.0).astype(jnp.result_type(float))


@dataclasses.dataclass(frozen=True)
class Scaled(StationaryKernel):
    """sigma * k_inner. Note: the reference creates the ``scale`` Param but
    never links it into the optimized tree (runlmc/kern/scaled.py:21 —
    ``link_parameter(self.scale)`` is absent), so its scale stays at its
    initial value during optimization there; here the scale is a real
    trainable parameter (set ``trainable_scale=False`` for frozen-scale
    parity)."""

    name: str = "scaled"
    inner: Optional[StationaryKernel] = None
    scale: float = 1.0
    trainable_scale: bool = True

    def __post_init__(self):
        if self.inner is None:
            raise ValueError("Scaled requires an inner kernel")
        if self.name == "scaled":
            object.__setattr__(self, "name", "scaled_" + self.inner.name)
        if self.active_dims is None:
            object.__setattr__(self, "active_dims", self.inner.active_dims)

    def param_spec(self):
        spec = {
            "inner__" + k: v for k, v in self.inner.param_spec().items()
        }
        if self.trainable_scale:
            spec["scale"] = (self.scale, POSITIVE)
        return spec

    def from_dist(self, raw_params, dists):
        inner_params = {
            k[len("inner__"):]: v
            for k, v in raw_params.items()
            if k.startswith("inner__")
        }
        if self.trainable_scale:
            sigma = POSITIVE.forward(raw_params["scale"])
        else:
            sigma = self.scale
        return sigma * self.inner.from_dist(inner_params, dists)
