"""Hyperparameter priors as log-density terms.

Parity: reference runlmc/parameterization/priors.py (Gaussian, Gamma,
InverseGamma, HalfLaplace) and the prior-aware objective of
runlmc/parameterization/model.py:72-125. A prior is declared on the
*constrained* value; the objective adds ``lnpdf(value) +
log|d value/d raw|`` (change of variables), and its gradient w.r.t. the
raw parameter falls out of autodiff — no hand Jacobians.
"""

import dataclasses

import jax.numpy as jnp
from jax.scipy.special import gammaln


class Prior:
    domain = "real"

    def lnpdf(self, x):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Gaussian(Prior):
    mu: float
    var: float
    domain = "real"

    def __post_init__(self):
        if self.var <= 0:
            raise ValueError("variance %r should be positive" % (self.var,))

    def lnpdf(self, x):
        c = -0.5 * jnp.log(2 * jnp.pi * self.var)
        return c - 0.5 * jnp.square(x - self.mu) / self.var


@dataclasses.dataclass(frozen=True)
class Gamma(Prior):
    a: float
    b: float
    domain = "positive"

    def lnpdf(self, x):
        c = -gammaln(self.a) + self.a * jnp.log(self.b)
        return c + (self.a - 1) * jnp.log(x) - self.b * x

    @staticmethod
    def from_EV(E, V):
        """Gamma prior with prescribed mean/variance (parity: reference
        priors.py:117-127)."""
        return Gamma(a=float(E) ** 2 / V, b=float(E) / V)


@dataclasses.dataclass(frozen=True)
class InverseGamma(Prior):
    a: float
    b: float
    domain = "positive"

    def lnpdf(self, x):
        c = -gammaln(self.a) + self.a * jnp.log(self.b)
        return c - (self.a + 1) * jnp.log(x) - self.b / x


@dataclasses.dataclass(frozen=True)
class HalfLaplace(Prior):
    b: float
    domain = "positive"

    def lnpdf(self, x):
        return -jnp.log(self.b) - x / self.b


def check_domain(prior, transform):
    """Enforce the domain constraint the reference checks at
    ``set_prior`` time (runlmc/parameterization/priorizable.py:27-78):
    a positive-domain prior requires a positivity transform."""
    from runlmc_tpu.params import Softplus

    if prior.domain == "positive" and not isinstance(transform, Softplus):
        raise ValueError(
            "prior %r requires a positive parameter domain" % (prior,)
        )
