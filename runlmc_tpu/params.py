"""Parameter transforms: unconstrained (optimizer) space <-> constrained
(model) space.

Replaces the reference's paramz transform machinery
(runlmc/parameterization/*, external `paramz` package): parameters live in
pytrees of *raw* unconstrained arrays; positivity is enforced with the
softplus bijector (identical to paramz's ``Logexp``:
f(raw) = log(1 + exp(raw))), and gradient chain rules come from autodiff
instead of hand-applied Jacobians.
"""

import jax
import jax.numpy as jnp
import numpy as np


class Transform:
    """Bijector from raw (unconstrained) to constrained space."""

    def forward(self, raw):
        raise NotImplementedError

    def inverse(self, value):
        raise NotImplementedError

    def log_jacobian(self, raw):
        """log |d forward / d raw| — the change-of-variables term paramz
        adds when a prior is placed on a transformed parameter
        (reference runlmc/parameterization/model.py:92-105)."""
        raise NotImplementedError


class IdentityTransform(Transform):
    def forward(self, raw):
        return raw

    def inverse(self, value):
        return value

    def log_jacobian(self, raw):
        return jnp.zeros_like(raw)


class Softplus(Transform):
    """paramz ``Logexp`` equivalent: value = log(1 + exp(raw)) > 0."""

    def forward(self, raw):
        return jax.nn.softplus(raw)

    def inverse(self, value):
        # Numerically stable softplus^-1: log(exp(v) - 1) = v + log1p(-exp(-v))
        value = np.asarray(value, dtype=float)
        return value + np.log1p(-np.exp(-value))

    def log_jacobian(self, raw):
        return jnp.log(jax.nn.sigmoid(raw))


IDENTITY = IdentityTransform()
POSITIVE = Softplus()
