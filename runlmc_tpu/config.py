"""Global configuration helpers.

The library is dtype-polymorphic: numerical parity tests against dense
oracles run on CPU under ``jax_enable_x64`` in float64 (matching the
reference, which is float64 throughout — reference:
runlmc/linalg/matrix.py:22), while the TPU production path runs float32.
"""

import jax
import jax.numpy as jnp


def default_dtype():
    """Float dtype honoring ``jax_enable_x64``: f64 when enabled, else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_int_dtype():
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32


# Machine epsilon used by numerical heuristics (reference:
# runlmc/util/numpy_convenience.py EPS).
EPS = 1e-10
