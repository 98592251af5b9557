"""Generalized Schur (Bareiss-type) Cholesky factorization of a symmetric
positive-semidefinite Toeplitz matrix.

O(n^2) upper-Cholesky via hyperbolic generator rotations (M. Stewart 1997).
Functional parity with reference runlmc/linalg/shur.py:9-32, which is
research/dead code there as well; kept as a preconditioner research hook.
Host-side numpy — not part of the jit compute path.
"""

import logging

import numpy as np

_LOG = logging.getLogger(__name__)


def schur_toeplitz_cholesky(top):
    """Return upper-triangular C with C^T C = T for symmetric PSD Toeplitz
    T defined by first row ``top``. Stops early (leaving trailing zero
    rows) on numerical rank deficiency."""
    top = np.asarray(top, dtype=float)
    n = len(top)
    g = np.zeros((2, n))
    g[0] = top / top[0]
    g[1] = g[0]
    g[1, 0] = 0.0

    c = np.zeros((n, n))
    c[0] = g[0]

    g[0, 1:] = g[0, :-1]
    g[0, 0] = 0.0
    for i in range(1, n):
        rho = -g[1, i] / g[0, i]
        if abs(rho) >= 1:
            _LOG.warning(
                "rank-deficient Toeplitz at step %d/%d (|rho|=%f)",
                i, n, abs(rho),
            )
            break
        scale = np.sqrt(1 - rho) * np.sqrt(1 + rho)
        g[:, i:] = np.array([[1.0, rho], [rho, 1.0]]).dot(g[:, i:]) / scale
        c[i, i:] = g[0, i:]
        g[0, i + 1 :] = g[0, i:-1]
        g[0, i] = 0.0
    return c * np.sqrt(top[0])
