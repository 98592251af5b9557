"""Direct Woodbury factorization of the SKI covariance (dense grid mode).

With the grid kernel materialized (grid.py 'dense' mode), the SKI
covariance of each group factors through its grid eigendecomposition
K_UU = U diag(lam) U^T, so the full covariance is

    K = sum_g W_g K_UU_g W_g^T + diag(eps)  =  V V^T + D,
    V = [ W_g U_g diag(sqrt(lam_g)) ]_g  (n x k, k = sum_g rank_g),

and Woodbury gives a *closed-form* inverse and determinant:

    K^-1 = D^-1 - D^-1 V C^-1 V^T D^-1,   C = I_k + V^T D^-1 V,
    log det K = log det C + sum_i log D_ii.

This replaces the reference's iterative prediction machinery — the
pooled per-test-point MINRES solves of 'on-the-fly' mode
(runlmc/models/interpolated_llgp.py:390-397) and the D*m pooled solves
of 'precompute' mode (:358-388) — with a few MXU matmuls: solving
against B right-hand sides costs O(B(nk + k^2)) after an O(nk^2 + k^3)
one-off factorization per hyperparameter setting. It also upgrades
log-likelihood reporting: the reference computes log det via an O(n^3)
dense Cholesky (interpolated_llgp.py:262-276); here the SKI log det is
exact in O(nk^2).

Numerically-zero grid eigenvalues are truncated (RBF-type grid kernels
are strongly rank-deficient), so k is the *effective* grid rank, often
far below D*m. C has eigenvalues >= 1, so factoring/inverting it is
stable at any conditioning of K.

Work split (measured on TPU v5e): dense f64 matmuls run at ~4 TFLOPS on
the MXU, but f64 Cholesky/eigh are pathologically slow in XLA-TPU — so
the k x k eigendecompositions and the Cholesky/inverse of C run on the
HOST in LAPACK f64 (one-offs per hyperparameter setting), while every
O(n k) contraction stays on device.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


class WoodburyFactor(NamedTuple):
    V: jax.Array  # (n, k) low-rank factor, K = V V^T + diag(noise_n)
    noise_n: jax.Array  # (n,)
    C_inv: jax.Array  # (k, k) inverse of C = I + V^T D^-1 V
    logdet: float  # log det K (python float, host-computed)

    @property
    def n(self):
        return self.V.shape[0]

    @property
    def k(self):
        return self.V.shape[1]

    def solve(self, rhs):
        """K^-1 rhs for rhs (..., n) — closed form, no iteration."""
        r = rhs / self.noise_n
        s = jnp.einsum("nk,...n->...k", self.V, r, precision=_HI)
        t = jnp.einsum("kl,...l->...k", self.C_inv, s, precision=_HI)
        back = jnp.einsum("nk,...k->...n", self.V, t, precision=_HI)
        return r - back / self.noise_n

    def matvec(self, x):
        """K x (for residual checks)."""
        vx = jnp.einsum("nk,...n->...k", self.V, x, precision=_HI)
        return (
            jnp.einsum("nk,...k->...n", self.V, vx, precision=_HI)
            + self.noise_n * x
        )


def grid_eig_factors(kuu_dense_list, rtol=1e-12):
    """Host-side truncated eigendecompositions of the per-group dense
    grid kernels. Returns a list of (Dm_g, k_g) float64 arrays
    U_g sqrt(lam_g) keeping eigenvalues > rtol * lam_max."""
    factors = []
    for kuu in kuu_dense_list:
        kuu = np.asarray(kuu, dtype=np.float64)
        lam, u = np.linalg.eigh(kuu)
        cut = max(lam[-1], 0.0) * rtol
        keep = lam > cut
        factors.append(u[:, keep] * np.sqrt(lam[keep]))
    return factors


def build_woodbury(groups, noise_n, rtol=1e-12) -> WoodburyFactor:
    """Factor the SKI covariance from dense-mode group states.

    ``groups``: GroupState tuple with ``KUU_dense`` set (grid.py).
    ``noise_n``: per-data-point noise (n,).
    """
    for g in groups:
        if g.KUU_dense is None:
            raise ValueError(
                "Woodbury factorization requires dense grid mode"
            )
    factors = grid_eig_factors([g.KUU_dense for g in groups], rtol=rtol)

    dtype = noise_n.dtype
    cols = []
    for g, f in zip(groups, factors):
        # V_g = W_g (U_g sqrt(lam)): interp maps (..., Dm) -> (..., n)
        fT = jnp.asarray(f.T, dtype=dtype)  # (k_g, Dm)
        cols.append(g.interp.matvec(fT).T)  # (n, k_g)
    V = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]

    # C = I + V^T D^-1 V on device (O(n k^2) MXU matmul) ...
    vd = V / noise_n[:, None]
    C = jnp.einsum("nk,nl->kl", V, vd, precision=_HI)
    C = C + jnp.eye(V.shape[1], dtype=dtype)
    # ... Cholesky + inverse on host (f64 LAPACK; XLA-TPU f64
    # factorizations are orders of magnitude slower).
    import scipy.linalg

    C_host = np.asarray(C, dtype=np.float64)
    L = np.linalg.cholesky(C_host)
    C_inv = scipy.linalg.cho_solve((L, True), np.eye(L.shape[0]))
    logdet = float(
        2.0 * np.log(np.diagonal(L)).sum()
        + np.log(np.asarray(noise_n, dtype=np.float64)).sum()
    )
    return WoodburyFactor(
        V=V,
        noise_n=noise_n,
        C_inv=jnp.asarray(C_inv, dtype=dtype),
        logdet=logdet,
    )
