"""Shared test helpers: adversarial PSD Toeplitz generators and dense
oracles (strategy parity: reference runlmc/util/testing_utils.py:61-168)."""

import numpy as np
import scipy.linalg as la


def dense_toeplitz(top):
    return la.toeplitz(np.asarray(top))


def random_toep(rng, n):
    """Random PSD-ish Toeplitz top row: decreasing positive entries."""
    top = np.sort(np.abs(rng.standard_normal(n)))[::-1]
    top[0] += n  # diagonal dominance => PSD
    return top


def exp_decr_toep(rng, n):
    """Exponentially decreasing top row (well-conditioned PSD)."""
    return np.exp(-np.arange(n) * rng.uniform(0.1, 1.0))


def poor_cond_toep(rng, n):
    """Poorly conditioned PSD Toeplitz: RBF kernel on a fine grid."""
    dists = np.arange(n) * (4.0 / n)
    return np.exp(-0.5 * dists**2)


def rand_pd(rng, n):
    """Random symmetric positive definite matrix."""
    a = rng.standard_normal((n, n))
    return a @ a.T + n * np.eye(n)


def bttb_dense_oracle(top, sizes):
    """Dense BTTB reconstruction by explicit nested Toeplitz replication —
    an independent oracle (no FFT)."""
    sizes = tuple(int(s) for s in sizes)
    top = np.asarray(top, dtype=float).reshape(sizes)
    if len(sizes) == 1:
        return la.toeplitz(top)
    # Block-Toeplitz over the leading axis of recursively built blocks.
    blocks = [bttb_dense_oracle(top[i].ravel(), sizes[1:]) for i in
              range(sizes[0])]
    m = blocks[0].shape[0]
    k = sizes[0]
    out = np.zeros((k * m, k * m))
    for i in range(k):
        for j in range(k):
            out[i * m:(i + 1) * m, j * m:(j + 1) * m] = blocks[abs(i - j)]
    return out
