"""FFT BTTB engine vs dense oracles (strategy parity: reference
runlmc/linalg/test_bttb.py explicit 1-D/2-D/3-D block reconstructions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from runlmc_tpu.ops import bttb
from tests.utils import (
    bttb_dense_oracle,
    dense_toeplitz,
    exp_decr_toep,
    poor_cond_toep,
    random_toep,
)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 13])
def test_toeplitz_matvec_matches_dense(rng, n):
    for gen in (random_toep, exp_decr_toep, poor_cond_toep):
        top = gen(rng, n)
        dense = dense_toeplitz(top)
        v = rng.standard_normal(n)
        got = bttb.bttb_matvec_from_top(jnp.asarray(top), jnp.asarray(v), (n,))
        np.testing.assert_allclose(got, dense @ v, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize(
    "sizes", [(3,), (2, 3), (3, 2), (4, 4), (2, 3, 4), (3, 1), (1, 3)]
)
def test_bttb_matvec_matches_oracle(rng, sizes):
    m = int(np.prod(sizes))
    top = rng.standard_normal(m)
    dense = bttb_dense_oracle(top, sizes)
    v = rng.standard_normal(m)
    got = bttb.bttb_matvec_from_top(jnp.asarray(top), jnp.asarray(v), sizes)
    np.testing.assert_allclose(got, dense @ v, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("sizes", [(5,), (3, 4)])
def test_bttb_dense_matches_oracle(rng, sizes):
    m = int(np.prod(sizes))
    top = rng.standard_normal(m)
    np.testing.assert_allclose(
        bttb.bttb_dense(jnp.asarray(top), sizes),
        bttb_dense_oracle(top, sizes),
        rtol=1e-9,
        atol=1e-9,
    )


def test_batched_matvec_broadcasts(rng):
    sizes = (3, 4)
    m = 12
    tops = rng.standard_normal((5, m))  # Q=5 stacked operators
    vs = rng.standard_normal((7, 1, m))  # B=7 stacked vectors
    sym = bttb.bttb_fft(jnp.asarray(tops), sizes)  # (5, ...)
    got = bttb.bttb_matvec(sym, jnp.asarray(vs), sizes)  # (7, 5, m)
    assert got.shape == (7, 5, m)
    for b in range(7):
        for q in range(5):
            dense = bttb_dense_oracle(tops[q], sizes)
            np.testing.assert_allclose(
                got[b, q], dense @ vs[b, 0], rtol=1e-9, atol=1e-9
            )


def test_symbol_fft_shape():
    sizes = (3, 5)
    ext = bttb.extension_sizes(sizes)
    assert ext == (8, 16)
    top = jnp.arange(15.0)
    sym = bttb.bttb_fft(top, sizes)
    assert sym.shape == (8, 9)


def test_toeplitz_eig_bound(rng):
    n = 11
    top = random_toep(rng, n)
    bound = bttb.toeplitz_eig_upper_bound(top)
    eigs = np.linalg.eigvalsh(dense_toeplitz(top))
    assert eigs.max() <= bound + 1e-9


def test_bttb_eig_bound(rng):
    sizes = (3, 4)
    top = rng.standard_normal(12)
    bound = bttb.bttb_eig_upper_bound(top, sizes)
    eigs = np.linalg.eigvalsh(bttb_dense_oracle(top, sizes))
    assert eigs.max() <= bound + 1e-9


@pytest.mark.parametrize("sizes", [(7,), (3, 5), (2, 3, 4)])
def test_tiled_kuu_matvec_matches_dense(rng, sizes):
    """bttb_tiled_kuu_matvec computes the exact sum_q B_q (x) T_q
    matvec from first rows (the f64-capable large-grid fine operator;
    parity target: reference runlmc/linalg/bttb.py:144-148 runs ANY m
    via its CPU f64 FFT)."""
    import jax

    m = int(np.prod(sizes))
    Q, D = 3, 4
    tops = rng.standard_normal((Q, m))
    B = rng.standard_normal((Q, D, D))
    B = (B + B.transpose(0, 2, 1)) / 2
    x = rng.standard_normal((2, D, m))  # batched operand
    K = np.zeros((D * m, D * m))
    for q in range(Q):
        K += np.kron(B[q], bttb_dense_oracle(tops[q], sizes))
    want = (x.reshape(2, D * m) @ K.T).reshape(2, D, m)
    for tile in (1, 4, m):  # exercise partial tiles and edge padding
        got = np.asarray(
            bttb.bttb_tiled_kuu_matvec(
                jnp.asarray(tops), jnp.asarray(B), jnp.asarray(x), sizes,
                tile=tile,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_tiled_kuu_matvec_gradients(rng):
    """The tiled path is differentiable w.r.t. tops and B with the same
    gradients as the dense index-map materialization (the training
    surrogate differentiates through it in 'tiled' grid mode)."""
    import jax

    sizes = (6,)
    m, Q, D = 6, 2, 3
    tops = jnp.asarray(rng.standard_normal((Q, m)))
    B = jnp.asarray(rng.standard_normal((Q, D, D)))
    x = jnp.asarray(rng.standard_normal((D, m)))

    def f_tiled(t, b):
        out = bttb.bttb_tiled_kuu_matvec(t, b, x, sizes, tile=4)
        return jnp.sum(jnp.sin(out))

    def f_dense(t, b):
        idx = jnp.asarray(bttb.bttb_index_map(sizes))
        K = jnp.einsum("qde,qij->diej", b, t[:, idx]).reshape(D * m, D * m)
        return jnp.sum(jnp.sin((K @ x.reshape(-1)).reshape(D, m)))

    g1 = jax.grad(f_tiled, argnums=(0, 1))(tops, B)
    g2 = jax.grad(f_dense, argnums=(0, 1))(tops, B)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-9
        )
