"""Dense-oracle tests for the operator algebra (strategy parity:
reference runlmc/linalg/test_matrix_base.py `MatrixTestBase` — every
operator's matvec/matmat is checked against its own densification)."""

import jax.numpy as jnp
import numpy as np
import pytest

from runlmc_tpu.ops import operators as ops
from tests.utils import bttb_dense_oracle, rand_pd, random_toep


def check_operator(op, dense, rng, rtol=1e-8, atol=1e-8):
    n = dense.shape[1]
    v = rng.standard_normal(n)
    np.testing.assert_allclose(op.matvec(jnp.asarray(v)), dense @ v,
                               rtol=rtol, atol=atol)
    # batched matvec
    V = rng.standard_normal((3, n))
    np.testing.assert_allclose(op.matvec(jnp.asarray(V)), V @ dense.T,
                               rtol=rtol, atol=atol)
    # matmat
    M = rng.standard_normal((n, 2))
    np.testing.assert_allclose(op.matmat(jnp.asarray(M)), dense @ M,
                               rtol=rtol, atol=atol)
    # densification round-trip
    np.testing.assert_allclose(op.as_dense(), dense, rtol=rtol, atol=atol)


def test_dense(rng):
    a = rng.standard_normal((4, 6))
    check_operator(ops.Dense(jnp.asarray(a)), a, rng)


def test_identity(rng):
    check_operator(ops.Identity(5), np.eye(5), rng)


def test_diag(rng):
    d = rng.standard_normal(6)
    check_operator(ops.Diag(jnp.asarray(d)), np.diag(d), rng)


def test_toeplitz(rng):
    top = random_toep(rng, 7)
    check_operator(ops.Toeplitz(top), bttb_dense_oracle(top, (7,)), rng)


def test_bttb(rng):
    top = rng.standard_normal(12)
    check_operator(
        ops.BTTB.build(top, (3, 4)), bttb_dense_oracle(top, (3, 4)), rng
    )


def test_kronecker(rng):
    a = rand_pd(rng, 3)
    top = random_toep(rng, 4)
    op = ops.Kronecker(ops.Dense(jnp.asarray(a)), ops.Toeplitz(top))
    dense = np.kron(a, bttb_dense_oracle(top, (4,)))
    check_operator(op, dense, rng)


def test_kronecker_nested(rng):
    a = rng.standard_normal((2, 2))
    b = rng.standard_normal((3, 3))
    c = rng.standard_normal((2, 2))
    op = ops.Kronecker(
        ops.Dense(jnp.asarray(a)),
        ops.Kronecker(ops.Dense(jnp.asarray(b)), ops.Dense(jnp.asarray(c))),
    )
    check_operator(op, np.kron(a, np.kron(b, c)), rng)


def test_block_diag(rng):
    a = rng.standard_normal((2, 3))
    b = rng.standard_normal((4, 4))
    import scipy.linalg as la

    op = ops.BlockDiag([ops.Dense(jnp.asarray(a)), ops.Dense(jnp.asarray(b))])
    check_operator(op, la.block_diag(a, b), rng)


def test_symm_square_block(rng):
    d, m = 3, 4
    tops = [[None] * d for _ in range(d)]
    dense = np.zeros((d * m, d * m))
    blocks = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i, d):
            top = random_toep(rng, m)
            blocks[i][j] = blocks[j][i] = ops.Toeplitz(top)
            block_dense = bttb_dense_oracle(top, (m,))
            dense[i * m:(i + 1) * m, j * m:(j + 1) * m] = block_dense
            dense[j * m:(j + 1) * m, i * m:(i + 1) * m] = block_dense
    check_operator(ops.SymmSquareBlock(blocks), dense, rng)


def test_sum(rng):
    a = rand_pd(rng, 5)
    d = rng.standard_normal(5)
    op = ops.Sum([ops.Dense(jnp.asarray(a)), ops.Diag(jnp.asarray(d))])
    check_operator(op, a + np.diag(d), rng)


def test_composition(rng):
    a = rng.standard_normal((3, 4))
    b = rng.standard_normal((4, 5))
    op = ops.Composition([ops.Dense(jnp.asarray(a)), ops.Dense(jnp.asarray(b))])
    check_operator(op, a @ b, rng)


def test_wrap(rng):
    a = rng.standard_normal((4, 4))
    op = ops.LinearOperator.wrap(
        (4, 4), lambda v: jnp.einsum("ij,...j->...i", jnp.asarray(a), v)
    )
    v = rng.standard_normal(4)
    np.testing.assert_allclose(op.matvec(jnp.asarray(v)), a @ v, rtol=1e-9)


def test_eig_bounds(rng):
    top = random_toep(rng, 6)
    dense = bttb_dense_oracle(top, (6,))
    for op, d in [
        (ops.Toeplitz(top), dense),
        (ops.Diag(jnp.asarray(np.abs(rng.standard_normal(6)))), None),
        (ops.Sum([ops.Toeplitz(top), ops.Identity(6)]), dense + np.eye(6)),
    ]:
        if d is None:
            d = np.asarray(op.as_dense())
        assert np.linalg.eigvalsh(d).max() <= float(op.upper_eig_bound()) + 1e-9


def test_operators_are_jittable(rng):
    import jax

    top = random_toep(rng, 6)
    op = ops.Sum([ops.Toeplitz(top), ops.Identity(6)])

    @jax.jit
    def f(op, v):
        return op.matvec(v)

    v = jnp.asarray(rng.standard_normal(6))
    np.testing.assert_allclose(f(op, v), op.matvec(v), rtol=1e-12)


