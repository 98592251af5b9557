"""Interpolation tests (strategy parity: reference
runlmc/approx/test_interpolation.py — closed forms, error rates vs grid
density, bicubic = tensor product, multi_interpolant block structure)."""

import jax.numpy as jnp
import numpy as np
import pytest

from runlmc_tpu.ops import interpolation as interp
from runlmc_tpu.ops.operators import Dense


def test_cubic_kernel_closed_forms():
    # u(0)=1, u(±1)=0, u(±2)=0; interior values from Keys' formula.
    np.testing.assert_allclose(interp.cubic_kernel(np.array([0.0])), [1.0])
    np.testing.assert_allclose(
        interp.cubic_kernel(np.array([1.0, -1.0, 2.0, -2.0])), 0.0, atol=1e-12
    )
    np.testing.assert_allclose(
        interp.cubic_kernel(np.array([0.5])), [(1.5 * 0.5 - 2.5) * 0.25 + 1]
    )
    np.testing.assert_allclose(
        interp.cubic_kernel(np.array([1.5])),
        [((-0.5 * 1.5 + 2.5) * 1.5 - 4) * 1.5 + 2],
    )
    # zero outside support
    np.testing.assert_allclose(interp.cubic_kernel(np.array([2.5, 3.0])), 0.0)


def test_interp_rows_sum_to_one(rng):
    grid = np.linspace(-1, 2, 30)
    samples = rng.uniform(0, 1, 50)
    idx, w = interp.interp_cubic(grid, samples)
    assert idx.shape == (50, 4) and w.shape == (50, 4)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)


@pytest.mark.parametrize("f", [np.sin, np.exp])
def test_cubic_interp_error_decreases_with_density(rng, f):
    samples = rng.uniform(0.2, 0.8, 200)
    errs = []
    for m in [16, 32, 64]:
        grid = np.linspace(-0.2, 1.2, m)
        idx, w = interp.interp_cubic(grid, samples)
        approx = (f(grid)[idx] * w).sum(axis=1)
        errs.append(np.abs(approx - f(samples)).max())
    assert errs[1] < errs[0] and errs[2] < errs[1]
    # O(m^-3) convergence: doubling m should shrink error by ~8x; allow 4x.
    assert errs[2] < errs[0] / 16


def test_bicubic_matches_tensor_product(rng):
    gx = np.linspace(-0.5, 1.5, 12)
    gy = np.linspace(-0.6, 1.6, 14)
    samples = rng.uniform(0.1, 0.9, (20, 2))
    idx, w = interp.interp_bicubic(gx, gy, samples)
    assert idx.shape == (20, 16)

    # oracle: f(x, y) = sin(x) * cos(y) separable check via 1-D interps
    fgrid = np.outer(np.sin(gx), np.cos(gy)).ravel()
    approx = (fgrid[idx] * w).sum(axis=1)
    exact = np.sin(samples[:, 0]) * np.cos(samples[:, 1])
    np.testing.assert_allclose(approx, exact, atol=1e-3)


def test_empty_samples():
    grid = np.linspace(0, 1, 8)
    idx, w = interp.interp_cubic(grid, np.zeros(0))
    assert idx.shape == (0, 4)
    op = interp.multi_interpolant([np.zeros(0)], [grid])
    assert op.shape == (0, 8)


def test_multi_interpolant_block_structure(rng):
    grid = np.linspace(-0.5, 1.5, 10)
    Xs = [rng.uniform(0, 1, 5), rng.uniform(0, 1, 7)]
    op = interp.multi_interpolant(Xs, [grid])
    assert op.shape == (12, 20)
    dense = np.asarray(op.as_dense())
    # output-0 rows only touch the first grid copy, output-1 the second
    assert np.all(dense[:5, 10:] == 0)
    assert np.all(dense[5:, :10] == 0)

    # W matvec / W^T matvec vs dense
    v = rng.standard_normal(20)
    np.testing.assert_allclose(op.matvec(jnp.asarray(v)), dense @ v,
                               rtol=1e-9, atol=1e-9)
    x = rng.standard_normal(12)
    np.testing.assert_allclose(op.rmatvec(jnp.asarray(x)), dense.T @ x,
                               rtol=1e-9, atol=1e-9)
    # batched forms
    V = rng.standard_normal((3, 20))
    np.testing.assert_allclose(op.matvec(jnp.asarray(V)), V @ dense.T,
                               rtol=1e-9, atol=1e-9)
    X = rng.standard_normal((3, 12))
    np.testing.assert_allclose(op.rmatvec(jnp.asarray(X)), X @ dense,
                               rtol=1e-9, atol=1e-9)


def test_edge_clamping_accumulates(rng):
    # samples right at the grid edge produce clamped duplicate indices;
    # the operator must still act like the CSR sum the reference builds.
    grid = np.linspace(0.0, 1.0, 8)
    samples = np.array([0.01, 0.99])
    idx, w = interp.interp_cubic(grid, samples)
    assert idx.min() >= 0 and idx.max() <= 7
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)


def test_autogrid_defaults(rng):
    Xs = [rng.uniform(0, 1, (30, 1)), rng.uniform(0, 1, (50, 1))]
    grids = interp.autogrid(Xs)
    assert len(grids) == 1
    g = grids[0]
    assert len(g) == 44  # mean length 40 + 4 padding
    assert g[0] < min(X.min() for X in Xs)
    assert g[-1] > max(X.max() for X in Xs)


def test_autogrid_explicit():
    Xs = [np.linspace(0, 1, 10).reshape(-1, 1)]
    (g,) = interp.autogrid(Xs, lo=[-1.0], hi=[2.0], m=[20])
    assert len(g) == 24
    assert g[0] < -1 and g[-1] > 2


def test_ski_operator(rng):
    from runlmc_tpu.ops.interpolation import SKI

    grid = np.linspace(-0.5, 1.5, 9)
    Xs = [rng.uniform(0, 1, 6)]
    W = interp.multi_interpolant(Xs, [grid])
    K = Dense(jnp.asarray(rand_pd := np.eye(9) * 2.0))
    ski = SKI(grid_K=K, W=W)
    dense = np.asarray(W.as_dense()) @ rand_pd @ np.asarray(W.as_dense()).T
    v = rng.standard_normal(6)
    np.testing.assert_allclose(ski.matvec(jnp.asarray(v)), dense @ v,
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(ski.as_dense(), dense, rtol=1e-9, atol=1e-9)
