"""Tests for the dense grid mode and the Woodbury direct factorization
(runlmc_tpu/lmc/grid.py 'dense' mode, runlmc_tpu/lmc/woodbury.py),
against dense oracles — mirroring the reference's MatrixTestBase
dense-oracle pattern (runlmc/linalg/test_matrix_base.py:6-47)."""

import jax.numpy as jnp
import numpy as np
import pytest

from runlmc_tpu import InterpolatedLLGP, LMCKernelSpec, Matern32, RBF
from runlmc_tpu.lmc.grid import build_kski, make_grids
from runlmc_tpu.lmc.woodbury import build_woodbury


def _spec(D=3):
    return LMCKernelSpec.create(
        D=D,
        lmc_kernels=[RBF(name="a"), Matern32(name="b")],
        lmc_ranks=[2, 1],
    )


@pytest.mark.parametrize("P,m", [(1, [13]), (2, [5, 7])])
def test_dense_mode_matches_fft(rng, P, m):
    Xs = [rng.uniform(0, 1, (20, P)) for _ in range(3)]
    spec = _spec().with_input_dim(P)
    params = spec.init_raw_params(seed=1)
    gf, _ = make_grids(spec, Xs, m=m, mode="fft")
    gd, _ = make_grids(spec, Xs, m=m, mode="dense")
    Kf = build_kski(spec, params, tuple(gf), (20, 20, 20))
    Kd = build_kski(spec, params, tuple(gd), (20, 20, 20))
    v = rng.standard_normal((4, 60))
    np.testing.assert_allclose(
        np.asarray(Kf.matvec(jnp.asarray(v))),
        np.asarray(Kd.matvec(jnp.asarray(v))),
        atol=1e-10,
    )


def test_auto_mode_small_grid_is_dense(rng):
    Xs = [rng.uniform(0, 1, (10, 1)) for _ in range(3)]
    spec = _spec().with_input_dim(1)
    gd, _ = make_grids(spec, Xs, m=[8], mode="auto")
    assert gd[0].plan.mode == "dense"


def test_woodbury_solve_and_logdet_vs_dense_oracle(rng):
    Xs = [np.sort(rng.uniform(0, 1, (40, 1)), axis=0) for _ in range(3)]
    spec = _spec().with_input_dim(1)
    params = spec.init_raw_params(seed=2)
    gd, _ = make_grids(spec, Xs, m=[15], mode="dense")
    K = build_kski(spec, params, tuple(gd), (40, 40, 40))
    wb = build_woodbury(K.groups, K.noise_n)
    Kdense = np.asarray(K.as_dense())

    b = rng.standard_normal((5, 120))
    x = np.asarray(wb.solve(jnp.asarray(b)))
    np.testing.assert_allclose(
        x, np.linalg.solve(Kdense, b.T).T, atol=1e-9
    )
    _, ld = np.linalg.slogdet(Kdense)
    assert abs(wb.logdet - ld) < 1e-8
    # matvec round trip
    np.testing.assert_allclose(
        np.asarray(wb.matvec(jnp.asarray(b))), b @ Kdense, atol=1e-9
    )


def test_woodbury_truncates_rank(rng):
    # a long-lengthscale RBF grid kernel is numerically low-rank
    Xs = [np.sort(rng.uniform(0, 1, (30, 1)), axis=0) for _ in range(2)]
    spec = LMCKernelSpec.create(
        D=2, lmc_kernels=[RBF(name="a")], lmc_ranks=[1]
    ).with_input_dim(1)
    params = spec.init_raw_params(seed=0)
    params["kernels"]["q0"]["inv_lengthscale"] = np.asarray(-3.0)  # raw
    gd, _ = make_grids(spec, Xs, m=[40], mode="dense")
    K = build_kski(spec, params, tuple(gd), (30, 30))
    wb = build_woodbury(K.groups, K.noise_n)
    assert wb.k < gd[0].interp.ncols  # truncated below D*m
    b = rng.standard_normal(60)
    x = np.asarray(wb.solve(jnp.asarray(b)))
    np.testing.assert_allclose(
        x, np.linalg.solve(np.asarray(K.as_dense()), b), atol=1e-8
    )


@pytest.mark.parametrize("prediction", ["on-the-fly", "precompute"])
def test_model_dense_predictions_match_fft_krylov(rng, prediction):
    Xs = [np.sort(rng.uniform(0, 1, (50, 1)), axis=0) for _ in range(2)]
    Ys = [np.sin(6 * X[:, 0]) + 0.1 * rng.standard_normal(50) for X in Xs]
    Xt = [np.linspace(0.1, 0.9, 11)[:, None]] * 2

    def build(mode):
        return InterpolatedLLGP(
            Xs, Ys,
            functional_kernel=LMCKernelSpec.create(
                D=2, lmc_kernels=[RBF(name="k")], lmc_ranks=[1]
            ),
            m=[20], seed=0, grid_mode=mode, prediction=prediction,
            tolerance=1e-8,
        )

    m_d, v_d = build("dense").predict(Xt)
    m_f, v_f = build("fft").predict(Xt)
    for a, b, va, vb in zip(m_d, m_f, v_d, v_f):
        np.testing.assert_allclose(a, b, atol=1e-5)
        np.testing.assert_allclose(va, vb, atol=1e-5)


def test_ski_log_likelihood_close_to_hybrid(rng):
    Xs = [np.sort(rng.uniform(0, 1, (45, 1)), axis=0) for _ in range(2)]
    Ys = [np.sin(5 * X[:, 0]) + 0.1 * rng.standard_normal(45) for X in Xs]
    lmc = InterpolatedLLGP(
        Xs, Ys,
        functional_kernel=LMCKernelSpec.create(
            D=2, lmc_kernels=[RBF(name="k")], lmc_ranks=[1]
        ),
        m=[40], seed=0, grid_mode="dense",
    )
    # with a fine grid, SKI logdet ~= exact dense logdet
    assert abs(lmc.ski_log_likelihood() - lmc.log_likelihood()) < 1.0
