"""Tests for the dense grid mode and the on-device direct Woodbury
factorization (runlmc_tpu/lmc/grid.py 'dense' mode,
runlmc_tpu/lmc/woodbury.py), against dense oracles — mirroring the
reference's MatrixTestBase dense-oracle pattern
(runlmc/linalg/test_matrix_base.py:6-47)."""

import jax.numpy as jnp
import numpy as np
import pytest

from runlmc_tpu import InterpolatedLLGP, LMCKernelSpec, Matern32, RBF
from runlmc_tpu.lmc.grid import build_kski, make_grids, to_dense_f32
from runlmc_tpu.lmc.woodbury import (
    build_device_woodbury,
    chol_jittered,
    woodbury_pcg,
)

F64_JITTER = dict(jitter=(1e-12, 1e-9, 1e-6), c_jitter=(0.0, 1e-12, 1e-9))


def _spec(D=3):
    return LMCKernelSpec.create(
        D=D,
        lmc_kernels=[RBF(name="a"), Matern32(name="b")],
        lmc_ranks=[2, 1],
    )


def _wb(spec, params, grids, lens, **kw):
    K = build_kski(spec, params, tuple(grids), lens)
    kwargs = dict(F64_JITTER)
    kwargs.update(kw)
    return K, build_device_woodbury(
        K.groups,
        spec.noise(params),
        K.noise_n,
        tuple(gd.WtW for gd in grids),
        **kwargs,
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


def test_chol_jittered_escalates(rng):
    # an indefinite matrix: the first scale fails, escalation recovers
    A = jnp.asarray(rng.standard_normal((6, 6)))
    A = (A + A.T) / 2  # symmetric but NOT PSD
    A = A - 10.0 * jnp.eye(6)  # strongly negative: even 1e-2 fails
    L = chol_jittered(A, scales=(1e-6, 1e-4, 100.0))
    assert np.all(np.isfinite(np.asarray(L)))


def test_woodbury_solve_and_logdet_vs_dense_oracle(rng):
    Xs = [np.sort(rng.uniform(0, 1, (40, 1)), axis=0) for _ in range(3)]
    spec = _spec().with_input_dim(1)
    params = spec.init_raw_params(seed=2)
    gd, _ = make_grids(spec, Xs, m=[15], mode="dense")
    K, wb = _wb(spec, params, gd, (40, 40, 40))
    Kdense = np.asarray(K.as_dense())

    b = rng.standard_normal((5, 120))
    x = np.asarray(wb.solve(jnp.asarray(b)))
    np.testing.assert_allclose(
        x, np.linalg.solve(Kdense, b.T).T, atol=1e-7
    )
    _, ld = np.linalg.slogdet(Kdense)
    assert abs(float(wb.logdet) - ld) < 1e-6
    # matvec round trip
    np.testing.assert_allclose(
        np.asarray(wb.matvec(jnp.asarray(b))), b @ Kdense, atol=1e-8
    )


def test_woodbury_low_rank_grid_kernel(rng):
    # a long-lengthscale RBF grid kernel is numerically singular; the
    # jittered factorization must still solve the full K accurately
    Xs = [np.sort(rng.uniform(0, 1, (30, 1)), axis=0) for _ in range(2)]
    spec = LMCKernelSpec.create(
        D=2, lmc_kernels=[RBF(name="a")], lmc_ranks=[1]
    ).with_input_dim(1)
    params = spec.init_raw_params(seed=0)
    params["kernels"]["q0"]["inv_lengthscale"] = np.asarray(-3.0)  # raw
    gd, _ = make_grids(spec, Xs, m=[40], mode="dense")
    K, wb = _wb(spec, params, gd, (30, 30))
    b = rng.standard_normal(60)
    x = np.asarray(wb.solve(jnp.asarray(b)))
    np.testing.assert_allclose(
        x, np.linalg.solve(np.asarray(K.as_dense()), b), atol=1e-6
    )


def test_woodbury_multigroup_cross_blocks(rng):
    # two active-dim groups (split kernels in 2-D), both dense: the
    # capacitance assembly must include the cross-group blocks
    Xs = [rng.uniform(0, 1, (25, 2)) for _ in range(2)]
    spec = LMCKernelSpec.create(
        D=2,
        lmc_kernels=[
            RBF(name="a", active_dims=(0,)),
            Matern32(name="b", active_dims=(1,)),
        ],
        lmc_ranks=[1, 1],
    ).with_input_dim(2)
    params = spec.init_raw_params(seed=3)
    gd, _ = make_grids(spec, Xs, m=[9, 11], mode="dense")
    assert len(gd) == 2
    K, wb = _wb(spec, params, gd, (25, 25))
    Kdense = np.asarray(K.as_dense())
    b = rng.standard_normal((3, 50))
    np.testing.assert_allclose(
        np.asarray(wb.solve(jnp.asarray(b))),
        np.linalg.solve(Kdense, b.T).T,
        atol=1e-7,
    )
    _, ld = np.linalg.slogdet(Kdense)
    assert abs(float(wb.logdet) - ld) < 1e-6


def test_f32_factor_pcg_certifies_f64_tolerance(rng):
    """The training-path pattern: factor in f32, certify the residual
    with f64 PCG — a handful of iterations even at small noise."""
    Xs = [np.sort(rng.uniform(0, 1, (40, 1)), axis=0) for _ in range(3)]
    spec = _spec().with_input_dim(1)
    params = spec.init_raw_params(seed=2)
    params["noise"] = np.full(3, -6.9)  # softplus-raw -> eps ~ 1e-3
    gd, _ = make_grids(spec, Xs, m=[15], mode="dense")
    lens = (40, 40, 40)
    K64 = build_kski(spec, params, tuple(gd), lens)

    gd32 = to_dense_f32(tuple(gd))
    import jax

    params32 = jax.tree.map(
        lambda a: jnp.asarray(a, dtype=jnp.float32), params
    )
    K32 = build_kski(spec, params32, gd32, lens)
    wb32 = build_device_woodbury(
        K32.groups,
        spec.noise(params32),
        K32.noise_n,
        tuple(g.WtW for g in gd32),
    )
    assert wb32.dtype == jnp.float32

    b = jnp.asarray(rng.standard_normal((4, 120)))
    res = woodbury_pcg(K64.matvec, wb32, b, tol=1e-8)
    assert bool(res.converged.all()), np.asarray(res.error)
    assert int(res.iterations.max()) <= 25
    np.testing.assert_allclose(
        np.asarray(res.x),
        np.linalg.solve(np.asarray(K64.as_dense()), np.asarray(b).T).T,
        atol=1e-6,
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


def test_mixed_precision_pcg_certifies(rng):
    """woodbury_pcg with inner f32 cycles (inner_matvec at the factor's
    dtype) must certify the SAME true-residual tolerance as the
    all-model-dtype solve — the outer refinement guarantees accuracy,
    the inner dtype only changes per-iteration cost."""
    import jax

    spec = _spec().with_input_dim(1)
    Xs = [np.sort(rng.uniform(0, 1, (30, 1)), axis=0) for _ in range(3)]
    params = jax.tree.map(jnp.asarray, spec.init_raw_params(seed=0))
    grids, _ = make_grids(spec, Xs, m=[16], mode="dense")
    grids = tuple(grids)
    grids32 = to_dense_f32(grids)
    lens = (30, 30, 30)
    K = build_kski(spec, params, grids, lens)
    params32 = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    K32 = build_kski(spec, params32, grids32, lens)
    wb32 = build_device_woodbury(
        K32.groups, spec.noise(params32), K32.noise_n,
        tuple(g.WtW for g in grids32),
    )
    b = jnp.asarray(rng.standard_normal((4, 90)))
    assert b.dtype == jnp.float64
    tol = 1e-9
    res_plain = woodbury_pcg(K.matvec, wb32, b, tol=tol)
    res_mixed = woodbury_pcg(K.matvec, wb32, b, tol=tol,
                             inner_matvec=K32.matvec)
    assert bool(res_plain.converged.all())
    assert bool(res_mixed.converged.all())
    # true residuals, recomputed independently
    for res in (res_plain, res_mixed):
        r = np.asarray(K.matvec(res.x)) - np.asarray(b)
        assert np.linalg.norm(r, axis=-1).max() < 10 * tol


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
