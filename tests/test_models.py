"""Model-level equivalence tests (strategy parity: reference
ExactAnalogue harness, runlmc/models/test_interpolated_llgp.py:21-345):
InterpolatedLLGP vs the dense-exact oracle on matched data/parameters."""

import numpy as np
import pytest

from runlmc_tpu import (
    RBF,
    AdaDelta,
    ExactLMC,
    InterpolatedLLGP,
    LMCKernelSpec,
    Matern32,
)


def _sincos_data(rng, n=40):
    """The example.ipynb-style sin/cos two-output dataset."""
    X0 = np.sort(rng.uniform(0, 2 * np.pi, n))
    X1 = np.sort(rng.uniform(0, 2 * np.pi, int(n * 0.8)))
    Y0 = np.sin(X0) + rng.standard_normal(n) * 0.05
    Y1 = np.cos(X1) + rng.standard_normal(len(X1)) * 0.05
    return [X0, X1], [Y0, Y1]


def _spec():
    return LMCKernelSpec.create(
        D=2,
        lmc_kernels=[RBF(name="r0"), Matern32(name="m0")],
        lmc_ranks=[1, 1],
    )


def _pair(rng, prediction="on-the-fly", m=64, **kw):
    Xs, Ys = _sincos_data(rng)
    lmc = InterpolatedLLGP(
        Xs, Ys, functional_kernel=_spec(), m=[m], prediction=prediction,
        seed=7, **kw,
    )
    exact = ExactLMC(Xs, Ys, functional_kernel=_spec(), seed=7)
    return lmc, exact, Xs, Ys


def test_log_likelihood_close_to_exact(rng):
    lmc, exact, *_ = _pair(rng)
    # identical initial params by construction
    np.testing.assert_allclose(lmc.param_array, exact.param_array)
    ll_approx = lmc.log_likelihood()
    ll_exact = exact.log_likelihood()
    # logdet is exact in both; quadratic differs by SKI approximation
    assert abs(ll_approx - ll_exact) / abs(ll_exact) < 1e-2


def test_normal_quadratic_vs_dense(rng):
    lmc, exact, *_ = _pair(rng)
    quad = lmc.normal_quadratic()
    ll, _ = lmc.exact_log_likelihood_and_grad()
    # reconstruct quadratic from exact LL and exact logdet
    n = sum(len(y) for y in lmc.Ys)
    quad_exact = -2 * ll - lmc.log_det_K() - n * np.log(2 * np.pi)
    assert abs(quad - quad_exact) / abs(quad_exact) < 5e-2


@pytest.mark.parametrize("prediction", ["exact", "on-the-fly", "precompute"])
def test_prediction_close_to_closed_form(rng, prediction):
    lmc, exact, Xs, Ys = _pair(rng, prediction=prediction, m=128)
    test_Xs = [np.linspace(0.5, 5.5, 25), np.linspace(0.5, 5.5, 25)]
    mu_a, var_a = lmc.predict(test_Xs)
    mu_e, var_e = exact.predict(test_Xs)
    for d in range(2):
        np.testing.assert_allclose(mu_a[d], mu_e[d], atol=5e-2)
        np.testing.assert_allclose(var_a[d], var_e[d], atol=5e-2)


def test_predict_quantiles(rng):
    lmc, _, Xs, Ys = _pair(rng)
    test_Xs = [np.linspace(1, 5, 10), np.linspace(1, 5, 10)]
    qs = lmc.predict_quantiles(test_Xs, quantiles=(2.5, 50, 97.5))
    mu, _ = lmc.predict(test_Xs)
    for d in range(2):
        assert qs[d].shape == (10, 3)
        # median == mean for a Gaussian
        np.testing.assert_allclose(qs[d][:, 1], mu[d], atol=1e-8)
        assert np.all(qs[d][:, 0] < qs[d][:, 2])


def test_fit_improves_log_likelihood(rng):
    """Optimization increases LL after a few AdaDelta iterations
    (parity: _check_fit, test_interpolated_llgp.py:248-255)."""
    lmc, _, _, _ = _pair(rng)
    ll_before = lmc.log_likelihood()
    lmc.optimize(optimizer=AdaDelta(max_it=5))
    ll_after = lmc.log_likelihood()
    assert ll_after > ll_before, (ll_before, ll_after)


def test_optimization_stopping_rule():
    """The rolling-max/permitted-drops stop rule terminates early on
    decaying gradients (parity: optimization.py:59-83)."""
    calls = []

    def fake_grad(x):
        # gradient norm decays below 0.1 * rolling max after 10 steps
        g = np.ones_like(x) * (10.0 if len(calls) < 10 else 0.5)
        calls.append(1)
        return g

    opt = AdaDelta(max_it=1000, permitted_drops=5, min_grad_ratio=0.1)
    _, info = opt.minimize(np.zeros(3), fake_grad)
    assert info["n_iter"] == 15  # 10 big steps + 5 permitted drops


def test_metrics_recording(rng):
    lmc, _, _, _ = _pair(rng, metrics=True)
    lmc.optimize(optimizer=AdaDelta(max_it=3, permitted_drops=10**9))
    m = lmc.metrics
    assert len(m.iterations) == 3
    assert len(m.grad_error) == 3
    assert len(m.log_likely) == 3
    assert all(e < 1.0 for e in m.grad_error)  # grads roughly right


def test_exact_lmc_fit(rng):
    _, exact, Xs, Ys = _pair(rng)
    ll0 = exact.log_likelihood()
    exact.optimize(max_iters=20)
    assert exact.log_likelihood() > ll0


def test_missing_output_prediction(rng):
    """Empty prediction inputs for some outputs (weather-style)."""
    lmc, _, _, _ = _pair(rng)
    mu, var = lmc.predict([np.zeros(0), np.linspace(1, 2, 5)])
    assert len(mu[0]) == 0 and len(mu[1]) == 5
    assert len(var[0]) == 0


def test_prior_changes_gradient(rng):
    from runlmc_tpu.priors import Gamma

    lmc, _, _, _ = _pair(rng)
    g0 = lmc.stochastic_grad()
    lmc.set_prior(("noise",), Gamma(2.0, 10.0))
    g1 = lmc.stochastic_grad()
    assert not np.allclose(g0, g1)


def test_validation_errors(rng):
    Xs, Ys = _sincos_data(rng)
    with pytest.raises(ValueError):
        InterpolatedLLGP(Xs, Ys)  # no kernel
    with pytest.raises(ValueError):
        InterpolatedLLGP(
            Xs, Ys, functional_kernel=_spec(), prediction="bogus"
        )
    with pytest.raises(ValueError):
        InterpolatedLLGP(Xs, Ys[:1], functional_kernel=_spec())
    with pytest.raises(ValueError):
        InterpolatedLLGP(
            [Xs[0]], [np.ones_like(Ys[0])], functional_kernel=_spec()
        )  # zero variance output


def test_split_kernel_model(rng):
    """Two active-dim groups end-to-end (parity: the reference's
    test_interpolated_llgp split-kernel cases)."""
    n = 30
    Xs = [rng.uniform(0, 1, (n, 2)) for _ in range(2)]
    Ys = [
        np.sin(3 * X[:, 0]) + np.cos(2 * X[:, 1])
        + rng.standard_normal(n) * 0.1
        for X in Xs
    ]
    spec = LMCKernelSpec.create(
        D=2,
        lmc_kernels=[
            RBF(name="k0", active_dims=(0,)),
            RBF(name="k1", active_dims=(1,)),
        ],
        lmc_ranks=[1, 1],
    )
    lmc = InterpolatedLLGP(
        Xs, Ys, functional_kernel=spec, m=[16, 16], seed=2
    )
    exact = ExactLMC(Xs, Ys, functional_kernel=spec, seed=2)
    ll_a, ll_e = lmc.log_likelihood(), exact.log_likelihood()
    assert abs(ll_a - ll_e) / abs(ll_e) < 5e-2
    # precompute must refuse split kernels
    lmc2 = InterpolatedLLGP(
        Xs, Ys, functional_kernel=spec, m=[16, 16], seed=2,
        prediction="precompute",
    )
    with pytest.raises(ValueError):
        lmc2.predict([X[:5] for X in Xs])


def test_validation_split_contiguous_blocks(rng):
    """The 'auto' guard's holdout is CONTIGUOUS blocks (two per
    output, ~6%) — the structure that exposes gap-extrapolation
    overconfidence (interleaved holdout measures calibrated on the
    weather pathology: LOO z^2 0.94 on a fit with held-out NLPD 10+)."""
    from runlmc_tpu import InterpolatedLLGP, LMCKernelSpec, RBF

    Xs = [np.sort(rng.uniform(0, 1, 200)), np.sort(rng.uniform(0, 1, 150))]
    Ys = [np.sin(7 * x) for x in Xs]
    spec = LMCKernelSpec.create(D=2, lmc_kernels=[RBF()], lmc_ranks=[1])
    m = InterpolatedLLGP(Xs, Ys, functional_kernel=spec, m=[32], seed=0)
    Xs_tr, Ys_tr, Xs_va, Ys_va = m._validation_split()
    for X, Xtr, Xva, Yva in zip(Xs, Xs_tr, Xs_va, Ys_va):
        n = len(X)
        assert len(Xtr) + len(Xva) == n
        assert 0.03 <= len(Xva) / n <= 0.10
        assert len(Yva) == len(Xva)
        # The held-out INDEX set must form exactly two maximal
        # contiguous runs (the structure that exposes
        # gap-extrapolation overconfidence). X is sorted and has
        # unique values here, so positions of held-out rows in the
        # original series identify the runs; an interleaved holdout
        # would produce ~len(Xva) runs and must fail this.
        held = np.flatnonzero(np.isin(X.ravel(), Xva.ravel()))
        assert len(held) == len(Xva)
        n_runs = int(np.sum(np.diff(held) > 1)) + 1
        assert n_runs == 2, (n_runs, held)


def test_auto_objective_guard_demotes_on_breach(rng, monkeypatch, caplog):
    """When the held-out-block validation breaches, objective='auto'
    demotes exact -> stochastic BEFORE the main training (round-3
    verdict item 3; the measured weather case: exact validates at
    z^2 ~ 1e5 and 14%+ zero variances, stochastic reproduces the
    reference's published quality)."""
    import logging

    from runlmc_tpu import AdaDelta, InterpolatedLLGP, LMCKernelSpec, RBF

    Xs = [np.sort(rng.uniform(0, 1, 150)), np.sort(rng.uniform(0, 1, 120))]
    Ys = [np.sin(7 * x) + 0.1 * rng.standard_normal(len(x)) for x in Xs]
    spec = LMCKernelSpec.create(D=2, lmc_kernels=[RBF()], lmc_ranks=[1])
    m = InterpolatedLLGP(
        Xs, Ys, functional_kernel=spec, m=[32], seed=0, objective="auto"
    )
    assert m.objective == "exact" and m._auto_exact_guard
    monkeypatch.setattr(
        type(m), "_validate_exact_objective",
        lambda self, opt: (1e4, 0.5),
    )
    with caplog.at_level(logging.WARNING):
        info = m.optimize(optimizer=AdaDelta(max_it=5))
    assert m.objective == "stochastic"
    assert info["n_iter"] >= 5
    assert any("fails the held-out-block" in r.message for r in caplog.records)


def test_auto_objective_guard_keeps_healthy_exact(rng):
    """A healthy exact fit passes the validation guard and keeps the
    exact objective."""
    from runlmc_tpu import AdaDelta, InterpolatedLLGP, LMCKernelSpec, RBF

    Xs = [np.sort(rng.uniform(0, 1, 200)), np.sort(rng.uniform(0, 1, 160))]
    Ys = [np.sin(5 * x) + 0.1 * rng.standard_normal(len(x)) for x in Xs]
    spec = LMCKernelSpec.create(D=2, lmc_kernels=[RBF()], lmc_ranks=[1])
    m = InterpolatedLLGP(
        Xs, Ys, functional_kernel=spec, m=[48], seed=0, objective="auto"
    )
    assert m.objective == "exact"
    m.optimize(optimizer=AdaDelta(max_it=15))
    assert m.objective == "exact", "healthy fit should not demote"


def test_loo_zsq_statistic(rng):
    """loo_zsq ~ 1 on a calibrated fit and explodes when noise is
    forced tiny (in-sample overconfidence observability API)."""
    import jax.numpy as jnp

    from runlmc_tpu import AdaDelta, InterpolatedLLGP, LMCKernelSpec, RBF
    from runlmc_tpu.params import POSITIVE

    Xs = [np.sort(rng.uniform(0, 1, 120)), np.sort(rng.uniform(0, 1, 100))]
    Ys = [np.sin(7 * x) + 0.1 * rng.standard_normal(len(x)) for x in Xs]
    spec = LMCKernelSpec.create(D=2, lmc_kernels=[RBF()], lmc_ranks=[1])
    m = InterpolatedLLGP(
        Xs, Ys, functional_kernel=spec, m=[48], seed=1, objective="exact"
    )
    m.optimize(optimizer=AdaDelta(max_it=30))
    assert m.loo_zsq() < 5.0
    p = dict(m.params)
    p["noise"] = jnp.asarray(POSITIVE.inverse(1e-6 * np.ones(2)), m.dtype)
    m.set_params(p)
    assert m.loo_zsq() > 100.0
