"""Independent cross-validation oracle.

The reference validates against GPy, a separate library
(runlmc/models/test_gpy_lmc.py:14-50). GPy is not in this environment,
so this module IS the independent implementation: a from-scratch,
pure-numpy LMC Gaussian process written directly from the math —
kernels, coregionalization, marginal likelihood, conditional
prediction, z-score normalization — sharing NO code with runlmc_tpu's
kernel_spec / likelihood modules. A bug in the shared spec/likelihood
code cannot pass both this oracle and the models.

Model under validation:
    K((x,a),(x',b)) = sum_q B_q[a,b] k_q(|x - x'|) + delta_ab
                      delta_xx' eps_a,
    B_q = A_q^T A_q + diag(kappa_q),
    log p(y) = -1/2 (y^T K^-1 y + log|K| + n log 2pi),
    posterior mean  = K_*X K^-1 y,
    posterior var   = diag(K_**) - diag(K_*X K^-1 K_X*).
Raw-parameter constraint: positive values are softplus(raw).
"""

import numpy as np
import pytest

from runlmc_tpu import (
    RBF,
    ExactLMC,
    InterpolatedLLGP,
    LMCKernelSpec,
    Matern32,
    StdPeriodic,
)

# ------------------------- the independent oracle -------------------------


def _softplus(x):
    x = np.asarray(x, dtype=float)
    return np.logaddexp(0.0, x)


def _k_rbf(r, gamma):
    return np.exp(-0.5 * gamma * r * r)


def _k_matern32(r, gamma):
    s = np.sqrt(3.0) * gamma * r
    return (1.0 + s) * np.exp(-s)


def _k_stdperiodic(r, gamma, period):
    s = np.sin(np.pi * r / period)
    return np.exp(-0.5 * gamma * s * s)


def _eval_kernel(kind, r, kp):
    if kind == "rbf":
        return _k_rbf(r, _softplus(kp["inv_lengthscale"]))
    if kind == "matern32":
        return _k_matern32(r, _softplus(kp["inv_lengthscale"]))
    if kind == "stdperiodic":
        return _k_stdperiodic(
            r, _softplus(kp["inv_lengthscale"]), _softplus(kp["period"])
        )
    raise KeyError(kind)


class NumpyLMCOracle:
    """kinds: list of ('rbf'|'matern32'|'stdperiodic', 'lmc'|'slfm'|'indep',
    indep_output_or_None). raw: the raw-parameter dict (data, not code:
    {'coreg_vecs', 'coreg_diags', 'kernels', 'noise'})."""

    def __init__(self, kinds, raw, D):
        self.kinds = kinds
        self.raw = raw
        self.D = D

    def _Bq(self, q):
        _, kclass, indep_out = self.kinds[q]
        key = "q%d" % q
        if kclass == "indep":
            B = np.zeros((self.D, self.D))
            B[indep_out, indep_out] = 1.0
            return B
        A = np.asarray(self.raw["coreg_vecs"][key], dtype=float)
        B = A.T @ A
        if kclass == "lmc":
            B = B + np.diag(_softplus(self.raw["coreg_diags"][key]))
        return B

    def _cross(self, Xa, oa, Xb, ob):
        r = np.abs(Xa[:, None] - Xb[None, :])
        K = np.zeros((len(Xa), len(Xb)))
        for q, (kname, _, _) in enumerate(self.kinds):
            kp = self.raw["kernels"].get("q%d" % q, {})
            B = self._Bq(q)
            K += B[np.ix_(oa, ob)] * _eval_kernel(kname, r, kp)
        return K

    def full_K(self, X, o):
        K = self._cross(X, o, X, o)
        return K + np.diag(_softplus(self.raw["noise"])[o])

    def log_likelihood(self, X, o, y):
        K = self.full_K(X, o)
        L = np.linalg.cholesky(K)
        a = np.linalg.solve(L, y)
        quad = a @ a
        logdet = 2.0 * np.log(np.diag(L)).sum()
        return -0.5 * (quad + logdet + len(y) * np.log(2 * np.pi))

    def predict(self, X, o, y, Xt, ot):
        K = self.full_K(X, o)
        Kxs = self._cross(Xt, ot, X, o)
        sol = np.linalg.solve(K, y)
        mean = Kxs @ sol
        prior = np.diag(self._cross(Xt, ot, Xt, ot))
        prior = prior + _softplus(self.raw["noise"])[ot]
        expl = np.einsum("ij,ji->i", Kxs, np.linalg.solve(K, Kxs.T))
        return mean, prior - expl


def _flatten(Xs, Ys):
    X = np.concatenate([np.asarray(x, dtype=float).ravel() for x in Xs])
    y = np.concatenate([np.asarray(v, dtype=float) for v in Ys])
    o = np.concatenate(
        [np.full(len(v), d, dtype=int) for d, v in enumerate(Ys)]
    )
    return X, o, y


def _zscore(Ys):
    stats = [(float(np.mean(v)), float(np.std(v))) for v in Ys]
    return [
        (np.asarray(v) - mu) / sd for v, (mu, sd) in zip(Ys, stats)
    ], stats


# ------------------------------- the tests -------------------------------


def _data(rng, D=3, n=25):
    Xs = [np.sort(rng.uniform(0, 2 * np.pi, n + 3 * d)) for d in range(D)]
    Ys = [
        np.sin(X + 0.5 * d) + 0.1 * rng.standard_normal(len(X))
        for d, X in enumerate(Xs)
    ]
    return Xs, Ys


def _mixed_spec_and_kinds(D=3):
    spec = LMCKernelSpec.create(
        D=D,
        lmc_kernels=[RBF(name="a"), StdPeriodic(name="p")],
        lmc_ranks=[2, 1],
        slfm_kernels=[Matern32(name="s")],
        indep_gp=[RBF(name="i0"), RBF(name="i1")],
        indep_gp_index=[0, 2],
    )
    kinds = [
        ("rbf", "lmc", None),
        ("stdperiodic", "lmc", None),
        ("matern32", "slfm", None),
        ("rbf", "indep", 0),
        ("rbf", "indep", 2),
    ]
    return spec, kinds


def _raw_as_numpy(model):
    import jax

    return jax.tree.map(np.asarray, model.params)


def test_exact_lmc_matches_independent_oracle(rng):
    Xs, Ys = _data(rng)
    spec, kinds = _mixed_spec_and_kinds()
    model = ExactLMC(Xs, Ys, functional_kernel=spec, normalize=False,
                     seed=4)
    # perturb params away from init so agreement isn't init-specific
    x = model.param_array
    model.param_array = x + 0.1 * rng.standard_normal(x.shape)

    oracle = NumpyLMCOracle(kinds, _raw_as_numpy(model), D=3)
    X, o, y = _flatten(Xs, Ys)
    np.testing.assert_allclose(
        model.log_likelihood(), oracle.log_likelihood(X, o, y),
        rtol=1e-9,
    )

    Xt = [np.linspace(1, 5, 7) for _ in range(3)]
    Xtf, otf, _ = _flatten(Xt, [np.zeros(7)] * 3)
    mu_o, var_o = oracle.predict(X, o, y, Xtf, otf)
    mu_m, var_m = model.predict(Xt)
    np.testing.assert_allclose(np.concatenate(mu_m), mu_o, rtol=1e-8)
    np.testing.assert_allclose(
        np.concatenate(var_m), var_o, rtol=1e-7, atol=1e-10
    )


def test_exact_lmc_normalized_predictions_match_oracle(rng):
    """Normalization round trip: model with normalize=True must equal
    the oracle fit on independently z-scored data, with the oracle's
    outputs un-normalized by hand."""
    Xs, Ys = _data(rng)
    spec, kinds = _mixed_spec_and_kinds()
    model = ExactLMC(Xs, Ys, functional_kernel=spec, normalize=True,
                     seed=4)

    Ys_n, stats = _zscore(Ys)
    oracle = NumpyLMCOracle(kinds, _raw_as_numpy(model), D=3)
    X, o, y = _flatten(Xs, Ys_n)
    Xt = [np.linspace(1, 5, 7) for _ in range(3)]
    Xtf, otf, _ = _flatten(Xt, [np.zeros(7)] * 3)
    mu_o, var_o = oracle.predict(X, o, y, Xtf, otf)
    mu_o = np.concatenate([
        mu_o[7 * d : 7 * (d + 1)] * sd + mu
        for d, (mu, sd) in enumerate(stats)
    ])
    var_o = np.concatenate([
        var_o[7 * d : 7 * (d + 1)] * sd**2
        for d, (_, sd) in enumerate(stats)
    ])
    mu_m, var_m = model.predict(Xt)
    np.testing.assert_allclose(np.concatenate(mu_m), mu_o, rtol=1e-8)
    np.testing.assert_allclose(
        np.concatenate(var_m), var_o, rtol=1e-7, atol=1e-10
    )


def test_interpolated_llgp_matches_independent_oracle(rng):
    """The SKI model agrees with the independent oracle to SKI
    approximation accuracy on a fine grid."""
    Xs, Ys = _data(rng)
    spec, kinds = _mixed_spec_and_kinds()
    model = InterpolatedLLGP(
        Xs, Ys, functional_kernel=spec, normalize=False, m=[160],
        seed=4, tolerance=1e-10,
    )
    oracle = NumpyLMCOracle(kinds, _raw_as_numpy(model), D=3)
    X, o, y = _flatten(Xs, Ys)
    ll_o = oracle.log_likelihood(X, o, y)
    assert abs(model.log_likelihood() - ll_o) / abs(ll_o) < 1e-2

    Xt = [np.linspace(1, 5, 7) for _ in range(3)]
    Xtf, otf, _ = _flatten(Xt, [np.zeros(7)] * 3)
    mu_o, var_o = oracle.predict(X, o, y, Xtf, otf)
    mu_m, var_m = model.predict(Xt)
    np.testing.assert_allclose(
        np.concatenate(mu_m), mu_o, atol=2e-2
    )
    np.testing.assert_allclose(
        np.concatenate(var_m), var_o, atol=2e-2
    )
