"""Kernel function + transform + prior unit tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from runlmc_tpu.kernels import RBF, IdentityKern, Matern32, Scaled, StdPeriodic
from runlmc_tpu.params import POSITIVE
from runlmc_tpu.priors import (
    Gamma,
    Gaussian,
    HalfLaplace,
    InverseGamma,
    check_domain,
)


def _eval(kern, dists):
    return np.asarray(kern.from_dist(kern.init_raw_params(), jnp.asarray(dists)))


def test_rbf_formula(rng):
    d = np.abs(rng.standard_normal(20))
    k = RBF(inv_lengthscale=2.5)
    np.testing.assert_allclose(_eval(k, d), np.exp(-0.5 * d**2 * 2.5),
                               rtol=1e-10)


def test_matern32_formula(rng):
    d = np.abs(rng.standard_normal(20))
    k = Matern32(inv_lengthscale=0.7)
    s = d * np.sqrt(3) * 0.7
    np.testing.assert_allclose(_eval(k, d), (1 + s) * np.exp(-s), rtol=1e-10)


def test_std_periodic_formula(rng):
    d = np.abs(rng.standard_normal(20))
    k = StdPeriodic(inv_lengthscale=1.3, period=0.8)
    s = np.sin(np.pi * d / 0.8)
    np.testing.assert_allclose(_eval(k, d), np.exp(-0.5 * s**2 * 1.3),
                               rtol=1e-9)


def test_identity_kernel():
    d = np.array([0.0, 0.5, 0.0, 2.0])
    np.testing.assert_allclose(_eval(IdentityKern(), d), [1, 0, 1, 0])


def test_scaled_kernel(rng):
    d = np.abs(rng.standard_normal(10))
    k = Scaled(inner=RBF(inv_lengthscale=2.0), scale=3.0)
    np.testing.assert_allclose(
        _eval(k, d), 3.0 * np.exp(-0.5 * d**2 * 2.0), rtol=1e-9
    )
    assert k.name == "scaled_rbf"


def test_transform_roundtrip(rng):
    v = np.abs(rng.standard_normal(10)) + 0.01
    raw = POSITIVE.inverse(v)
    np.testing.assert_allclose(POSITIVE.forward(jnp.asarray(raw)), v,
                               rtol=1e-9)


def test_kernel_autodiff(rng):
    import jax

    k = RBF(inv_lengthscale=1.5)
    raw = {kk: jnp.asarray(v) for kk, v in k.init_raw_params().items()}
    d = jnp.asarray(np.abs(rng.standard_normal(5)))

    g = jax.grad(lambda p: k.from_dist(p, d).sum())(raw)
    # finite differences
    eps = 1e-6
    raw2 = {"inv_lengthscale": raw["inv_lengthscale"] + eps}
    fd = (float(k.from_dist(raw2, d).sum()) - float(k.from_dist(raw, d).sum())) / eps
    np.testing.assert_allclose(float(g["inv_lengthscale"]), fd, rtol=1e-4)


def test_priors_lnpdf():
    import scipy.stats as st

    x = np.array([0.5, 1.5, 3.0])
    np.testing.assert_allclose(
        Gaussian(1.0, 2.0).lnpdf(jnp.asarray(x)),
        st.norm(1.0, np.sqrt(2.0)).logpdf(x), rtol=1e-9)
    np.testing.assert_allclose(
        Gamma(2.0, 3.0).lnpdf(jnp.asarray(x)),
        st.gamma(2.0, scale=1 / 3.0).logpdf(x), rtol=1e-9)
    np.testing.assert_allclose(
        InverseGamma(2.0, 3.0).lnpdf(jnp.asarray(x)),
        st.invgamma(2.0, scale=3.0).logpdf(x), rtol=1e-9)
    np.testing.assert_allclose(
        HalfLaplace(2.0).lnpdf(jnp.asarray(x)),
        st.expon(scale=2.0).logpdf(x), rtol=1e-9)


def test_gamma_from_ev():
    g = Gamma.from_EV(2.0, 0.5)
    assert np.isclose(g.a / g.b, 2.0) and np.isclose(g.a / g.b**2, 0.5)


def test_prior_domain_check():
    from runlmc_tpu.params import IDENTITY

    check_domain(Gamma(1.0, 1.0), POSITIVE)  # fine
    with pytest.raises(ValueError):
        check_domain(Gamma(1.0, 1.0), IDENTITY)
    check_domain(Gaussian(0.0, 1.0), IDENTITY)  # real prior, any domain
