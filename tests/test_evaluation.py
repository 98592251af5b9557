"""SMSE / NLPD metric tests (definition parity:
benchmarks/benchlib/standard_tester.py:205-233)."""

import numpy as np

from runlmc_tpu.utils.evaluation import nlpd, smse


def test_smse_perfect_prediction():
    t = [np.array([1.0, 2.0, 3.0])]
    assert smse(t, t, [np.array([0.0, 10.0])]) == 0.0


def test_smse_trivial_predictor_is_one():
    rng = np.random.default_rng(0)
    train = rng.standard_normal(1000)
    test = rng.standard_normal(500) + train.mean()
    pred = np.full(500, train.mean())
    v = smse([test], [pred], [train])
    assert 0.9 < v < 1.1


def test_smse_skips_empty_outputs():
    t = [np.zeros(0), np.array([1.0, 2.0])]
    p = [np.zeros(0), np.array([1.0, 2.0])]
    tr = [np.array([5.0, 6.0]), np.array([0.0, 4.0])]
    assert smse(t, p, tr) == 0.0


def test_nlpd_matches_gaussian():
    import scipy.stats as st

    t = [np.array([0.5, -1.0])]
    p = [np.array([0.0, 0.0])]
    v = [np.array([1.0, 4.0])]
    expected = -np.mean(
        [st.norm(0, 1).logpdf(0.5), st.norm(0, 2).logpdf(-1.0)]
    )
    np.testing.assert_allclose(nlpd(t, p, v), expected, rtol=1e-9)


def test_nlpd_filters_zero_variance():
    t = [np.array([0.5, -1.0, 2.0])]
    p = [np.array([0.0, 0.0, 0.0])]
    v = [np.array([1.0, 0.0, 4.0])]  # middle filtered
    v_clean = [np.array([1.0, 4.0])]
    t_clean = [np.array([0.5, 2.0])]
    p_clean = [np.array([0.0, 0.0])]
    np.testing.assert_allclose(
        nlpd(t, p, v), nlpd(t_clean, p_clean, v_clean), rtol=1e-12
    )
