"""Coverage for the slfm / indep kernel kinds, the representation
auto-selection heuristic, and the reference's breadth of exact-vs-approx
model configurations.

Reference coverage being mirrored:
- grid_kernel.py:49-74 (gen_grid_kernel representation choice)
- functional_kernel.py:199-209 (kernel kinds)
- test_interpolated_llgp.py:87-177 (parameterized input-dim / rank /
  output-count grid)
- benchlib/standard_tester.py:35-46 (the weather slfm+Scaled config)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from runlmc_tpu import (
    RBF,
    AdaDelta,
    ExactLMC,
    InterpolatedLLGP,
    LMCKernelSpec,
    Matern32,
    Scaled,
)
from runlmc_tpu.lmc import likelihood as lk
from runlmc_tpu.lmc.grid import build_kski, choose_rep, make_grids


def _weather_spec(D=4):
    """SLFM rank-2 + per-output Scaled RBF (the weather benchmark
    config, reference standard_tester.py:35-46)."""
    return LMCKernelSpec.create(
        D=D,
        slfm_kernels=[RBF(name="s0"), RBF(name="s1")],
        indep_gp=[
            Scaled(inner=RBF(name="r%d" % i), trainable_scale=False)
            for i in range(D)
        ],
    )


def _synth_spec(D=3):
    """SLFM rank-2 + plain indep RBFs on 2-D inputs (the synth
    benchmark config, reference benchmarks/synth/synth.py:31-37)."""
    return LMCKernelSpec.create(
        D=D,
        slfm_kernels=[RBF(name="s0"), RBF(name="s1")],
        indep_gp=[RBF(name="r%d" % i) for i in range(D)],
    )


# ---------------------------------------------------------------------------
# choose_rep parity on the reference's representation-cmp configs
# (BASELINE.md rows; reference grid_kernel.py:49-64)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "D,rank,Q,expected",
    [
        (2, 2, 10, "bt"),  # R+D = 22 >= D^2 = 4
        (10, 1, 10, "slfm"),  # R+D = 20 < 100
        (10, 10, 1, "sum"),  # Q == 1
    ],
)
def test_choose_rep_representation_cmp_configs(D, rank, Q, expected):
    spec = LMCKernelSpec.create(
        D=D,
        lmc_kernels=[RBF(name="k%d" % q) for q in range(Q)],
        lmc_ranks=[rank] * Q,
    ).with_input_dim(1)
    assert choose_rep(spec, (0,)) == expected


def test_choose_rep_pure_slfm_correction():
    # no lmc and no indep kernels -> the D correction applies
    # (reference grid_kernel.py:58-61)
    D = 3
    spec = LMCKernelSpec.create(
        D=D, slfm_kernels=[RBF(name="s%d" % q) for q in range(2)]
    ).with_input_dim(1)
    # R + D = 5 < D^2 + D = 12 -> slfm
    assert choose_rep(spec, (0,)) == "slfm"


# ---------------------------------------------------------------------------
# Dense-oracle matvec for slfm/indep mixes across every representation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("rep", ["sum", "bt", "slfm"])
@pytest.mark.parametrize("builder", [_weather_spec, _synth_spec])
def test_kind_mix_matvec_matches_dense_oracle(rng, rep, builder):
    spec = builder().with_input_dim(1)
    D = spec.D
    lens = tuple(rng.integers(8, 16) for _ in range(D))
    Xs = [np.sort(rng.uniform(0, 1, (n, 1)), axis=0) for n in lens]
    params = spec.init_raw_params(seed=1)
    gd, _ = make_grids(spec, Xs, m=[11], rep=rep, mode="fft")
    assert gd[0].plan.rep == rep
    K = build_kski(spec, params, tuple(gd), lens)
    dense = np.asarray(K.as_dense())
    v = rng.standard_normal((3, sum(lens)))
    np.testing.assert_allclose(
        np.asarray(K.matvec(jnp.asarray(v))), v @ dense, atol=1e-9
    )
    # PSD sanity
    assert np.linalg.eigvalsh(dense).min() > 0


def test_kind_mix_2d_bicubic_matvec(rng):
    spec = _synth_spec().with_input_dim(2)
    D = spec.D
    Xs = [rng.uniform(0, 1, (12, 2)) for _ in range(D)]
    params = spec.init_raw_params(seed=2)
    gd, _ = make_grids(spec, Xs, m=[6, 7], mode="fft")
    K = build_kski(spec, params, tuple(gd), (12,) * D)
    dense = np.asarray(K.as_dense())
    v = rng.standard_normal(12 * D)
    np.testing.assert_allclose(
        np.asarray(K.matvec(jnp.asarray(v))), dense @ v, atol=1e-9
    )


def test_slfm_rep_equals_other_reps(rng):
    """The factored slfm Fourier contraction is the same operator as
    sum/bt (reference asserts this implicitly via its model tests)."""
    spec = _weather_spec().with_input_dim(1)
    D = spec.D
    Xs = [np.sort(rng.uniform(0, 1, (10, 1)), axis=0) for _ in range(D)]
    params = spec.init_raw_params(seed=3)
    v = rng.standard_normal(10 * D)
    outs = []
    for rep in ("sum", "bt", "slfm"):
        gd, _ = make_grids(spec, Xs, m=[9], rep=rep, mode="fft")
        K = build_kski(spec, params, tuple(gd), (10,) * D)
        outs.append(np.asarray(K.matvec(jnp.asarray(v))))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-10)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-10)


# ---------------------------------------------------------------------------
# Mini-weather / mini-synth end-to-end (ragged + empty test outputs)
# ---------------------------------------------------------------------------


def test_mini_weather_end_to_end(rng):
    """Weather-shaped: D=4 slfm+Scaled spec, ragged lengths, fit a few
    steps, predict with one EMPTY test output (reference
    standard_tester.py:118-148 semantics)."""
    D = 4
    lens = [35, 28, 40, 22]
    Xs = [np.sort(rng.uniform(0, 10, (n, 1)), axis=0) for n in lens]
    Ys = [
        np.sin(0.7 * X[:, 0] + d) + 0.1 * rng.standard_normal(len(X))
        for d, X in enumerate(Xs)
    ]
    lmc = InterpolatedLLGP(
        Xs, Ys, functional_kernel=_weather_spec(D), m=[24], seed=0
    )
    ll0 = lmc.log_likelihood()
    lmc.optimize(optimizer=AdaDelta(max_it=8))
    assert lmc.log_likelihood() > ll0
    test_Xs = [
        np.linspace(2, 8, 9)[:, None],
        np.zeros((0, 1)),
        np.linspace(2, 8, 5)[:, None],
        np.zeros((0, 1)),
    ]
    mu, var = lmc.predict(test_Xs)
    assert [len(m_) for m_ in mu] == [9, 0, 5, 0]
    assert all(np.all(np.isfinite(m_)) for m_ in mu)
    assert all(np.all(v >= 0) for v in var)

    # cross-check against the dense-exact oracle at matched params
    exact = ExactLMC(Xs, Ys, functional_kernel=_weather_spec(D), seed=0)
    exact.param_array = lmc.param_array
    mu_e, _ = exact.predict(test_Xs)
    for a, b in zip(mu, mu_e):
        np.testing.assert_allclose(a, b, atol=5e-2)


def test_mini_synth_end_to_end(rng):
    """Synth-shaped: P=2 inputs, slfm + indep mix, bicubic grids."""
    D = 3
    Xs = [rng.uniform(0, 1, (30, 2)) for _ in range(D)]
    Ys = [
        np.sin(4 * X[:, 0]) * np.cos(3 * X[:, 1])
        + 0.1 * rng.standard_normal(30)
        for X in Xs
    ]
    lmc = InterpolatedLLGP(
        Xs, Ys, functional_kernel=_synth_spec(D), m=[10, 10], seed=0
    )
    ll0 = lmc.log_likelihood()
    lmc.optimize(optimizer=AdaDelta(max_it=8))
    assert lmc.log_likelihood() > ll0
    mu, var = lmc.predict([X[:4] for X in Xs])
    assert all(np.all(np.isfinite(m_)) for m_ in mu)


# ---------------------------------------------------------------------------
# Exact-vs-approx breadth (reference test_interpolated_llgp.py:87-207):
# per config, the SKI reconstruction of the exact kernel is close AND
# improves with grid density.
# ---------------------------------------------------------------------------


def _config_specs():
    return {
        "1d_multirank": LMCKernelSpec.create(
            D=2,
            lmc_kernels=[RBF(name="a"), Matern32(name="b")],
            lmc_ranks=[3, 2],
        ),
        "1d_slfm_indep": LMCKernelSpec.create(
            D=3,
            slfm_kernels=[RBF(name="s")],
            indep_gp=[RBF(name="r%d" % i) for i in range(3)],
        ),
        "large_D5": LMCKernelSpec.create(
            D=5,
            lmc_kernels=[RBF(name="a")],
            lmc_ranks=[2],
            indep_gp=[Matern32(name="m%d" % i) for i in range(5)],
            indep_gp_index=list(range(5)),
        ),
    }


@pytest.mark.parametrize("name", sorted(_config_specs()))
def test_ski_error_decreases_with_grid_density(rng, name):
    spec0 = _config_specs()[name]
    D = spec0.D
    spec = spec0.with_input_dim(1)
    lens = tuple(rng.integers(10, 18) for _ in range(D))
    Xs = [np.sort(rng.uniform(0, 1, (n, 1)), axis=0) for n in lens]
    params = spec.init_raw_params(seed=5)
    data = lk.flatten_data(Xs, [np.zeros(n) for n in lens])
    K_exact = np.asarray(
        lk.exact_dense_K(
            spec, params, jnp.asarray(data.X), jnp.asarray(data.output_idx)
        )
    )

    errs = []
    for m in (10, 40):
        gd, _ = make_grids(spec, Xs, m=[m], mode="fft")
        K = build_kski(spec, params, tuple(gd), lens)
        errs.append(
            np.abs(np.asarray(K.as_dense()) - K_exact).max()
        )
    assert errs[1] < errs[0], errs
    assert errs[1] < 1e-3, errs


def test_3d_inputs_with_split_kernels(rng):
    """3-D inputs: kernels split over active-dim subsets (interpolation
    grids support <=2 dims per group; the reference's 3-D coverage uses
    the same splitting — test_interpolated_llgp.py:87-177)."""
    D = 2
    Xs = [rng.uniform(0, 1, (20, 3)) for _ in range(D)]
    Ys = [
        np.sin(3 * X[:, 0]) + X[:, 1] * X[:, 2]
        + 0.1 * rng.standard_normal(20)
        for X in Xs
    ]
    spec = LMCKernelSpec.create(
        D=D,
        lmc_kernels=[
            RBF(name="k0", active_dims=(0,)),
            RBF(name="k1", active_dims=(1, 2)),
        ],
        lmc_ranks=[1, 1],
    )
    lmc = InterpolatedLLGP(
        Xs, Ys, functional_kernel=spec, m=[10, 8, 8], seed=1
    )
    exact = ExactLMC(Xs, Ys, functional_kernel=spec, seed=1)
    ll_a, ll_e = lmc.log_likelihood(), exact.log_likelihood()
    assert abs(ll_a - ll_e) / abs(ll_e) < 5e-2
    lmc.optimize(optimizer=AdaDelta(max_it=4))
    mu, var = lmc.predict([X[:6] for X in Xs])
    assert all(np.all(np.isfinite(m_)) for m_ in mu)
