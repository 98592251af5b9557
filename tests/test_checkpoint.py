"""Checkpoint / resume tests: an interrupted-then-resumed optimization
must reproduce the uninterrupted run bit-exactly (params, RNG stream,
optimizer moments, stopping-rule state)."""

import numpy as np

from runlmc_tpu import AdaDelta, InterpolatedLLGP, LMCKernelSpec, RBF
from runlmc_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_model,
    save_checkpoint,
)


def _sincos_data(rng, n=40):
    X0 = np.sort(rng.uniform(0, 2 * np.pi, n))
    X1 = np.sort(rng.uniform(0, 2 * np.pi, int(n * 0.8)))
    Y0 = np.sin(X0) + rng.standard_normal(n) * 0.05
    Y1 = np.cos(X1) + rng.standard_normal(len(X1)) * 0.05
    return [X0, X1], [Y0, Y1]


def _spec():
    return LMCKernelSpec.create(
        D=2, lmc_kernels=[RBF(name="r0")], lmc_ranks=[1]
    )


def _model(Xs, Ys, **kw):
    return InterpolatedLLGP(
        Xs, Ys, functional_kernel=_spec(), m=[32], seed=7, **kw
    )


def _resume_run(rng, tmp_path, **model_kw):
    Xs, Ys = _sincos_data(rng)

    # uninterrupted: 6 AdaDelta iterations
    full = _model(Xs, Ys, **model_kw)
    full.optimize(optimizer=AdaDelta(max_it=6))

    # interrupted: 3 iterations, checkpoint, fresh model, resume 3 more
    part = _model(Xs, Ys, **model_kw)
    info = part.optimize(optimizer=AdaDelta(max_it=3))
    path = tmp_path / "ckpt.npz"
    part.save(path, opt_state=info["state"])

    resumed = _model(Xs, Ys, **model_kw)
    ckpt = resumed.restore(path)
    np.testing.assert_array_equal(
        resumed.param_array, part.param_array
    )
    info2 = resumed.optimize(
        optimizer=AdaDelta(max_it=6), state=ckpt["opt_state"]
    )
    assert info2["n_iter"] == 6
    return full, resumed


def test_resume_matches_uninterrupted_bitexact(rng, tmp_path):
    """FFT grid mode: no stateful preconditioner, so the resumed
    trajectory (params, probes, solver iterations) is bit-identical."""
    full, resumed = _resume_run(rng, tmp_path, grid_mode="fft")
    np.testing.assert_array_equal(resumed.param_array, full.param_array)


def test_resume_matches_uninterrupted_dense(rng, tmp_path):
    """Dense grid mode: the stale-Woodbury preconditioner refresh
    schedule restarts at the resume point, so solves (converged to the
    1e-4 Krylov tolerance) may differ at tolerance level — but the
    trajectories must agree to solver accuracy."""
    full, resumed = _resume_run(rng, tmp_path)
    np.testing.assert_allclose(
        resumed.param_array, full.param_array, rtol=1e-3, atol=1e-4
    )


def test_checkpoint_roundtrip_fields(rng, tmp_path):
    Xs, Ys = _sincos_data(rng)
    m = _model(Xs, Ys)
    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, m, extra={"epoch": 3, "loss": 1.5})
    ckpt = load_checkpoint(path)

    assert ckpt["param_array"].shape == (m.n_params,)
    np.testing.assert_array_equal(ckpt["rng_key"], np.asarray(m._key))
    np.testing.assert_allclose(
        ckpt["norm_means"], [norm.mean for norm in m.normalizer]
    )
    assert int(ckpt["extra"]["epoch"]) == 3

    # restoring into a mismatched model fails loudly
    other = InterpolatedLLGP(
        Xs, Ys,
        functional_kernel=LMCKernelSpec.create(
            D=2, lmc_kernels=[RBF(name="a"), RBF(name="b")],
            lmc_ranks=[1, 2],
        ),
        m=[32], seed=7,
    )
    try:
        restore_model(other, ckpt)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_restore_normalizer_stats(rng, tmp_path):
    Xs, Ys = _sincos_data(rng)
    m = _model(Xs, Ys)
    path = tmp_path / "ckpt.npz"
    m.save(path)

    m2 = _model(Xs, Ys)
    # perturb normalizer stats, restore must bring them back
    m2.normalizer[0].mean += 1.0
    m2.normalizer[1].std *= 2.0
    m2.restore(path)
    for a, b in zip(m.normalizer, m2.normalizer):
        assert a.mean == b.mean and a.std == b.std
