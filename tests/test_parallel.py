"""Multi-device sharding tests on the virtual 8-device CPU mesh: the
jitted train step with a sharded probe batch, and the driver entry
points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    g, alpha = jax.tree.leaves(out)[0], jax.tree.leaves(out)[1]
    assert np.all(np.isfinite(np.asarray(g)))


def test_train_step_matches_host_adadelta(rng):
    """The fully-jitted AdaDelta step must reproduce the host-side
    optimizer's update given the same gradient sequence."""
    from runlmc_tpu.models.optimization import AdaDelta
    from runlmc_tpu.parallel.training import AdaDeltaState

    # emulate the jitted update rule on a fixed gradient function
    dim = 4
    grads = [rng.standard_normal(dim) for _ in range(5)]

    # host optimizer records the x it was queried at
    queried = []

    def fprime(x):
        queried.append(np.array(x))
        return grads[len(queried) - 1]

    opt = AdaDelta(max_it=5, permitted_drops=10**9)
    x_opt, _ = opt.minimize(np.zeros(dim), fprime)

    # manual jnp replication of the update rule
    x = jnp.zeros(dim)
    st = AdaDeltaState(*(jnp.zeros(dim),) * 3)
    momentum, decay, offset, rate = 0.5, 0.9, 1e-4, 1.0
    for g in grads:
        step1 = momentum * st.step
        x1 = x - step1
        g = jnp.asarray(g)
        gms = decay * st.gms + 0.1 * g**2
        step2 = jnp.sqrt(st.sms + offset) / jnp.sqrt(gms + offset) * g * rate
        x2 = x1 - step2
        step = step1 + step2
        sms = decay * st.sms + 0.1 * step**2
        st = AdaDeltaState(gms=gms, sms=sms, step=step)
        x = x2
    np.testing.assert_allclose(np.asarray(x), x_opt, rtol=1e-10)


def test_sharded_training_step_runs(rng):
    """Full training step over a 2-axis usage: probes sharded over the
    mesh, everything else replicated; executes and stays finite."""
    from runlmc_tpu import LMCKernelSpec, RBF
    from runlmc_tpu.lmc import likelihood as lk
    from runlmc_tpu.lmc.grid import make_grids
    from runlmc_tpu.parallel.mesh import default_mesh
    from runlmc_tpu.parallel.training import make_train_step

    D, n_per = 2, 20
    Xs = [np.sort(rng.uniform(0, 1, (n_per, 1)), axis=0) for _ in range(D)]
    Ys = [np.sin(5 * X[:, 0]) for X in Xs]
    spec = LMCKernelSpec.create(
        D=D, lmc_kernels=[RBF()], lmc_ranks=[1]
    ).with_input_dim(1)
    params = jax.tree.map(jnp.asarray, spec.init_raw_params())
    grids, _ = make_grids(spec, Xs, m=[8])
    grids = tuple(grids)
    data = lk.flatten_data(Xs, Ys)
    y = jnp.asarray(data.y)

    mesh = default_mesh(8, axis_name="probe")
    step, (x0, opt0, _) = make_train_step(
        spec, data.lens, params, n_probes=8
    )
    probe_shard = NamedSharding(mesh, P("probe", None))
    probes = jax.device_put(
        lk.rademacher_probes(jax.random.PRNGKey(0), 8, y.shape[0], y.dtype),
        probe_shard,
    )
    x1, opt1, aux = jax.jit(step)(x0, opt0, probes, grids, y)
    assert np.all(np.isfinite(np.asarray(x1)))
    assert float(aux["grad_norm"]) > 0

    # a second step continues from the new state
    x2, opt2, _ = jax.jit(step)(x1, opt1, probes, grids, y)
    assert not np.allclose(np.asarray(x1), np.asarray(x2))


def test_pad_and_shard_batch(rng):
    from runlmc_tpu.parallel.mesh import default_mesh, pad_batch, shard_batch

    b = rng.standard_normal((5, 7))
    padded, orig = pad_batch(b, 8)
    assert padded.shape == (8, 7) and orig == 5
    np.testing.assert_allclose(padded[:5], b)

    mesh = default_mesh(8, axis_name="probe")
    sharded = shard_batch(jnp.asarray(padded), mesh)
    assert len(sharded.sharding.device_set) == 8
