"""Worker for benchmarks/dist_bench.py: time the mesh-sharded batched
Krylov solve (the framework's data-parallel hot loop) on this process's
slice of a global device mesh. COORD/NPROC/PROC_ID select the
distributed rendezvous (unset = single process)."""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    import runlmc_tpu.parallel as par
    from runlmc_tpu import LMCKernelSpec, RBF
    from runlmc_tpu.lmc import likelihood as lk
    from runlmc_tpu.lmc.grid import build_kski, make_grids
    from runlmc_tpu.ops.solvers import batched_minres

    started = par.initialize()
    mesh = par.global_mesh(axis_name="probe")

    B = int(os.environ.get("DB_BATCH", "64"))
    n_per = int(os.environ.get("DB_NPER", "235"))
    m = int(os.environ.get("DB_M", "238"))
    reps = int(os.environ.get("DB_REPS", "3"))
    D = 13

    rng = np.random.default_rng(0)
    Xs = [np.sort(rng.uniform(0, 1, (n_per, 1)), axis=0)
          for _ in range(D)]
    spec = LMCKernelSpec.create(
        D=D, lmc_kernels=[RBF(name="k0")], lmc_ranks=[2]
    ).with_input_dim(1)
    params = jax.tree.map(jnp.asarray, spec.init_raw_params(seed=0))
    grids, _ = make_grids(spec, Xs, m=[m], mode="fft")
    grids = tuple(
        gd.replace(coarse=None, dists=jnp.asarray(gd.dists))
        for gd in grids
    )
    lens = tuple(n_per for _ in range(D))
    n = n_per * D
    sharding = NamedSharding(mesh, PartitionSpec("probe", None))

    @jax.jit
    def solve(p, gd, b):
        K = build_kski(spec, p, gd, lens)
        return lk.sharded_solve(
            lambda rhs: batched_minres(K.matvec, rhs, tol=1e-6),
            b, sharding,
        ).x

    b = jax.device_put(
        jnp.asarray(rng.standard_normal((B, n))), sharding
    )
    solve(params, grids, b).block_until_ready()  # compile
    t0 = time.time()
    for _ in range(reps):
        solve(params, grids, b).block_until_ready()
    dt = (time.time() - t0) / reps
    out = {
        "distributed": bool(started),
        "process_count": int(jax.process_count()),
        "n_devices": len(jax.devices()),
        "B": B, "n": n, "m": m,
        "seconds": round(dt, 4),
        "solves_per_s": round(B / dt, 2),
    }
    print("DIST_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
