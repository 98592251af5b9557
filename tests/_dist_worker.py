"""Worker process for tests/test_distributed.py.

Runs the documented multi-host recipe (parallel/launcher.py): initialize
the distributed runtime from COORD/NPROC/PROC_ID env vars (no-op when
unset), build a global mesh, train the sin/cos two-output model for a
few steps with the mesh-sharded exact objective, and print the final
parameter vector as JSON on stdout (marker line DIST_RESULT).
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import runlmc_tpu.parallel as par
    from runlmc_tpu import AdaDelta, InterpolatedLLGP, LMCKernelSpec, RBF

    started = par.initialize()
    mesh = par.global_mesh(axis_name="probe")
    n_dev = len(jax.devices())

    rng = np.random.RandomState(0)
    Xs = [np.sort(rng.uniform(0, 1, 80)), np.sort(rng.uniform(0, 1, 64))]
    Ys = [np.sin(6 * x) + 0.1 * rng.randn(len(x)) for x in Xs]
    spec = LMCKernelSpec.create(
        D=2, lmc_kernels=[RBF(name="rbf0")], lmc_ranks=[2]
    )
    lmc = InterpolatedLLGP(
        Xs, Ys, functional_kernel=spec, m=[16], seed=0, mesh=mesh,
        objective="exact", trace_iterations=16,
    )
    info = lmc.optimize(optimizer=AdaDelta(max_it=4))
    out = {
        "distributed": bool(started),
        "process_index": int(jax.process_index()),
        "process_count": int(jax.process_count()),
        "n_devices": n_dev,
        "n_iter": int(info["n_iter"]),
        "params": np.asarray(lmc.param_array).tolist(),
    }
    print("DIST_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
