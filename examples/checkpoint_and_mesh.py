"""Checkpoint/resume + device-mesh training, end to end.

Demonstrates the two subsystems the reference never had (SURVEY.md §5):

1. first-class checkpointing — interrupt training mid-run, save one
   .npz, restore into a FRESH process/model, and resume such that the
   final parameters match an uninterrupted run bit-exactly (the probe
   stream is keyed by global iteration);
2. mesh-parallel training — the same model code over a
   ``jax.sharding.Mesh``, sharding the solve/probe batch (the axis the
   reference spread over a multiprocessing pool).

Run:  JAX_PLATFORMS=cpu python examples/checkpoint_and_mesh.py
      (any device count works; CPU hosts can fake 8 devices with
       XLA_FLAGS=--xla_force_host_platform_device_count=8)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from runlmc_tpu import AdaDelta, InterpolatedLLGP, LMCKernelSpec, RBF
from runlmc_tpu.parallel import default_mesh, global_mesh, initialize
from runlmc_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_model,
    save_checkpoint,
)


def build(mesh=None, seed=7):
    rng = np.random.default_rng(0)
    n = 120
    Xs = [np.sort(rng.uniform(0, 2 * np.pi, (n, 1)), axis=0)
          for _ in range(2)]
    Ys = [np.sin(X[:, 0]) + 0.1 * rng.standard_normal(n) for X in Xs]
    spec = LMCKernelSpec.create(
        D=2, lmc_kernels=[RBF(name="k")], lmc_ranks=[1]
    )
    return InterpolatedLLGP(
        Xs, Ys, functional_kernel=spec, m=[24], seed=seed, mesh=mesh
    )


def main():
    # ---- 1. interrupt / checkpoint / resume ------------------------------
    m_full = build()
    m_full.optimize(optimizer=AdaDelta(max_it=30))
    x_uninterrupted = m_full.param_array.copy()

    m_a = build()
    info_a = m_a.optimize(optimizer=AdaDelta(max_it=12))
    path = os.path.join(tempfile.mkdtemp(), "ckpt.npz")
    save_checkpoint(path, m_a, opt_state=info_a["state"])
    print("checkpoint written after %d iterations -> %s"
          % (info_a["n_iter"], path))

    m_b = build()  # a FRESH model (new process in real use)
    ckpt = load_checkpoint(path)
    restore_model(m_b, ckpt)
    m_b.optimize(optimizer=AdaDelta(max_it=30), state=ckpt["opt_state"])
    drift = np.max(np.abs(m_b.param_array - x_uninterrupted))
    print("resumed run vs uninterrupted run: max param drift %.2e" % drift)
    assert drift < 1e-10, drift

    # ---- 2. the same model over a device mesh ----------------------------
    initialize()  # no-op on a single host; pod slices rendezvous here
    n_dev = len(jax.devices())
    mesh = (default_mesh(n_dev, axis_name="probe") if n_dev > 1
            else global_mesh(axis_name="probe"))
    m_mesh = build(mesh=mesh)
    m_mesh.optimize(optimizer=AdaDelta(max_it=10))
    Xt = [np.linspace(0.5, 5.5, 25)[:, None]] * 2
    mus, vs = m_mesh.predict(Xt)
    err = np.abs(mus[0] - np.sin(Xt[0][:, 0])).mean()
    print("mesh (%d devices) fit: mean abs prediction error %.3f"
          % (n_dev, err))
    assert err < 0.25


if __name__ == "__main__":
    main()
