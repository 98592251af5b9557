"""Fully-jitted training step: stochastic gradient + AdaDelta update as
one XLA program, with the probe batch shardable over a device mesh.

This is the on-device counterpart of the host-side
:class:`runlmc_tpu.models.optimization.AdaDelta` loop (whose Python-side
stopping rule needs per-step gradient norms anyway — the jitted step
returns them). The update rule is the same climin-style AdaDelta:
momentum pre-step, gradient at the shifted point, RMS-scaled step.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from runlmc_tpu.lmc import likelihood as lk


class AdaDeltaState(NamedTuple):
    gms: jax.Array  # running mean of squared gradients
    sms: jax.Array  # running mean of squared steps
    step: jax.Array  # last step taken


def adadelta_init(x_flat):
    z = jnp.zeros_like(x_flat)
    return AdaDeltaState(gms=z, sms=z, step=z)


def make_train_step(
    spec,
    lens,
    params_template,
    tol=1e-4,
    method="minres",
    n_probes=15,
    prior_specs=(),
    step_rate=1.0,
    decay=0.9,
    momentum=0.5,
    offset=1e-4,
):
    """Build ``train_step(x_flat, opt_state, probes, grid_data, y) ->
    (x_flat', opt_state', aux)`` where ``probes`` is an (n_probes, n)
    array whose leading axis may be sharded over a mesh ('probe' axis),
    and ``grid_data``/``y`` are the (pytree) grid artifacts and stacked
    observations — passed as arguments, not closures, to keep them out
    of the compiled program's constant pool (see
    InterpolatedLLGP._build_jit). ``aux`` carries the inf-norm gradient
    for the host-side stopping rule.

    Also returns ``(x0_flat, opt_state0, unravel)``.
    """
    x0, unravel = ravel_pytree(params_template)

    def objective(p, probes, grid_data, y):
        s, aux = lk.stochastic_mll_surrogate(
            spec, p, grid_data, lens, y, probes, tol=tol, method=method
        )
        if prior_specs:
            s = s + lk.log_prior_term(prior_specs, p)
        return -s, aux

    def train_step(x_flat, opt_state: AdaDeltaState, probes, grid_data, y):
        step1 = momentum * opt_state.step
        x1 = x_flat - step1
        (_, aux), g = jax.value_and_grad(
            lambda p: objective(p, probes, grid_data, y), has_aux=True
        )(unravel(x1))
        gflat, _ = ravel_pytree(g)
        gms = decay * opt_state.gms + (1.0 - decay) * gflat**2
        step2 = (
            jnp.sqrt(opt_state.sms + offset)
            / jnp.sqrt(gms + offset)
            * gflat
            * step_rate
        )
        x2 = x1 - step2
        step = step1 + step2
        sms = decay * opt_state.sms + (1.0 - decay) * step**2
        new_state = AdaDeltaState(gms=gms, sms=sms, step=step)
        grad_norm = jnp.max(jnp.abs(gflat))
        return x2, new_state, {
            "grad_norm": grad_norm,
            "solve_iters": aux.solve_iters,
            "solve_error": aux.solve_error,
        }

    return train_step, (x0, adadelta_init(x0), unravel)
