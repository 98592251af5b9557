"""First-class checkpoint / resume.

The reference has no checkpoint mechanism: its benchmarks hand-persist
the flat hyperparameter vector via ``np.save(lmc.param_array)`` and
pickle the kernel object (reference: benchmarks/benchlib/
standard_tester.py:255-256, benchmarks/synth/synth.py:16-23). Here
checkpointing is a library feature (SURVEY.md section 5 flags it as a
required upgrade): one ``.npz`` file captures everything needed to
resume training bit-exactly —

- the flat raw-parameter vector (the analog of paramz ``param_array``),
- the model's RNG key (resumes the per-step ``fprime`` key stream; the
  chunked AdaDelta path instead derives probe keys from
  ``opt_state['rng_key']`` by global-iteration ``fold_in``, so
  bit-exact chunked resume requires passing the checkpointed
  ``opt_state`` back to ``optimize``),
- per-output normalizer statistics,
- the optimizer state (AdaDelta running moments + stopping-rule
  state), when supplied,
- arbitrary user extras (scalars/arrays).

Resume = ``load_checkpoint`` + ``restore_model`` +
``AdaDelta.minimize(..., state=ckpt['opt_state'])``.
"""

import numpy as np

FORMAT_VERSION = 1

_MODEL_KEYS = ("param_array", "rng_key", "norm_means", "norm_stds")


def checkpoint_state(model, opt_state=None, extra=None):
    """Collect a model's resumable state into a flat dict of arrays."""
    state = {
        "format_version": np.asarray(FORMAT_VERSION),
        "param_array": np.asarray(model.param_array),
        "rng_key": np.asarray(
            getattr(model, "_key", np.zeros(2, dtype=np.uint32))
        ),
        "norm_means": np.asarray(
            [norm.mean for norm in model.normalizer], dtype=float
        ),
        "norm_stds": np.asarray(
            [norm.std for norm in model.normalizer], dtype=float
        ),
    }
    if opt_state is not None:
        for k, v in opt_state.items():
            state["opt__" + k] = np.asarray(v)
    if extra is not None:
        for k, v in extra.items():
            state["extra__" + k] = np.asarray(v)
    return state


def save_checkpoint(path, model, opt_state=None, extra=None):
    """Write a single-file ``.npz`` checkpoint of ``model`` (+ optional
    optimizer state from ``AdaDelta`` info['state'] and user extras)."""
    np.savez_compressed(
        path, **checkpoint_state(model, opt_state=opt_state, extra=extra)
    )


def load_checkpoint(path):
    """Read a checkpoint into a dict with keys ``param_array``,
    ``rng_key``, ``norm_means``, ``norm_stds``, plus nested
    ``opt_state`` / ``extra`` dicts when present."""
    with np.load(path) as z:
        raw = {k: z[k] for k in z.files}
    version = int(raw.pop("format_version", 1))
    if version > FORMAT_VERSION:
        raise ValueError(
            "checkpoint format %d newer than supported %d"
            % (version, FORMAT_VERSION)
        )
    out = {k: raw[k] for k in _MODEL_KEYS if k in raw}
    opt = {
        k[len("opt__"):]: v for k, v in raw.items()
        if k.startswith("opt__")
    }
    extra = {
        k[len("extra__"):]: v for k, v in raw.items()
        if k.startswith("extra__")
    }
    if opt:
        out["opt_state"] = opt
    if extra:
        out["extra"] = extra
    return out


def restore_model(model, ckpt):
    """Restore a model's parameters, RNG key, and normalizer statistics
    from a loaded checkpoint dict (see :func:`load_checkpoint`).

    The model must have been constructed with the same kernel spec
    (parameter count is validated)."""
    x = np.asarray(ckpt["param_array"])
    n_expected = getattr(model, "n_params", model.param_array.shape[0])
    if x.shape[0] != n_expected:
        raise ValueError(
            "checkpoint has %d parameters, model expects %d"
            % (x.shape[0], n_expected)
        )
    model.param_array = x
    if hasattr(model, "_key"):
        import jax.numpy as jnp

        model._key = jnp.asarray(ckpt["rng_key"])
    means = ckpt.get("norm_means")
    stds = ckpt.get("norm_stds")
    if means is not None and len(means) == len(model.normalizer):
        for norm, mu, sd in zip(model.normalizer, means, stds):
            norm.mean = float(mu)
            norm.std = float(sd)
    return model
