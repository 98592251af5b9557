"""Multi-output GP base model: validation, normalization, prediction
plumbing (parity: runlmc/models/multigp.py:27-235)."""

import logging

import numpy as np
import scipy.stats

from runlmc_tpu.utils.normalizer import IdentityNormalizer, Normalizer

_LOG = logging.getLogger(__name__)


class MultiGP:
    """Base class for multi-output GP models over ragged per-output data.

    :param Xs: list (length D) of per-output inputs, each (n_d,) or
        (n_d, P)
    :param Ys: list of per-output observations, each (n_d,)
    :param normalize: z-score each output (parity: multigp.py:63-69)
    """

    def __init__(self, Xs, Ys, normalize=True, name="multigp"):
        self.name = name
        self.input_dim, self.output_dim = self._validate_io(Xs, Ys)
        self.Xs = self._pad_dims(Xs)

        if normalize:
            self.normalizer = [Normalizer(Y) for Y in Ys]
        else:
            self.normalizer = [IdentityNormalizer() for _ in Ys]
        self.Ys = [
            norm.normalize(Y) for norm, Y in zip(self.normalizer, Ys)
        ]

    # ------------------------------------------------------------ plumbing

    @staticmethod
    def _validate_io(Xs, Ys):
        """Parity: multigp.py:199-227."""
        if not len(Xs):
            raise ValueError("Expecting at least 1 output")
        if len(Xs) != len(Ys):
            raise ValueError(
                "Differing number of inputs {} and outputs {}".format(
                    len(Xs), len(Ys)
                )
            )
        for i, (X, Y) in enumerate(zip(Xs, Ys)):
            X, Y = np.asarray(X), np.asarray(Y)
            if len(X) != len(Y):
                raise ValueError(
                    "Output {} has {} inputs and {} observed vals".format(
                        i, len(X), len(Y)
                    )
                )
            if X.ndim not in (1, 2):
                raise ValueError(
                    "Input {} mishapen, {} not 1D or 2D".format(i, X.shape)
                )
            if Y.ndim != 1:
                raise ValueError(
                    "Output {} mishapen, {} not 1D".format(i, Y.shape)
                )
        dims = {
            np.asarray(X).shape[1] for X in Xs if np.asarray(X).ndim > 1
        }
        if not dims:
            dims = {1}
        if len(dims) != 1:
            raise ValueError(
                "Found inputs of varying dimensions {}".format(dims)
            )
        for i, Y in enumerate(Ys):
            if len(Y) and np.std(Y) == 0:
                raise ValueError("Output {} has std dev 0".format(i))
        return dims.pop(), len(Xs)

    def _pad_dims(self, Xs):
        """Parity: multigp.py:229-235."""
        Xs = [
            np.asarray(X, dtype=float).reshape(-1, 1)
            if np.asarray(X).ndim == 1
            else np.asarray(X, dtype=float)
            for X in Xs
        ]
        for i, X in enumerate(Xs):
            if X.shape[1] != self.input_dim:
                raise ValueError(
                    "input {} dim {} != expected dim {}".format(
                        i, X.shape[1], self.input_dim
                    )
                )
        return Xs

    # ------------------------------------------------------- abstract core

    def log_likelihood(self):
        raise NotImplementedError

    def _raw_predict(self, Xs):
        """-> (means, vars): lists of per-output arrays in normalized
        space."""
        raise NotImplementedError

    def optimize(self, **kwargs):
        raise NotImplementedError

    # ---------------------------------------------------------- checkpoint

    def save(self, path, opt_state=None, extra=None):
        """Write a single-file ``.npz`` checkpoint (parameters, RNG key,
        normalizer stats, optional optimizer state / extras). See
        :mod:`runlmc_tpu.utils.checkpoint`."""
        from runlmc_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(path, self, opt_state=opt_state, extra=extra)

    def restore(self, path):
        """Restore parameters / RNG key / normalizer stats from a
        checkpoint written by :meth:`save`; returns the loaded dict
        (including ``opt_state`` when present, to pass to
        ``optimize(state=...)``)."""
        from runlmc_tpu.utils.checkpoint import (
            load_checkpoint,
            restore_model,
        )

        ckpt = load_checkpoint(path)
        restore_model(self, ckpt)
        return ckpt

    # ------------------------------------------------------------- predict

    def _predict(self, Xs, normalize):
        assert len(Xs) == self.output_dim, (len(Xs), self.output_dim)
        mu, var = self._raw_predict(Xs)
        if normalize:
            mu = [
                norm.inverse_mean(m)
                for norm, m in zip(self.normalizer, mu)
            ]
            var = [
                norm.inverse_variance(v)
                for norm, v in zip(self.normalizer, var)
            ]
        return mu, var

    def predict(self, Xs):
        """Posterior mean/variance per output at new inputs ``Xs`` (list
        of per-output arrays; empty arrays allowed)."""
        Xs = self._pad_dims(Xs)
        return self._predict(Xs, normalize=True)

    def predict_quantiles(self, Xs, quantiles=(2.5, 97.5)):
        """Gaussian predictive quantiles (parity: multigp.py:143-165)."""
        Xs = self._pad_dims(Xs)
        mu, var = self._predict(Xs, normalize=False)
        quantiles = np.fromiter(quantiles, dtype=float)
        out = [
            np.outer(np.sqrt(v), scipy.stats.norm.ppf(quantiles / 100.0))
            + m[:, np.newaxis]
            for m, v in zip(mu, var)
        ]
        return [
            norm.inverse_mean(q) for norm, q in zip(self.normalizer, out)
        ]
