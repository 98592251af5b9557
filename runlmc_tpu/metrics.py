"""Optimization diagnostics recorder (parity: runlmc/lmc/metrics.py:4-10
and the metrics blocks of interpolated_llgp.py:228-244,
stochastic_deriv.py:42-45)."""


class Metrics:
    def __init__(self):
        self.iterations = []  # mean Krylov iterations per step
        self.solv_error = []  # mean solve reconstruction error per step
        self.grad_norms = []  # inf-norm of the stochastic gradient
        self.grad_error = []  # relative error vs exact gradient
        self.log_likely = []  # exact log likelihood trace
