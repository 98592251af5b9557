"""Dataset loader parity tests (counts/shapes match the reference's
published configs: BASELINE.md / standard_tester.py)."""

import os

import numpy as np
import pytest

from runlmc_tpu import datasets

needs_data = pytest.mark.skipif(
    not os.path.isdir(datasets.DEFAULT_DATA_DIR),
    reason="reference data directory unavailable",
)


@needs_data
def test_fx2007_shapes():
    xss, yss, test_xss, test_yss, test_cols, cols = datasets.fx2007()
    assert len(xss) == 13  # D=13 currency outputs
    n = sum(len(x) for x in xss)
    assert 2900 <= n <= 3200  # n ~= 3054
    assert test_cols == ["CAD", "JPY", "AUD"]
    # three held-out windows of 50 points each
    held = [len(t) for t in test_xss if len(t)]
    assert held == [50, 50, 50]
    for x, y in zip(xss, yss):
        assert len(x) == len(y)
        assert np.all(np.isfinite(y))


@needs_data
def test_weather_shapes():
    xss, yss, test_xss, test_yss, sensors = datasets.weather()
    assert sensors == ["bra", "cam", "chi", "sot"]
    n = sum(len(x) for x in xss)
    assert 15000 <= n <= 16000  # n ~= 15789 total with holdouts removed
    # bra and sot have no test windows
    assert len(test_xss[0]) == 0 and len(test_xss[3]) == 0
    assert len(test_xss[1]) > 0 and len(test_xss[2]) > 0
    for y in yss:
        assert np.all(np.isfinite(y))


@needs_data
def test_synth_shapes():
    xss, yss, test_xss, test_yss = datasets.synth()
    assert len(xss) == 5
    assert all(x.shape[1] == 2 for x in xss)
    assert sum(len(x) for x in xss) > 40000
    # only the last output has test data (upper-right quadrant)
    assert all(len(t) == 0 for t in test_xss[:4])
    assert len(test_xss[4]) > 0
    assert np.all(test_xss[4] >= 0.5)


def test_toy_sinusoid():
    xss, yss = datasets.toy_sinusoid(n=100, seed=1)
    assert len(xss) == 2 and len(yss[0]) == 100
