"""The benchmark pipeline's --validate smoke mode runs inside the test
suite, so the bench code can't silently rot (reference analog:
.travis.yml:16-17 runs `grad-grid/run.sh --validate` and
`representation-cmp/run.sh --validate` in CI)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir(
        os.environ.get("RUNLMC_DATA", "/root/reference/data")
    ),
    reason="benchmark data directory unavailable",
)


@pytest.mark.parametrize("name", ["fx2007", "weather", "synth"])
def test_bench_validate(name):
    import bench

    r = bench.run_validate(name)
    # run_validate already asserts quality sanity; re-check shape here
    assert np.isfinite(r["nlpd"])
    assert r["iters"] <= bench.VALIDATE[name]["max_it"]
