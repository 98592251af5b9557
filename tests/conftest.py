import numpy as np
import pytest


@pytest.fixture
def rng():
    """Seeded numpy Generator; override the seed with SEED env var
    (reproducibility pattern per reference runlmc/util/testing_utils.py:35-58,
    which prints the seed used)."""
    import os

    seed = int(os.environ.get("SEED", 0))
    print("SEED =", seed)
    return np.random.default_rng(seed)
