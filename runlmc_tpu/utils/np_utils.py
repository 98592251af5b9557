"""Host-side numpy conveniences.

These helpers run at model-construction (trace) time on the host, never
inside jit. Functional parity targets: reference
runlmc/util/numpy_convenience.py.
"""

import numpy as np


def begin_end_indices(lens):
    """Begin/end index pairs for contiguous segments of the given lengths.

    Parity: reference runlmc/util/numpy_convenience.py:97-101.
    """
    ends = np.cumsum(lens)
    begins = np.roll(ends, 1)
    if len(begins):
        begins[0] = 0
    return begins, ends


def tesselate(flat, lens):
    """Split a flat array into consecutive ragged segments of lengths `lens`.

    Parity: reference runlmc/util/numpy_convenience.py:31-49.
    """
    lens = np.asarray(lens)
    if lens.sum() != len(flat):
        raise ValueError(
            "lengths {} sum to {} != len(flat) {}".format(
                lens, lens.sum(), len(flat)
            )
        )
    return np.split(np.asarray(flat), np.cumsum(lens)[:-1])


def chunks(array, size):
    """Split `array` into consecutive chunks of length `size`."""
    if len(array) % size:
        raise ValueError("len {} not divisible by {}".format(len(array), size))
    return [array[i : i + size] for i in range(0, len(array), size)]


def cartesian_product(*arrays):
    """Cartesian product of 1-D arrays; row-major (last array fastest).

    Parity: reference runlmc/util/numpy_convenience.py:111-118.
    """
    grids = np.meshgrid(*arrays, indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1)


def search_descending(x, xs, inclusive=True):
    """Number of leading entries of descending `xs` that are > x (or >= x).

    Parity: reference runlmc/util/numpy_convenience.py search_descending.
    """
    xs = np.asarray(xs)
    if len(xs) and np.any(np.diff(xs) > 0):
        raise ValueError("expected descending array")
    if inclusive:
        return int(np.searchsorted(-xs, -x, side="right"))
    return int(np.searchsorted(-xs, -x, side="left"))


def smallest_eig(sym):
    """Smallest eigenvalue of a symmetric matrix (host-side, LAPACK)."""
    return float(np.linalg.eigvalsh(sym)[0])


def symm_2d_list_map(f, xs, d, *args):
    """Map `f` over a D x D array of items, exploiting symmetry: computes
    f on the upper triangle and mirrors the result.

    Parity: reference runlmc/util/numpy_convenience.py:87-94.
    """
    out = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i, d):
            out[i][j] = f(xs[i][j], *args)
            out[j][i] = out[i][j]
    return out
