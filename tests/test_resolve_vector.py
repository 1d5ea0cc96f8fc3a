"""The O(M log M) pointer-doubling sweep must equal the sequential walk.

``ops.resolve._greedy_chain_indexes`` switches to vectorized pointer
doubling above _VECTOR_THRESHOLD; the hypothesis/oracle suites only ever
produce small occurrence sets, so this pins the vector path directly
against the list walk on large synthetic occurrence sets.
"""

from __future__ import annotations

import numpy as np
import pytest

from ahocorasick_rs_tpu.ops import resolve as R


def _list_walk(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    keep = []
    cur = 0
    for i in range(len(starts)):
        if starts[i] >= cur:
            keep.append(i)
            cur = ends[i]
    return np.asarray(keep, dtype=np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_vector_sweep_equals_list_walk(seed: int) -> None:
    rng = np.random.default_rng(seed)
    M = 60_000  # > _VECTOR_THRESHOLD
    ends = np.sort(rng.integers(1, 500_000, M)).astype(np.int64)
    lens = rng.integers(1, 12, M).astype(np.int64)
    starts = np.maximum(ends - lens, 0)
    got = R._greedy_chain_indexes(starts, ends)
    want = _list_walk(starts, ends)
    assert np.array_equal(got, want)


def test_vector_sweep_through_resolve() -> None:
    rng = np.random.default_rng(9)
    M = 40_000
    ends = np.sort(rng.integers(1, 200_000, M)).astype(np.int64)
    lens = rng.integers(1, 9, M).astype(np.int64)
    starts = np.maximum(ends - lens, 0)
    pids = rng.integers(0, 50, M).astype(np.int64)
    import ahocorasick_rs_tpu.ops.resolve as resolve_mod

    old = resolve_mod._VECTOR_THRESHOLD
    try:
        resolve_mod._VECTOR_THRESHOLD = 10**9  # force list walk
        want = R.resolve(pids, starts, ends, kind="leftmost_longest")
        resolve_mod._VECTOR_THRESHOLD = 0  # force vector path
        got = R.resolve(pids, starts, ends, kind="leftmost_longest")
    finally:
        resolve_mod._VECTOR_THRESHOLD = old
    assert got == want
