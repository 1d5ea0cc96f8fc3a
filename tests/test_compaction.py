"""Device match compaction + overflow-retry protocol (SURVEY.md §7:
ragged match output on an accelerator = fixed-capacity buffers + exact
counts + overflow-and-rescan).

``compact_sparse`` replaced every O(n) ``jnp.nonzero`` on the device paths
(PERF_NOTES.md round 3); its contract — ascending indexes, -1 padding,
exact total even past the capacity — is what every scan tier's retry loop
relies on.
"""

from __future__ import annotations

import numpy as np
import pytest

from ahocorasick_rs_tpu.ops.scan_jax import compact_sparse


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("density", [0.0, 0.001, 0.2])
def test_compact_sparse_matches_nonzero(seed: int, density: float) -> None:
    rng = np.random.default_rng(seed)
    n = 100_000
    mask = rng.random(n) < density
    want = np.nonzero(mask)[0]
    cap = max(16, 1 << int(np.ceil(np.log2(max(len(want), 1)))))
    idx, total = compact_sparse(np.asarray(mask), cap)
    idx = np.asarray(idx)
    assert int(total) == len(want)
    got = idx[idx >= 0]
    np.testing.assert_array_equal(np.sort(got), want)


def test_compact_sparse_overflow_reports_exact_total() -> None:
    """Past-capacity totals stay exact — the retry protocol's anchor."""
    n = 4096
    mask = np.ones(n, dtype=bool)
    idx, total = compact_sparse(np.asarray(mask), 64)
    assert int(total) == n  # exact despite cap=64


def test_compact_sparse_unaligned_length() -> None:
    mask = np.zeros(1000, dtype=bool)  # not a multiple of the block size
    mask[[0, 511, 512, 999]] = True
    idx, total = compact_sparse(np.asarray(mask), 16)
    got = np.sort(np.asarray(idx)[np.asarray(idx) >= 0])
    assert int(total) == 4
    np.testing.assert_array_equal(got, [0, 511, 512, 999])


def test_scan_overflow_retry_end_to_end() -> None:
    """A scan whose match count exceeds every initial capacity still
    returns the complete result (device tier, forced)."""
    from ahocorasick_rs_tpu import AhoCorasick

    hay = "ab" * 40_000  # 40k overlapping 'ab' + 'ba' matches
    ac = AhoCorasick(["ab", "ba"], backend="device")
    got = ac.find_matches_as_indexes(hay, overlapping=True)
    assert len(got) == 40_000 + 39_999
    assert got[:3] == [(0, 0, 2), (1, 1, 3), (0, 2, 4)]


def test_native_scanner_capacity_growth_and_reuse() -> None:
    """DenseScanner's thread-local buffers grow across calls and results
    are fresh copies (later scans must not alias earlier outputs)."""
    from ahocorasick_rs_tpu.models import native

    if not native.available():
        pytest.skip("no native toolchain")
    from ahocorasick_rs_tpu.models.automaton import build_automaton

    am = build_automaton([b"aa"])
    sc = native.DenseScanner(am.delta, am.match_count)
    small = np.frombuffer(b"aaa", dtype=np.uint8)
    pos1, st1 = sc.scan(small)
    big = np.frombuffer(b"a" * 5000, dtype=np.uint8)  # > initial 1024 cap
    pos2, st2 = sc.scan(big)
    assert len(pos2) == 4999
    np.testing.assert_array_equal(pos1, [1, 2])  # unchanged by 2nd scan
    pos3, _ = sc.scan(small)
    np.testing.assert_array_equal(pos3, pos1)
