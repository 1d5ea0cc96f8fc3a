"""Unit tests for the host-side automaton compiler against naive oracles.

The oracle for the complete occurrence set is ``bytes`` scanning per pattern
— independent of any automaton code.  These tests pin down the compiler
(trie, failure links, match CSR ordering) and the occurrence expansion.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from ahocorasick_rs_tpu.models.automaton import PAD_BYTE, build_automaton
from ahocorasick_rs_tpu.ops import resolve as R
from ahocorasick_rs_tpu.ops.scan_host import (
    scan_numpy_lanes,
    scan_numpy_sparse,
    scan_python,
)


def naive_occurrences(
    patterns: list[bytes], hay: bytes
) -> list[tuple[int, int, int]]:
    """All (pid, start, end) occurrences ordered (end, len desc, pid)."""
    occ = []
    for pid, p in enumerate(patterns):
        start = hay.find(p)
        while start != -1:
            occ.append((pid, start, start + len(p)))
            start = hay.find(p, start + 1)
    occ.sort(key=lambda t: (t[2], t[1], t[0]))
    return occ


@pytest.mark.parametrize("seed", range(6))
def test_occurrence_set_matches_naive_oracle(seed: int) -> None:
    rng = random.Random(seed)
    alphabet = b"abcd"
    patterns = list(
        {
            bytes(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 30))
        }
    )
    hay = bytes(rng.choice(alphabet) for _ in range(3000))
    am = build_automaton(patterns)
    pos, st = scan_python(am, hay)
    got = R.resolve(
        *R.expand_occurrences(am, pos, st), kind="standard", overlapping=True
    )
    assert got == naive_occurrences(patterns, hay)


@pytest.mark.parametrize(
    "scanner", [scan_numpy_lanes, scan_numpy_sparse]
)
def test_lane_scans_equal_sequential(scanner) -> None:
    rng = random.Random(42)
    patterns = [b"aa", b"aba", b"bb", b"abab", b"aaaaab"]
    hay = bytes(rng.choice(b"ab") for _ in range(5000))
    am = build_automaton(patterns)
    p_seq, s_seq = scan_python(am, hay)
    hay_arr = np.frombuffer(hay, dtype=np.uint8)
    p_par, s_par = scanner(am, hay_arr, num_lanes=17)
    assert np.array_equal(p_seq, p_par)
    assert np.array_equal(s_seq, s_par)


def test_duplicate_patterns_all_reported() -> None:
    """Duplicate patterns share a trie node but keep distinct ids."""
    am = build_automaton([b"ab", b"ab", b"b"])
    pos, st = scan_python(am, b"zab")
    got = R.resolve(
        *R.expand_occurrences(am, pos, st), kind="standard", overlapping=True
    )
    # same end: longer 'ab' matches (pids 0 then 1), then suffix 'b' (pid 2)
    assert got == [(0, 1, 3), (1, 1, 3), (2, 2, 3)]


def test_match_csr_ordering_within_state() -> None:
    """Within a state the match list is (length desc, pid asc)."""
    am = build_automaton([b"t", b"nt", b"ent", b"tent", b"ntent"])
    pos, st = scan_python(am, b"xntent")
    got = R.resolve(
        *R.expand_occurrences(am, pos, st), kind="standard", overlapping=True
    )
    at_end = [g for g in got if g[2] == 6]
    lens = [e - s for (_, s, e) in at_end]
    assert lens == sorted(lens, reverse=True)


def test_classed_direct_build_equals_column_subset() -> None:
    """delta_classed built directly in class space (the 10^6-pattern path,
    which must never materialise the full [S, 257] table) is identical to
    column-subsetting the dense table."""
    import random

    rng = random.Random(9)
    pats = list(
        {
            bytes(rng.choice(b"abcd") for _ in range(rng.randint(1, 8)))
            for _ in range(200)
        }
    )
    am1 = build_automaton(pats)
    am2 = build_automaton(pats)
    am1.delta  # dense first: classed comes from column subsetting
    c1 = am1.delta_classed
    c2 = am2.delta_classed  # direct classed build
    assert am2._delta is None
    np.testing.assert_array_equal(c1, c2)


def test_pad_byte_column_is_root() -> None:
    am = build_automaton([b"abc", b"zz"])
    assert (am.delta[:, PAD_BYTE] == 0).all()
    assert int(am.byte_classes[PAD_BYTE]) == am.num_classes - 1


def test_byte_class_compression_is_lossless() -> None:
    am = build_automaton([b"abc", b"bcd", b"zzz"])
    classes = am.byte_classes
    classed = am.delta_classed
    dense = am.delta
    for b in range(256):
        assert np.array_equal(classed[:, classes[b]], dense[:, b])


def test_depths_and_failure_links() -> None:
    am = build_automaton([b"ab", b"babc"])
    # fail always points to a strictly shallower state
    assert (am.depth[am.fail[1:]] < am.depth[1:]).all()
    # root fails to root
    assert am.fail[0] == 0


def test_stats_shape() -> None:
    am = build_automaton([b"hello", b"world"])
    s = am.stats()
    assert s["num_patterns"] == 2
    assert s["max_pattern_len"] == 5
    assert s["num_states"] == 11
