"""Native (C++) builder must produce byte-identical tables to the Python
builder — same trie layout, failure links, match CSR, and dense table."""

from __future__ import annotations

import random

import numpy as np
import pytest

from ahocorasick_rs_tpu.models import native
from ahocorasick_rs_tpu.models.automaton import (
    build_automaton,
    build_automaton_py,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def _random_patterns(seed: int, count: int, alphabet: bytes) -> list[bytes]:
    rng = random.Random(seed)
    return [
        bytes(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(count)
    ]


@pytest.mark.parametrize("seed", range(4))
def test_native_tables_identical(seed: int) -> None:
    patterns = _random_patterns(seed, 300, b"abcd")
    a = build_automaton_py(patterns)
    b = native.build_automaton_native(patterns)
    assert a.num_states == b.num_states
    assert np.array_equal(a.edge_keys, b.edge_keys)
    assert np.array_equal(a.edge_targets, b.edge_targets)
    assert np.array_equal(a.fail, b.fail)
    assert np.array_equal(a.depth, b.depth)
    assert np.array_equal(a.match_offsets, b.match_offsets)
    assert np.array_equal(a.match_pids, b.match_pids)
    assert np.array_equal(a.match_lens, b.match_lens)
    assert a.max_len == b.max_len
    assert np.array_equal(a.delta, b.delta)
    assert np.array_equal(a.byte_classes, b.byte_classes)


def test_native_binary_patterns_with_duplicates() -> None:
    patterns = [b"\x00\xff", b"\xff", b"\x00\xff", b"\x00", b"ab\x00cd"]
    a = build_automaton_py(patterns)
    b = native.build_automaton_native(patterns)
    assert np.array_equal(a.delta, b.delta)
    assert np.array_equal(a.match_pids, b.match_pids)


def test_dispatch_uses_native_for_large_sets() -> None:
    rng = random.Random(9)
    patterns = [
        b"%b_%d" % (bytes(rng.choice(b"xyz") for _ in range(8)), i)
        for i in range(3000)
    ]
    am = build_automaton(patterns)  # over the 16 KiB dispatch threshold
    assert am.goto is None  # native-built automatons carry no dicts
    py = build_automaton_py(patterns)
    assert np.array_equal(am.edge_keys, py.edge_keys)
    assert np.array_equal(am.match_pids, py.match_pids)


def test_scan_python_works_without_goto_dicts() -> None:
    from ahocorasick_rs_tpu.ops import resolve as R
    from ahocorasick_rs_tpu.ops.scan_host import scan_python

    patterns = [b"abc", b"bc", b"cab", b"abcabc"]
    nat = native.build_automaton_native(patterns)
    py = build_automaton_py(patterns)
    hay = b"xabcabcabz" * 3
    got = R.resolve(
        *R.expand_occurrences(nat, *scan_python(nat, hay)),
        kind="standard",
        overlapping=True,
    )
    want = R.resolve(
        *R.expand_occurrences(py, *scan_python(py, hay)),
        kind="standard",
        overlapping=True,
    )
    assert got == want
    # CSR fallback path too (no prebuilt dense)
    nat._delta = None
    got2 = R.resolve(
        *R.expand_occurrences(nat, *scan_python(nat, hay)),
        kind="standard",
        overlapping=True,
    )
    assert got2 == want


@pytest.mark.parametrize("classed", [False, True])
def test_native_scan_equals_python_walk(classed: bool) -> None:
    from ahocorasick_rs_tpu.models.native import scan_dense_native
    from ahocorasick_rs_tpu.ops.scan_host import scan_python

    rng = random.Random(17)
    patterns = [
        bytes(rng.choice(b"abc") for _ in range(rng.randint(1, 6)))
        for _ in range(40)
    ]
    am = build_automaton_py(patterns)
    hay = bytes(rng.choice(b"abc") for _ in range(30_000))
    p_ref, s_ref = scan_python(am, hay)
    hay_arr = np.frombuffer(hay, dtype=np.uint8)
    if classed:
        p, s = scan_dense_native(
            am.delta_classed, am.match_count, hay_arr,
            classes=am.byte_classes,
        )
    else:
        p, s = scan_dense_native(am.delta, am.match_count, hay_arr)
    assert np.array_equal(p, p_ref)
    assert np.array_equal(s, s_ref)
    assert len(p) > 4096  # exercised the overflow-retry protocol


def test_native_backend_through_api() -> None:
    from ahocorasick_rs_tpu import BytesAhoCorasick

    patterns = [b"ring", b"spring", b"gspr"]
    hay = b"springringgspring" * 500
    got = BytesAhoCorasick(patterns, backend="native").find_matches_as_indexes(hay)
    ref = BytesAhoCorasick(patterns, backend="python").find_matches_as_indexes(hay)
    assert got == ref
