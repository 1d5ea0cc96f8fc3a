"""Prefiltered (Teddy) scan path: exactness against the sequential oracle.

Runs the Pallas fire kernel in interpreter mode on the CPU backend, so
inputs are kept small; the contract is bit-exact equality of the complete
occurrence set with the plain scan, plus prefilter soundness (no false
negatives) on adversarial pattern shapes.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from ahocorasick_rs_tpu.models.automaton import build_automaton
from ahocorasick_rs_tpu.models.prefilter import build_prefilter
from ahocorasick_rs_tpu.ops import resolve as R
from ahocorasick_rs_tpu.ops.scan_host import scan_python
from ahocorasick_rs_tpu.ops.scan_jax import DeviceTables
from ahocorasick_rs_tpu.ops.scan_teddy import TeddyScanner


def _oracle(am, hay: bytes):
    return R.resolve(
        *R.expand_occurrences(am, *scan_python(am, hay)),
        kind="standard",
        overlapping=True,
    )


def _teddy_occ(patterns: list[bytes], hay: bytes, engine: str = "dfa"):
    am = build_automaton(patterns)
    pf = build_prefilter(patterns)
    assert pf is not None
    t = DeviceTables(am, engine)
    scanner = TeddyScanner(
        am, pf, t.table, t.classes, t.match_count, t.use_classes
    )
    occ = scanner.occurrences(np.frombuffer(hay, dtype=np.uint8))
    return am, occ


@pytest.mark.parametrize("engine", ["dfa", "classed"])
def test_teddy_equals_oracle_names(engine: str) -> None:
    rng = random.Random(0)
    names = [
        bytes(rng.choice(b"abcdefgh") for _ in range(rng.randint(4, 9)))
        for _ in range(50)
    ]
    filler = b"zyxwvuts"
    hay = bytearray(
        bytes(rng.choice(filler) for _ in range(20_000))
    )
    for _ in range(60):  # splice names in
        nm = names[rng.randrange(len(names))]
        off = rng.randrange(len(hay) - len(nm))
        hay[off : off + len(nm)] = nm
    hay = bytes(hay)
    am, occ = _teddy_occ(names, hay, engine)
    assert occ is not None
    got = R.resolve(*occ, kind="standard", overlapping=True)
    want = _oracle(am, hay)
    assert len(want) > 30
    assert got == want


def test_teddy_short_patterns_sound() -> None:
    """Patterns shorter than the fingerprint must never be missed."""
    patterns = [b"a", b"xy", b"hello"]
    hay = b"qaq xy a hello axyhelloa " * 40
    am, occ = _teddy_occ(patterns, hay)
    assert occ is not None
    assert R.resolve(*occ, kind="standard", overlapping=True) == _oracle(
        am, hay
    )


def test_teddy_block_boundary_matches() -> None:
    """Matches whose fingerprints straddle the kernel's roll-wrap zone are
    caught by the force-fire rule."""
    pattern = b"boundary"
    # place the pattern across every 1024-byte boundary of a small buffer
    hay = bytearray(b"." * 8192)
    for off in (1022, 2045, 4094, 8184):
        hay[off : off + len(pattern)] = pattern
    am, occ = _teddy_occ([pattern], bytes(hay))
    assert occ is not None
    got = R.resolve(*occ, kind="standard", overlapping=True)
    assert got == _oracle(am, bytes(hay))
    assert len(got) == 4


def test_teddy_dense_corpus_falls_back() -> None:
    """A corpus where everything fires must return None (fallback signal)
    once verification would rescan too much (fires x window > n/2)."""
    # every 1-byte pattern fires constantly; the long pattern makes the
    # verification window (max_len) expensive enough to trip the guard
    patterns = [bytes([c]) for c in b"abcdefgh"] + [b"abcdefghabcd"]
    hay = bytes(random.Random(1).choice(b"abcdefgh") for _ in range(200_000))
    am = build_automaton(patterns)
    pf = build_prefilter(patterns)
    t = DeviceTables(am, "dfa")
    scanner = TeddyScanner(
        am, pf, t.table, t.classes, t.match_count, t.use_classes
    )
    occ = scanner.occurrences(np.frombuffer(hay, dtype=np.uint8))
    assert occ is None
    assert scanner.worthwhile is False


def test_tune_picks_a_config_and_stays_exact() -> None:
    """Measured-time prefilter tuning keeps scans bit-exact."""
    from ahocorasick_rs_tpu import AhoCorasick

    rng = random.Random(9)
    pats = [
        "".join(chr(rng.randint(97, 122)) for _ in range(5))
        for _ in range(80)
    ]
    hay = "".join(chr(rng.randint(97, 122)) for _ in range(4_000))
    hay = hay[:100] + pats[3] + hay[100:200] + pats[50] + hay[200:]
    ac = AhoCorasick(pats)
    ac._teddy_state = "force"
    report = ac.tune(hay)
    assert isinstance(report["chosen"], dict)
    assert len(report["candidates"]) >= 2
    want = AhoCorasick(pats, backend="python").find_matches_as_indexes(hay)
    assert ac.find_matches_as_indexes(hay) == want


def test_prefilter_huge_set_early_out() -> None:
    """Above MAX_PATTERNS no prefilter is attempted — construction must be
    O(1) in pattern count (10^6-pattern sets previously paid minutes of
    Python for a filter that could never be selective)."""
    import time

    from ahocorasick_rs_tpu.models.prefilter import (
        MAX_PATTERNS,
        build_prefilter,
    )

    pats = [b"%07d" % i for i in range(MAX_PATTERNS + 1)]
    t0 = time.perf_counter()
    assert build_prefilter(pats) is None
    assert time.perf_counter() - t0 < 1.0


def test_prefilter_estimates() -> None:
    selective = build_prefilter([b"hello", b"world", b"zebra"])
    dense = build_prefilter([bytes([c]) for c in range(64)])
    assert selective.est_fire_rate < 0.01
    assert dense.est_fire_rate > 0.2


def test_prefilter_soundness_exhaustive() -> None:
    """Every pattern occurrence position must fire (property check on the
    host model of the tables, all 256 bytes)."""
    rng = random.Random(3)
    patterns = [
        bytes(rng.randrange(256) for _ in range(rng.randint(1, 6)))
        for _ in range(100)
    ]
    pf = build_prefilter(patterns)
    allowed = pf.byte_allowed()  # [passes, m, 256, B]
    for ps in range(pf.passes):
        for pid, p in enumerate(patterns):
            b = pf.bucket_of[ps, pid]
            for k in range(min(pf.m, len(p))):
                assert allowed[ps, k, p[k], b], (ps, pid, k)
            for k in range(len(p), pf.m):
                assert allowed[ps, k, :, b].all()


def test_teddy_streamed_equals_single_dispatch() -> None:
    """occurrences_streamed (double-buffered segments with W-overlap +
    start attribution) == occurrences over the whole corpus, including
    matches spanning segment boundaries."""
    patterns = [b"hello", b"world", b"boundary"]
    rng = random.Random(4)
    hay = bytearray(
        bytes(rng.randrange(97, 123) for _ in range(40_000))
    )
    # plant matches, several straddling the segment cut points
    seg = 8192
    for cut in range(seg, len(hay), seg):
        hay[cut - 4 : cut + 4] = b"boundary"
    for i in range(0, len(hay) - 8, 1111):
        hay[i : i + 5] = b"hello"
    hay = bytes(hay)
    am = build_automaton(patterns)
    pf = build_prefilter(patterns)
    assert pf is not None
    t = DeviceTables(am, "dfa")
    scanner = TeddyScanner(
        am, pf, t.table, t.classes, t.match_count, t.use_classes
    )
    arr = np.frombuffer(hay, dtype=np.uint8)
    whole = scanner.occurrences(arr)
    streamed = scanner.occurrences_streamed(arr, seg_bytes=seg)
    assert whole is not None and streamed is not None
    for a, b in zip(whole, streamed):
        assert np.array_equal(a, b)
    # sanity: the boundary pattern was actually found
    assert (whole[0] == 2).sum() >= 3
