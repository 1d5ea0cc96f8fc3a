"""Fused native resolve-scan == the occurrence-set semantics engine.

``ac_resolve_dense`` walks the haystack once, carrying the greedy restart
cursor (a max_len ring for the leftmost kinds); the Python engine
expands the complete occurrence set and reduces it (``ops/resolve.py``).
Two independent formulations of SURVEY §3.6 — they must agree
tuple-for-tuple everywhere, including duplicate patterns (same string
twice = two pids), nested prefixes, and dense corpora.
"""

from __future__ import annotations

import numpy as np
import pytest

from ahocorasick_rs_tpu import BytesAhoCorasick, MatchKind
from ahocorasick_rs_tpu.models import native
from ahocorasick_rs_tpu.models.automaton import build_automaton

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)

KINDS = ["standard", "leftmost_first", "leftmost_longest"]


def _engine_reference(pats, hay, kind):
    km = {
        "standard": MatchKind.Standard,
        "leftmost_first": MatchKind.LeftmostFirst,
        "leftmost_longest": MatchKind.LeftmostLongest,
    }[kind]
    return BytesAhoCorasick(
        pats, matchkind=km, backend="python"
    ).find_matches_as_indexes(hay)


@pytest.mark.parametrize("kind", KINDS)
def test_resolve_scan_random(kind):
    rng = np.random.default_rng(23)
    for _ in range(60):
        alpha = int(rng.choice([2, 3, 4, 26]))
        pats = []
        seen = set()
        for _ in range(int(rng.integers(1, 15))):
            k = int(rng.integers(1, 8))
            p = bytes(rng.integers(0, alpha, k, dtype=np.uint8))
            if p:
                pats.append(p)  # duplicates allowed and intended
                seen.add(p)
        hay = bytes(
            rng.integers(0, alpha, int(rng.integers(0, 500)), dtype=np.uint8)
        )
        am = build_automaton(pats)
        p_, s_, e_ = native.resolve_scan_native(
            am, np.frombuffer(hay, np.uint8), kind
        )
        got = list(zip(p_.tolist(), s_.tolist(), e_.tolist()))
        want = _engine_reference(pats, hay, kind)
        assert got == want, (pats, hay, kind)


@pytest.mark.parametrize("kind", KINDS)
def test_resolve_scan_nested_dense(kind):
    pats = [b"a" * k for k in range(1, 33)] + [b"ab", b"ba" * 5]
    hay = (b"a" * 4000 + b"b") * 20 + b"a" * 100
    am = build_automaton(pats)
    p_, s_, e_ = native.resolve_scan_native(
        am, np.frombuffer(hay, np.uint8), kind
    )
    got = list(zip(p_.tolist(), s_.tolist(), e_.tolist()))
    want = _engine_reference(pats, hay, kind)
    assert got == want


@pytest.mark.parametrize("kind", KINDS)
def test_resolve_scan_classed_table(kind):
    """Byte-classed table variant must equal the dense one."""
    rng = np.random.default_rng(5)
    pats = [bytes(rng.integers(97, 102, int(rng.integers(1, 6)), dtype=np.uint8))
            for _ in range(10)]
    pats = [p for p in pats if p]
    hay = bytes(rng.integers(97, 103, 2000, dtype=np.uint8))
    am = build_automaton(pats)
    hay_arr = np.frombuffer(hay, np.uint8)
    dense = native.resolve_scan_native(am, hay_arr, kind)
    classed = native.resolve_scan_native(
        am, hay_arr, kind, classes=am.byte_classes, delta=am.delta_classed
    )
    got_d = list(zip(*(a.tolist() for a in dense)))
    got_c = list(zip(*(a.tolist() for a in classed)))
    want = _engine_reference(pats, hay, kind)
    assert got_d == want
    assert got_c == want


def test_resolve_scan_cap_retry():
    """Counting continues past cap; the retry returns everything."""
    am = build_automaton([b"a"])
    hay = np.frombuffer(b"a" * 10000, np.uint8)
    p_, s_, e_ = native.resolve_scan_native(am, hay, "standard")
    assert len(p_) == 10000
    assert (e_ - s_ == 1).all()


@pytest.mark.parametrize(
    "kind",
    [MatchKind.Standard, MatchKind.LeftmostFirst, MatchKind.LeftmostLongest],
)
def test_streaming_density_switch_to_native_resolve(monkeypatch, kind):
    """A match-dense big host scan switches to the fused resolver."""
    pats = [b"a" * k for k in range(1, 9)]
    hay = b"a" * (1 << 16)
    ac = BytesAhoCorasick(pats, matchkind=kind, backend="native")
    monkeypatch.setattr(type(ac), "_STREAM_MIN", 1 << 14)
    monkeypatch.setattr(type(ac), "_STREAM_SEG", 1 << 13)
    got = ac.find_matches_as_indexes(hay)
    assert ac.stats()["last_backend"] == "native_resolve"
    want = _engine_reference(pats, hay, kind.value)
    assert got == want
