"""Leftmost-priority pruned automaton == the occurrence-set engine.

The O(n) leftmost walk (``ac_build_dense_leftmost`` +
``ac_resolve_leftmost``) is a third independent formulation of the
leftmost semantics (after the occurrence-set engine and the fused ring
resolver); it must agree tuple-for-tuple everywhere, including the
reference's order-sensitivity goldens (/root/reference/README.md:121-149)
and adversarial nested/dense corpora.
"""

from __future__ import annotations

import numpy as np
import pytest

from ahocorasick_rs_tpu import AhoCorasick, BytesAhoCorasick, MatchKind
from ahocorasick_rs_tpu.models import native
from ahocorasick_rs_tpu.models.automaton import build_automaton

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)

KM = {
    "leftmost_first": MatchKind.LeftmostFirst,
    "leftmost_longest": MatchKind.LeftmostLongest,
}


def _walk(pats: list[bytes], hay: bytes, kind: str):
    am = build_automaton(pats)
    dlm = native.build_leftmost_table(pats)
    bl, bp = native.leftmost_best(am)
    p, s, e = native.resolve_leftmost_native(
        dlm, bl, bp, np.frombuffer(hay, np.uint8), kind
    )
    return list(zip(p.tolist(), s.tolist(), e.tolist()))


def _engine(pats: list[bytes], hay: bytes, kind: str):
    return BytesAhoCorasick(
        pats, matchkind=KM[kind], backend="python"
    ).find_matches_as_indexes(hay)


@pytest.mark.parametrize("kind", list(KM))
def test_leftmost_walk_random(kind):
    rng = np.random.default_rng(17)
    for _ in range(150):
        alpha = int(rng.choice([2, 3, 4, 26]))
        pats = [
            bytes(rng.integers(0, alpha, int(rng.integers(1, 8)),
                               dtype=np.uint8))
            for _ in range(int(rng.integers(1, 15)))
        ]
        pats = [p for p in pats if p]
        if not pats:
            continue
        hay = bytes(
            rng.integers(0, alpha, int(rng.integers(0, 500)),
                         dtype=np.uint8)
        )
        assert _walk(pats, hay, kind) == _engine(pats, hay, kind), (
            pats, hay, kind
        )


def test_leftmost_order_sensitivity_goldens():
    """The disc/disco pattern-order cases the reference documents."""
    assert _walk([b"disco", b"disc"], b"discontent", "leftmost_first") == [
        (0, 0, 5)
    ]
    assert _walk([b"disc", b"disco"], b"discontent", "leftmost_first") == [
        (0, 0, 4)
    ]
    assert _walk(
        [b"disc", b"disco"], b"discontent", "leftmost_longest"
    ) == [(1, 0, 5)]
    # winter matrix golden (tests/test_ac.py:230-248 equivalents)
    pats = [b"content", b"disco", b"disc", b"discontent", b"winter"]
    hay = b"This is the winter of my discontent"
    assert [p for (p, _, _) in _walk(pats, hay, "leftmost_first")] == [4, 1]
    assert [
        p for (p, _, _) in _walk(pats, hay, "leftmost_longest")
    ] == [4, 3]


@pytest.mark.parametrize("kind", list(KM))
def test_leftmost_walk_nested_dense(kind):
    pats = [b"a" * k for k in range(1, 33)] + [b"ab", b"ba" * 3]
    hay = (b"a" * 1000 + b"b") * 30 + b"a" * 77
    assert _walk(pats, hay, kind) == _engine(pats, hay, kind)


@pytest.mark.parametrize("kind", list(KM))
def test_public_api_routes_leftmost_walk(monkeypatch, kind):
    """The dense-regime guard now lands leftmost kinds on the O(n)
    pruned walk through the public API."""
    pats = [b"a" * k for k in range(1, 9)]
    hay = b"a" * (1 << 16)
    ac = BytesAhoCorasick(pats, matchkind=KM[kind], backend="native")
    monkeypatch.setattr(type(ac), "_STREAM_MIN", 1 << 14)
    monkeypatch.setattr(type(ac), "_STREAM_SEG", 1 << 13)
    got = ac.find_matches_as_indexes(hay)
    assert ac.stats()["last_backend"] == "native_resolve"
    assert got == _engine(pats, hay, kind)


def test_leftmost_walk_str_class_unicode():
    """str-class matchers with multi-byte patterns stay exact (byte
    automaton; code-point mapping applied above this layer)."""
    pats = ["héllo", "llo", "é"]
    hay = "xxhélloxxé" * 500
    want = AhoCorasick(
        pats, matchkind=MatchKind.LeftmostLongest, backend="python"
    ).find_matches_as_indexes(hay)
    bpats = [p.encode() for p in pats]
    am = build_automaton(bpats)
    dlm = native.build_leftmost_table(bpats)
    bl, bp = native.leftmost_best(am)
    data = hay.encode()
    p, s, e = native.resolve_leftmost_native(
        dlm, bl, bp, np.frombuffer(data, np.uint8), "leftmost_longest"
    )
    from ahocorasick_rs_tpu.utils.codepoints import (
        byte_to_codepoint_prefix,
    )

    cp = byte_to_codepoint_prefix(np.frombuffer(data, np.uint8))
    got = [
        (int(pi), int(cp[si]), int(cp[ei]))
        for pi, si, ei in zip(p, s, e)
    ]
    assert got == want
