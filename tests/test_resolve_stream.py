"""StreamResolver == one-shot resolve, and the streamed host path == the
non-streamed tiers through the public API (match-dense guard, VERDICT r4).
"""

from __future__ import annotations

import numpy as np
import pytest

from ahocorasick_rs_tpu import (
    AhoCorasick,
    BytesAhoCorasick,
    Implementation,
    MatchKind,
)
from ahocorasick_rs_tpu.models.automaton import build_automaton
from ahocorasick_rs_tpu.ops import resolve as R
from ahocorasick_rs_tpu.ops import scan_host

KINDS = ["standard", "leftmost_first", "leftmost_longest"]


def _occurrences(pats: list[bytes], hay: bytes):
    am = build_automaton(pats)
    pos, st = scan_host.scan_python(am, hay)
    return am, R.expand_occurrences(am, pos, st)


def _stream_chunks(ends: np.ndarray, rng: np.random.Generator):
    """Random split indexes landing only on end-change boundaries."""
    M = len(ends)
    cuts = [0]
    i = 0
    while i < M:
        i += int(rng.integers(1, max(2, M // 5)))
        # advance to the end of this end-position group
        while i < M and ends[i] == ends[i - 1]:
            i += 1
        cuts.append(min(i, M))
    if cuts[-1] != M:
        cuts.append(M)
    return cuts


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("overlapping", [False, True])
def test_stream_resolver_equals_resolve_random(kind, overlapping):
    if overlapping and kind != "standard":
        pytest.skip("overlapping is Standard-only")
    rng = np.random.default_rng(11)
    for case in range(40):
        alpha = int(rng.choice([2, 3, 5]))
        pats = []
        seen = set()
        for _ in range(int(rng.integers(1, 12))):
            k = int(rng.integers(1, 7))
            p = bytes(rng.integers(0, alpha, k, dtype=np.uint8))
            if p and p not in seen:
                seen.add(p)
                pats.append(p)
        if not pats:
            continue
        hay = bytes(
            rng.integers(0, alpha, int(rng.integers(0, 400)), dtype=np.uint8)
        )
        am, (pids, starts, ends) = _occurrences(pats, hay)
        want = R.resolve(
            pids, starts, ends, kind=kind, overlapping=overlapping
        )
        sr = R.StreamResolver(kind, overlapping, am.max_len)
        cuts = _stream_chunks(ends, rng)
        for a, b in zip(cuts, cuts[1:]):
            bound = int(ends[b - 1]) if b > a else int(ends[a - 1])
            sr.feed(pids[a:b], starts[a:b], ends[a:b], bound)
        assert sr.result() == want, (pats, hay, kind, overlapping)


@pytest.mark.parametrize("kind", KINDS)
def test_stream_resolver_nested_dense(kind):
    """The adversarial regime: nested prefixes over a repetitive corpus."""
    pats = [b"a" * k for k in range(1, 17)]
    hay = b"a" * 5000 + b"b" + b"a" * 3000
    am, (pids, starts, ends) = _occurrences(pats, hay)
    want = R.resolve(pids, starts, ends, kind=kind)
    sr = R.StreamResolver(kind, False, am.max_len)
    # small fixed chunks stress the carry logic hard
    rng = np.random.default_rng(0)
    cuts = _stream_chunks(ends, rng)
    for a, b in zip(cuts, cuts[1:]):
        if b <= a:
            continue
        sr.feed(pids[a:b], starts[a:b], ends[a:b], int(ends[b - 1]))
    assert sr.result() == want


@pytest.mark.parametrize(
    "kind",
    [MatchKind.Standard, MatchKind.LeftmostFirst, MatchKind.LeftmostLongest],
)
@pytest.mark.parametrize("backend", ["native", "numpy"])
def test_streaming_find_equals_python_tier(monkeypatch, kind, backend):
    """Public API, streamed segments + carry vs the sequential walk."""
    pats = [b"a" * k for k in (1, 2, 3, 7, 20)] + [b"ba", b"ab" * 9]
    rng = np.random.default_rng(5)
    blocks = []
    for _ in range(200):
        blocks.append(b"a" * int(rng.integers(0, 60)))
        blocks.append(b"b" * int(rng.integers(1, 3)))
    hay = b"".join(blocks)
    ref = BytesAhoCorasick(pats, matchkind=kind, backend="python")
    want = ref.find_matches_as_indexes(hay)
    ac = BytesAhoCorasick(pats, matchkind=kind, backend=backend)
    monkeypatch.setattr(type(ac), "_STREAM_MIN", 1 << 12)
    monkeypatch.setattr(type(ac), "_STREAM_SEG", 1 << 11)
    monkeypatch.setattr(type(ac), "_STREAM_OCC", 1 << 9)
    got = ac.find_matches_as_indexes(hay)
    # this corpus is match-dense, so the native backend may switch to
    # the fused resolver — both must give the same answer
    assert ac.stats()["last_backend"] in (backend, "native_resolve")
    assert got == want
    if kind is MatchKind.Standard:
        got_o = ac.find_matches_as_indexes(hay, overlapping=True)
        want_o = ref.find_matches_as_indexes(hay, overlapping=True)
        assert ac.stats()["last_backend"] == backend  # no switch here
        assert got_o == want_o


@pytest.mark.parametrize(
    "kind",
    [MatchKind.Standard, MatchKind.LeftmostFirst, MatchKind.LeftmostLongest],
)
def test_streaming_native_sparse_no_switch(monkeypatch, kind):
    """A sparse corpus streams through the native lane tier (no fused
    switch), segment carries included."""
    pats = [b"needle", b"eedl", b"dlegq"]
    rng = np.random.default_rng(9)
    hay = bytearray(rng.integers(103, 123, 1 << 16, dtype=np.uint8).tobytes())
    for i in range(0, len(hay) - 8, 997):
        hay[i : i + 6] = b"needle"
    hay = bytes(hay)
    ref = BytesAhoCorasick(pats, matchkind=kind, backend="python")
    want = ref.find_matches_as_indexes(hay)
    ac = BytesAhoCorasick(pats, matchkind=kind, backend="native")
    monkeypatch.setattr(type(ac), "_STREAM_MIN", 1 << 14)
    monkeypatch.setattr(type(ac), "_STREAM_SEG", 1 << 13)
    got = ac.find_matches_as_indexes(hay)
    assert ac.stats()["last_backend"] == "native"
    assert got == want and len(want) > 50


def test_streaming_engages_on_large_host_scans(monkeypatch):
    """A >= _STREAM_MIN host-tier scan takes the streaming path."""
    ac = BytesAhoCorasick([b"xyz"], backend="numpy")
    monkeypatch.setattr(type(ac), "_STREAM_MIN", 1 << 16)
    hay = (b"m" * 9000 + b"xyz") * 12
    calls = []
    orig = type(ac)._find_streaming

    def spy(self, h, backend, overlapping):
        calls.append(backend)
        return orig(self, h, backend, overlapping)

    monkeypatch.setattr(type(ac), "_find_streaming", spy)
    got = ac.find_matches_as_indexes(hay)
    assert calls == ["numpy"]
    assert len(got) == 12
    assert got[0] == (0, 9000, 9003)


def test_streaming_str_class_unicode(monkeypatch):
    """Code-point mapping still applies over the streamed path."""
    ac = AhoCorasick(["é", "ab"], backend="python")
    monkeypatch.setattr(type(ac), "_STREAM_MIN", 1 << 10)
    monkeypatch.setattr(type(ac), "_STREAM_SEG", 1 << 9)
    hay = ("xé" * 400) + "ab"
    got = ac.find_matches_as_indexes(hay)
    ref = AhoCorasick(["é", "ab"], backend="python")
    want = ref.find_matches_as_indexes(hay)
    assert got == want
    assert got[-1] == (1, 800, 802)


@pytest.mark.parametrize("kind", [MatchKind.Standard, MatchKind.LeftmostLongest])
def test_device_tier_dense_bailout(monkeypatch, kind):
    """A match-dense device scan raises MatchDenseError and _find
    re-routes to the host resolvers (fused native walk here)."""
    from ahocorasick_rs_tpu.ops import scan_jax

    monkeypatch.setattr(scan_jax, "DENSE_BAILOUT_MIN", 64)
    pats = [b"a" * k for k in range(1, 9)]
    hay = b"a" * (1 << 16)
    ac = BytesAhoCorasick(pats, matchkind=kind, backend="device")
    got = ac.find_matches_as_indexes(hay)
    assert ac.stats()["last_backend"] in ("native_resolve", "numpy")
    want = BytesAhoCorasick(
        pats, matchkind=kind, backend="python"
    ).find_matches_as_indexes(hay)
    assert got == want


def test_sharded_tier_dense_bailout(monkeypatch):
    """Same bailout through the sharded pipeline on the virtual mesh."""
    from ahocorasick_rs_tpu.ops import scan_jax
    from ahocorasick_rs_tpu.parallel import sharded as sh

    monkeypatch.setattr(sh, "DENSE_BAILOUT_MIN", 64)
    monkeypatch.setattr(scan_jax, "DENSE_BAILOUT_MIN", 64)
    pats = [b"a" * k for k in range(1, 6)]
    hay = b"a" * (1 << 16)
    ac = BytesAhoCorasick(pats, backend="sharded")
    got = ac.find_matches_as_indexes(hay)
    assert ac.stats()["last_backend"] in ("native_resolve", "numpy")
    want = BytesAhoCorasick(
        pats, backend="python"
    ).find_matches_as_indexes(hay)
    assert got == want


def test_streaming_sparse_engine_auto_fallback(monkeypatch):
    """Sparse-engine auto scans land on the streamed host path too."""
    ac = BytesAhoCorasick(
        [b"needle"],
        implementation=Implementation.NoncontiguousNFA,
    )
    monkeypatch.setattr(type(ac), "_STREAM_MIN", 1 << 14)
    monkeypatch.setattr(type(ac), "_STREAM_SEG", 1 << 13)
    hay = b"x" * 40000 + b"needle" + b"y" * 40000
    got = ac.find_matches_as_indexes(hay)
    assert got == [(0, 40000, 40006)]


@pytest.mark.parametrize("backend", ["native", "device"])
def test_batch_dense_bailout_routes_per_document(monkeypatch, backend):
    """Match-dense batches re-route through the guarded single-doc path
    instead of expanding an O(n * nesting) occurrence set (code-review
    r5 finding: the batch APIs lacked the density guard)."""
    from ahocorasick_rs_tpu.ops import scan_jax

    monkeypatch.setattr(scan_jax, "DENSE_BAILOUT_MIN", 64)
    pats = [b"a" * k for k in range(1, 9)]
    docs = [b"a" * 20000, b"a" * 15000 + b"b" * 10, b""]
    ac = BytesAhoCorasick(pats, backend=backend)
    monkeypatch.setattr(type(ac), "_STREAM_OCC", 1 << 10)
    monkeypatch.setattr(type(ac), "_STREAM_MIN", 1 << 30)  # isolate guard
    got = ac.find_matches_as_indexes_batch(docs)
    ref = BytesAhoCorasick(pats, backend="python")
    want = [ref.find_matches_as_indexes(d) for d in docs]
    assert got == want
