"""Independent match-semantics oracle (VERDICT r2 weak #4).

Every execution tier funnels through ``ops/resolve.py``, so the cross-tier
equivalence suite can never catch a bug in the resolution sweep itself.
This oracle is *definitional*: it enumerates all pattern occurrences by
brute-force substring search (``str.find``/``bytes.find`` — no automaton,
no resolve) and applies the reference's stated rules directly
(/root/reference/README.md:84-162, SURVEY.md §3.6):

* Standard: earliest-ending match wins (tie: longest, then first-listed
  pattern); the scan restarts at the match end.
* LeftmostFirst: leftmost start wins (tie: first-listed); restart at end.
* LeftmostLongest: leftmost start wins (tie: longest, then first-listed);
  restart at end.
* overlapping=True: every occurrence, ordered by end, then length
  descending, then pattern position (/root/reference/tests/test_ac.py:276-288).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
import pytest

from ahocorasick_rs_tpu import AhoCorasick, BytesAhoCorasick, MatchKind

KINDS = [
    MatchKind.Standard,
    MatchKind.LeftmostFirst,
    MatchKind.LeftmostLongest,
]


def naive_occurrences(patterns, hay):
    """All (pid, start, end), brute force; works on str or bytes."""
    occ = []
    for pid, p in enumerate(patterns):
        i = 0
        while True:
            i = hay.find(p, i)
            if i < 0:
                break
            occ.append((pid, i, i + len(p)))
            i += 1
    return occ


def oracle(patterns, hay, kind, overlapping=False):
    occ = naive_occurrences(patterns, hay)
    if overlapping:
        return sorted(occ, key=lambda t: (t[2], t[1], t[0]))
    out = []
    cur = 0
    while True:
        cands = [t for t in occ if t[1] >= cur]
        if not cands:
            break
        if kind is MatchKind.Standard:
            best = min(cands, key=lambda t: (t[2], t[1], t[0]))
        elif kind is MatchKind.LeftmostFirst:
            best = min(cands, key=lambda t: (t[1], t[0]))
        else:
            best = min(cands, key=lambda t: (t[1], t[1] - t[2], t[0]))
        out.append(best)
        cur = best[2]
    return out


patterns_strategy = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=5),
    min_size=1,
    max_size=8,
)
hay_strategy = st.text(alphabet="abcd", max_size=80)


@pytest.mark.parametrize("kind", KINDS)
@given(patterns=patterns_strategy, hay=hay_strategy)
@settings(max_examples=150)
def test_str_matchkinds_vs_oracle(kind, patterns, hay):
    ac = AhoCorasick(patterns, matchkind=kind)
    assert ac.find_matches_as_indexes(hay) == oracle(patterns, hay, kind)


@given(patterns=patterns_strategy, hay=hay_strategy)
@settings(max_examples=150)
def test_str_overlapping_vs_oracle(patterns, hay):
    ac = AhoCorasick(patterns)
    assert ac.find_matches_as_indexes(hay, overlapping=True) == oracle(
        patterns, hay, MatchKind.Standard, overlapping=True
    )


bytes_patterns_strategy = st.lists(
    st.binary(min_size=1, max_size=4).map(
        lambda b: bytes(x % 4 for x in b)  # tiny alphabet => collisions
    ),
    min_size=1,
    max_size=8,
)
bytes_hay_strategy = st.binary(max_size=80).map(
    lambda b: bytes(x % 5 for x in b)
)


@pytest.mark.parametrize("kind", KINDS)
@given(patterns=bytes_patterns_strategy, hay=bytes_hay_strategy)
@settings(max_examples=100)
def test_bytes_matchkinds_vs_oracle(kind, patterns, hay):
    ac = BytesAhoCorasick(patterns, matchkind=kind)
    assert ac.find_matches_as_indexes(hay) == oracle(patterns, hay, kind)


@given(patterns=bytes_patterns_strategy, hay=bytes_hay_strategy)
@settings(max_examples=100)
def test_bytes_overlapping_vs_oracle(patterns, hay):
    ac = BytesAhoCorasick(patterns)
    assert ac.find_matches_as_indexes(hay, overlapping=True) == oracle(
        patterns, hay, MatchKind.Standard, overlapping=True
    )


@pytest.mark.parametrize("kind", KINDS)
@given(
    patterns=st.lists(
        st.text(alphabet="aé€b", min_size=1, max_size=4),
        min_size=1,
        max_size=6,
    ),
    hay=st.text(alphabet="aé€bc", max_size=60),
)
@settings(max_examples=100)
def test_unicode_codepoint_indexes_vs_oracle(kind, patterns, hay):
    """The oracle works in code-point space — exactly what the public API
    must return for str haystacks (/root/reference/src/lib.rs:74-75)."""
    ac = AhoCorasick(patterns, matchkind=kind)
    assert ac.find_matches_as_indexes(hay) == oracle(patterns, hay, kind)


from ahocorasick_rs_tpu import Implementation  # noqa: E402


@pytest.mark.parametrize(
    "impl",
    [
        Implementation.DFA,
        Implementation.ContiguousNFA,
        Implementation.NoncontiguousNFA,
    ],
)
@pytest.mark.parametrize("kind", KINDS)
@given(patterns=patterns_strategy, hay=hay_strategy)
@settings(max_examples=40)
def test_forced_implementations_vs_oracle(impl, kind, patterns, hay):
    """SURVEY §4 gap: implementation= forcing on the property paths."""
    ac = AhoCorasick(patterns, matchkind=kind, implementation=impl)
    assert ac.find_matches_as_indexes(hay) == oracle(patterns, hay, kind)


@given(
    patterns=st.lists(
        st.text(alphabet="aé€b", min_size=1, max_size=4),
        min_size=1,
        max_size=6,
    ),
    hay=st.text(alphabet="aé€bc", max_size=50),
)
@settings(max_examples=80)
def test_bytes_vs_str_index_units(patterns, hay):
    """SURVEY §4 gap: same data through both classes — BytesAhoCorasick
    returns byte offsets, AhoCorasick code-point offsets, same matches."""
    ac = AhoCorasick(patterns)
    bc = BytesAhoCorasick([p.encode() for p in patterns])
    data = hay.encode()
    str_m = ac.find_matches_as_indexes(hay, overlapping=True)
    byte_m = bc.find_matches_as_indexes(data, overlapping=True)
    assert len(str_m) == len(byte_m)
    for (p1, s1, e1), (p2, s2, e2) in zip(str_m, byte_m):
        assert p1 == p2
        # byte span decodes to exactly the code-point span
        assert data[s2:e2].decode() == hay[s1:e1]
        # code-point index == count of codepoints before the byte offset
        assert len(data[:s2].decode()) == s1
        assert len(data[:e2].decode()) == e1


@pytest.mark.parametrize("kind", KINDS)
def test_duplicate_patterns(kind):
    """Duplicate patterns: the first-listed pattern id wins ties."""
    patterns = ["ab", "ab", "abc", "ab"]
    hay = "xabcx"
    ac = AhoCorasick(patterns, matchkind=kind)
    assert ac.find_matches_as_indexes(hay) == oracle(patterns, hay, kind)
