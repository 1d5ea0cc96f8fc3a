"""Property-based conformance (Hypothesis) — the de-facto fuzzer.

Mirrors the reference's property suite (SURVEY.md §4.2):
construction-extensive, unicode-extensive, and the ``str.find`` /
``bytes.find`` first-match oracle (/root/reference/tests/test_ac.py:86-193,
/root/reference/tests/test_ac_bytes.py:133-189).
"""

from __future__ import annotations

from typing import Optional

from hypothesis import given
from hypothesis import strategies as st

from ahocorasick_rs_tpu import AhoCorasick, BytesAhoCorasick, Implementation

# SURVEY.md §4 flags that the reference never runs its hypothesis paths
# with a forced `implementation`; the TPU build closes that gap by drawing
# the engine as part of every property (None == auto-selection).
IMPLS = st.sampled_from(
    [None, Implementation.NoncontiguousNFA, Implementation.ContiguousNFA,
     Implementation.DFA]
)


@given(
    st.lists(st.text(min_size=3), min_size=1, max_size=30_000),
    st.sampled_from([True, False, None]),
)
def test_construction_extensive(
    patterns: list[str], store_patterns: Optional[bool]
) -> None:
    """Every constructed pattern matches itself
    (/root/reference/tests/test_ac.py:86-100)."""
    patterns = [f"{p}_{i}_" for (i, p) in enumerate(patterns)]
    ac = AhoCorasick(patterns, store_patterns=store_patterns)
    for p in patterns:
        assert ac.find_matches_as_strings(p) == [p]


@given(
    st.text(), st.text(min_size=1), st.text(),
    st.sampled_from([True, False, None]),
    IMPLS,
)
def test_unicode_extensive(
    prefix: str, pattern: str, suffix: str, store_patterns: Optional[bool],
    implementation: Optional[Implementation],
) -> None:
    """Code-point slicing correctness on arbitrary unicode
    (/root/reference/tests/test_ac.py:135-154)."""
    haystack = prefix + pattern + suffix
    if store_patterns is None:
        ac = AhoCorasick([pattern], implementation=implementation)
    else:
        ac = AhoCorasick(
            [pattern], store_patterns=store_patterns,
            implementation=implementation,
        )
    index_matches = ac.find_matches_as_indexes(haystack)
    assert {i for (i, _, _) in index_matches} == {0}
    assert {haystack[s:e] for (_, s, e) in index_matches} == {pattern}
    assert set(ac.find_matches_as_strings(haystack)) == {pattern}


@given(
    st.text(min_size=1), st.text(), st.sampled_from([True, False, None]),
    IMPLS,
)
def test_unicode_totally_random(
    pattern: str, haystack: str, store_patterns: Optional[bool],
    implementation: Optional[Implementation],
) -> None:
    """First-match start equals ``str.find``
    (/root/reference/tests/test_ac.py:171-193)."""
    if store_patterns is None:
        ac = AhoCorasick([pattern], implementation=implementation)
    else:
        ac = AhoCorasick(
            [pattern], store_patterns=store_patterns,
            implementation=implementation,
        )
    index_matches = ac.find_matches_as_indexes(haystack)
    string_matches = ac.find_matches_as_strings(haystack)
    expected_index = haystack.find(pattern)
    if expected_index == -1:
        assert index_matches == []
        assert string_matches == []
    else:
        assert index_matches[0][1] == expected_index
        assert [haystack[s:e] for (_, s, e) in index_matches][0] == pattern
        assert string_matches[0] == pattern


@given(st.lists(st.binary(min_size=3), min_size=1, max_size=30_000))
def test_bytes_construction_extensive(patterns: list[bytes]) -> None:
    """/root/reference/tests/test_ac_bytes.py:133-146."""
    patterns = [b"%b_%i_" % (p, i) for (i, p) in enumerate(patterns)]
    ac = BytesAhoCorasick(patterns)
    for haystack in patterns:
        assert [
            haystack[s:e]
            for (_, s, e) in ac.find_matches_as_indexes(haystack)
        ] == [haystack]


@given(st.binary(), st.binary(min_size=1), st.binary(), IMPLS)
def test_random_bytes_extensive(
    prefix: bytes, pattern: bytes, suffix: bytes,
    implementation: Optional[Implementation],
) -> None:
    """/root/reference/tests/test_ac_bytes.py:149-161."""
    haystack = prefix + pattern + suffix
    ac = BytesAhoCorasick([pattern], implementation=implementation)
    index_matches = ac.find_matches_as_indexes(haystack)
    assert {i for (i, _, _) in index_matches} == {0}
    assert {haystack[s:e] for (_, s, e) in index_matches} == {pattern}


@given(st.binary(min_size=1), st.binary(), IMPLS)
def test_bytes_totally_random(
    pattern: bytes, haystack: bytes,
    implementation: Optional[Implementation],
) -> None:
    """First-match start equals ``bytes.find``
    (/root/reference/tests/test_ac_bytes.py:175-189)."""
    ac = BytesAhoCorasick([pattern], implementation=implementation)
    index_matches = ac.find_matches_as_indexes(haystack)
    expected_index = haystack.find(pattern)
    if expected_index == -1:
        assert index_matches == []
    else:
        assert index_matches[0][1] == expected_index
        assert [haystack[s:e] for (_, s, e) in index_matches][0] == pattern
