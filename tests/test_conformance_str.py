"""Conformance: ``AhoCorasick`` (str) observable semantics.

Every expectation here is a golden output of the reference implementation;
source locations are cited per case (SURVEY.md §3.6 is the contract).
"""

from __future__ import annotations

from typing import Optional

import pytest

from ahocorasick_rs_tpu import (
    MATCHKIND_LEFTMOST_FIRST,
    MATCHKIND_LEFTMOST_LONGEST,
    MATCHKIND_STANDARD,
    AhoCorasick,
    Implementation,
    MatchKind,
)

IMPLEMENTATIONS = [
    None,
    Implementation.NoncontiguousNFA,
    Implementation.ContiguousNFA,
    Implementation.DFA,
]

# The reference README's quickstart and matchkind walkthrough, plus the
# golden matchkind/overlapping cases of /root/reference/tests/test_ac.py.
WINTER_HAYSTACK = "This is the winter of my discontent"
WINTER_PATTERNS = ["content", "disco", "disc", "discontent", "winter"]

MATCHKIND_GOLDEN = [
    # (matchkind, expected) — /root/reference/tests/test_ac.py:196-248
    (None, ["winter", "disc"]),
    (MATCHKIND_STANDARD, ["winter", "disc"]),
    (MatchKind.Standard, ["winter", "disc"]),
    (MATCHKIND_LEFTMOST_FIRST, ["winter", "disco"]),
    (MatchKind.LeftmostFirst, ["winter", "disco"]),
    (MATCHKIND_LEFTMOST_LONGEST, ["winter", "discontent"]),
    (MatchKind.LeftmostLongest, ["winter", "discontent"]),
]


@pytest.mark.parametrize("store_patterns", [True, False, None])
@pytest.mark.parametrize("implementation", IMPLEMENTATIONS)
def test_basic_matching(store_patterns: Optional[bool],
                        implementation) -> None:
    """README quickstart semantics (/root/reference/tests/test_ac.py:22-56)."""
    haystack = "hello, world, hello again"
    patterns = ["hello", "world"]
    kwargs = {} if store_patterns is None else {
        "store_patterns": store_patterns,
        "implementation": implementation,
    }
    ac = AhoCorasick(patterns, **kwargs)
    expected = ["hello", "world", "hello"]
    index_matches = ac.find_matches_as_indexes(haystack)
    assert [patterns[i] for (i, _, _) in index_matches] == expected
    assert [haystack[s:e] for (_, s, e) in index_matches] == expected
    assert ac.find_matches_as_strings(haystack) == expected


def test_quickstart_indexes() -> None:
    """Exact README quickstart tuples (/root/reference/README.md:41-54)."""
    ac = AhoCorasick(["hello", "world", "fish"])
    got = ac.find_matches_as_indexes("this is my first hello world. hello!")
    assert got == [(0, 17, 22), (1, 23, 28), (0, 30, 35)]


@pytest.mark.parametrize("store_patterns", [True, False, None])
def test_iterator_of_patterns(store_patterns: Optional[bool]) -> None:
    """Generators/iterators accepted (/root/reference/tests/test_ac.py:59-72)."""
    kwargs = {} if store_patterns is None else {
        "store_patterns": store_patterns
    }
    ac = AhoCorasick(iter(["hello", "world"]), **kwargs)
    assert ac.find_matches_as_strings("hello, world, hello again") == [
        "hello",
        "world",
        "hello",
    ]
    gen = AhoCorasick(p.lower() for p in ["HELLO", "WORLD"])
    assert gen.find_matches_as_strings("say hello") == ["hello"]


def test_bad_iterators() -> None:
    """TypeError pass-through (/root/reference/tests/test_ac.py:75-83).

    The non-str item raises PyO3's downcast TypeError text
    (/root/reference/src/lib.rs:149) — pinned here; the CI differential
    job re-checks the string against the real binary."""
    with pytest.raises(TypeError):
        AhoCorasick(None)  # type: ignore[arg-type]
    with pytest.raises(
        TypeError,
        match="'int' object cannot be converted to 'PyString'",
    ):
        AhoCorasick(["x", 12])  # type: ignore[list-item]


@pytest.mark.parametrize("store_patterns", [True, False, None])
@pytest.mark.parametrize("implementation", IMPLEMENTATIONS)
def test_unicode(store_patterns: Optional[bool], implementation) -> None:
    """Code-point indexes on non-ASCII text
    (/root/reference/tests/test_ac.py:103-132)."""
    haystack = "hello, world ☃fishá l🤦l"
    patterns = ["d ☃f", "há", "l🤦l"]
    kwargs = {} if store_patterns is None else {
        "store_patterns": store_patterns,
        "implementation": implementation,
    }
    ac = AhoCorasick(patterns, **kwargs)
    index_matches = ac.find_matches_as_indexes(haystack)
    assert [patterns[i] for (i, _, _) in index_matches] == patterns
    assert [haystack[s:e] for (_, s, e) in index_matches] == patterns
    assert ac.find_matches_as_strings(haystack) == patterns


@pytest.mark.parametrize(
    "bad_patterns", [[""], ["", "xx"], ["xx", ""]]
)
@pytest.mark.parametrize("store_patterns", [True, False])
def test_empty_patterns_are_not_legal(
    bad_patterns: list[str], store_patterns: bool
) -> None:
    """Exact ValueError message (/root/reference/tests/test_ac.py:157-168,
    message at /root/reference/src/lib.rs:205-207)."""
    with pytest.raises(ValueError) as e:
        AhoCorasick(bad_patterns, store_patterns=store_patterns)
    assert "You passed in an empty string as a pattern" in str(e.value)


@pytest.mark.parametrize(("matchkind", "expected"), MATCHKIND_GOLDEN)
def test_matchkind(matchkind, expected: list[str]) -> None:
    """Golden matchkind outputs (/root/reference/tests/test_ac.py:196-248)."""
    if matchkind is None:
        ac = AhoCorasick(WINTER_PATTERNS)
    else:
        ac = AhoCorasick(WINTER_PATTERNS, matchkind=matchkind)
    assert ac.find_matches_as_strings(WINTER_HAYSTACK) == expected


def test_standard_restart_after_match() -> None:
    """Standard restarts at the match end
    (/root/reference/README.md:106-118)."""
    assert AhoCorasick(["b", "abcd"]).find_matches_as_strings("abcdef") == [
        "b"
    ]
    assert AhoCorasick(
        ["disco", "disc", "discontent"]
    ).find_matches_as_strings("discontent") == ["disc"]


def test_leftmost_first_pattern_order_sensitivity() -> None:
    """Pattern-list order decides ties (/root/reference/README.md:126-140)."""
    assert AhoCorasick(
        ["disco", "disc"], matchkind=MatchKind.LeftmostFirst
    ).find_matches_as_strings("discontent") == ["disco"]
    assert AhoCorasick(
        ["disc", "disco"], matchkind=MatchKind.LeftmostFirst
    ).find_matches_as_strings("discontent") == ["disc"]
    assert AhoCorasick(
        ["b", "abcd"], matchkind=MatchKind.LeftmostFirst
    ).find_matches_as_strings("abcdef") == ["abcd"]


@pytest.mark.parametrize(
    "matchkind", [None, MATCHKIND_STANDARD, MatchKind.Standard]
)
def test_overlapping(matchkind) -> None:
    """Overlapping emission and its ordering
    (/root/reference/tests/test_ac.py:251-292): same-end ties are ordered
    longest-first ('discontent' before 'content'), not pattern-list order."""
    ac = (
        AhoCorasick(WINTER_PATTERNS)
        if matchkind is None
        else AhoCorasick(WINTER_PATTERNS, matchkind=matchkind)
    )
    # overlapping=False is the default
    assert ac.find_matches_as_strings(
        WINTER_HAYSTACK
    ) == ac.find_matches_as_strings(WINTER_HAYSTACK, overlapping=False)
    assert ac.find_matches_as_indexes(
        WINTER_HAYSTACK
    ) == ac.find_matches_as_indexes(WINTER_HAYSTACK, overlapping=False)
    expected = ["winter", "disc", "disco", "discontent", "content"]
    result = ac.find_matches_as_strings(WINTER_HAYSTACK, overlapping=True)
    result_indexes = ac.find_matches_as_indexes(
        WINTER_HAYSTACK, overlapping=True
    )
    assert result == expected
    assert [WINTER_PATTERNS[i] for (i, _, _) in result_indexes] == expected
    assert [WINTER_HAYSTACK[s:e] for (_, s, e) in result_indexes] == expected


def test_overlapping_readme_example() -> None:
    """/root/reference/README.md:156-162."""
    ac = AhoCorasick(["winter", "onte", "disco", "discontent"])
    assert ac.find_matches_as_strings("discontent", overlapping=True) == [
        "disco",
        "onte",
        "discontent",
    ]


@pytest.mark.parametrize(
    "matchkind", [MatchKind.LeftmostFirst, MatchKind.LeftmostLongest]
)
def test_overlapping_requires_standard(matchkind) -> None:
    """ValueError for overlapping + leftmost kinds
    (/root/reference/tests/test_ac.py:271-275,291-292), with the crate's
    MatchError text the reference surfaces verbatim
    (/root/reference/src/lib.rs:36-39,50-55) — the CI differential job
    re-checks this string against the real binary."""
    expected = (
        "overlapping searches require a searcher with Standard "
        f"semantics, but this searcher has {matchkind.name} semantics"
    )
    ac = AhoCorasick(WINTER_PATTERNS, matchkind=matchkind)
    with pytest.raises(ValueError, match=expected):
        ac.find_matches_as_strings(WINTER_HAYSTACK, overlapping=True)
    with pytest.raises(ValueError, match=expected):
        ac.find_matches_as_indexes(WINTER_HAYSTACK, overlapping=True)


def test_store_patterns_identity() -> None:
    """store_patterns=True returns the original string objects (the
    reference clone_refs them, /root/reference/src/lib.rs:263-266)."""
    patterns = ["hello", "world"]
    ac = AhoCorasick(patterns, store_patterns=True)
    got = ac.find_matches_as_strings("say hello world")
    assert got[0] is patterns[0]
    assert got[1] is patterns[1]
    # store_patterns=False gives equal values
    ac2 = AhoCorasick(patterns, store_patterns=False)
    assert ac2.find_matches_as_strings("say hello world") == patterns


def test_empty_haystack_and_no_patterns() -> None:
    """Degenerate inputs produce empty results, not errors."""
    ac = AhoCorasick(["x"])
    assert ac.find_matches_as_indexes("") == []
    assert ac.find_matches_as_strings("") == []
    ac_none = AhoCorasick([])
    assert ac_none.find_matches_as_indexes("anything") == []
