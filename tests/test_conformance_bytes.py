"""Conformance: ``BytesAhoCorasick`` observable semantics.

Golden expectations from /root/reference/tests/test_ac_bytes.py and the
reference README's bytes section (/root/reference/README.md:63-82).
"""

from __future__ import annotations

import pytest

from ahocorasick_rs_tpu import (
    MATCHKIND_LEFTMOST_FIRST,
    MATCHKIND_LEFTMOST_LONGEST,
    MATCHKIND_STANDARD,
    BytesAhoCorasick,
    Implementation,
    MatchKind,
)

IMPLEMENTATIONS = [
    None,
    Implementation.NoncontiguousNFA,
    Implementation.ContiguousNFA,
    Implementation.DFA,
]

WINTER = b"This is the winter of my discontent"
WINTER_PATTERNS = [b"content", b"disco", b"disc", b"discontent", b"winter"]


def _strings(ac: BytesAhoCorasick, haystack=WINTER) -> list[bytes]:
    return [haystack[s:e] for (_, s, e) in ac.find_matches_as_indexes(haystack)]


@pytest.mark.parametrize("implementation", IMPLEMENTATIONS)
def test_basic_matching(implementation) -> None:
    """/root/reference/tests/test_ac_bytes.py:22-44."""
    haystack = b"hello, world, hello again"
    patterns = [b"hello", b"world"]
    ac = BytesAhoCorasick(patterns, implementation=implementation)
    expected = [b"hello", b"world", b"hello"]
    index_matches = ac.find_matches_as_indexes(haystack)
    assert [patterns[i] for (i, _, _) in index_matches] == expected
    assert [haystack[s:e] for (_, s, e) in index_matches] == expected


def test_readme_bytes_quickstart() -> None:
    """/root/reference/README.md:70-80."""
    ac = BytesAhoCorasick([b"hello", b"world"])
    assert ac.find_matches_as_indexes(b"hello world") == [
        (0, 0, 5),
        (1, 6, 11),
    ]


@pytest.mark.parametrize("implementation", IMPLEMENTATIONS)
def test_buffer_pattern_types(implementation) -> None:
    """memoryview/bytearray patterns
    (/root/reference/tests/test_ac_bytes.py:47-71)."""
    haystack = b"hello, world, hello again"
    patterns = [memoryview(b"hello"), bytearray(b"world")]
    ac = BytesAhoCorasick(patterns, implementation=implementation)
    expected = [b"hello", b"world", b"hello"]
    index_matches = ac.find_matches_as_indexes(haystack)
    assert [haystack[s:e] for (_, s, e) in index_matches] == expected


@pytest.mark.parametrize("implementation", IMPLEMENTATIONS)
@pytest.mark.parametrize("haystack_type", [bytes, bytearray, memoryview])
def test_buffer_haystack_types(implementation, haystack_type) -> None:
    """bytes/bytearray/memoryview haystacks
    (/root/reference/tests/test_ac_bytes.py:74-100)."""
    haystack = haystack_type(b"hello, world, hello again")
    ac = BytesAhoCorasick(
        [b"hello", b"world"], implementation=implementation
    )
    index_matches = ac.find_matches_as_indexes(haystack)
    ref = bytes(haystack)
    assert [ref[s:e] for (_, s, e) in index_matches] == [
        b"hello",
        b"world",
        b"hello",
    ]


def test_iterator_of_patterns() -> None:
    """/root/reference/tests/test_ac_bytes.py:103-115."""
    ac = BytesAhoCorasick(iter([b"hello", b"world"]))
    haystack = b"hello, world, hello again"
    assert [
        haystack[s:e] for (_, s, e) in ac.find_matches_as_indexes(haystack)
    ] == [b"hello", b"world", b"hello"]


def test_bad_iterators() -> None:
    """TypeErrors incl. str-not-a-buffer
    (/root/reference/tests/test_ac_bytes.py:118-130)."""
    with pytest.raises(TypeError):
        BytesAhoCorasick(None)  # type: ignore[arg-type]
    with pytest.raises(TypeError):
        BytesAhoCorasick([b"x", 12])  # type: ignore[list-item]
    with pytest.raises(TypeError):
        BytesAhoCorasick([b"x", "y"])  # type: ignore[list-item]


def test_str_haystack_rejected() -> None:
    """str doesn't implement the buffer protocol."""
    ac = BytesAhoCorasick([b"x"])
    with pytest.raises(TypeError):
        ac.find_matches_as_indexes("xx")  # type: ignore[arg-type]


def test_multidimensional_buffer_rejected() -> None:
    """Exact error messages of the reference's buffer adapter
    (/root/reference/src/lib.rs:288-298)."""
    import numpy as np

    ac = BytesAhoCorasick([b"x"])
    with pytest.raises(TypeError) as e:
        ac.find_matches_as_indexes(np.zeros((2, 2), dtype=np.uint8))
    assert "Only one-dimensional sequences are supported" in str(e.value)
    with pytest.raises(TypeError) as e:
        ac.find_matches_as_indexes(
            np.zeros(16, dtype=np.uint8)[::2]
        )
    assert "Must be a contiguous sequence of bytes" in str(e.value)


@pytest.mark.parametrize(
    "bad_patterns", [[b""], [b"", b"xx"], [b"xx", b""]]
)
def test_empty_patterns_are_not_legal(bad_patterns) -> None:
    """Exact bytes-side ValueError message
    (/root/reference/tests/test_ac_bytes.py:164-172,
    /root/reference/src/lib.rs:387-389)."""
    with pytest.raises(ValueError) as e:
        BytesAhoCorasick(bad_patterns)
    assert "You passed in an empty pattern" in str(e.value)


@pytest.mark.parametrize(
    ("matchkind", "expected"),
    [
        (None, [b"winter", b"disc"]),
        (MATCHKIND_STANDARD, [b"winter", b"disc"]),
        (MatchKind.Standard, [b"winter", b"disc"]),
        (MATCHKIND_LEFTMOST_FIRST, [b"winter", b"disco"]),
        (MatchKind.LeftmostFirst, [b"winter", b"disco"]),
        (MATCHKIND_LEFTMOST_LONGEST, [b"winter", b"discontent"]),
        (MatchKind.LeftmostLongest, [b"winter", b"discontent"]),
    ],
)
def test_matchkind(matchkind, expected) -> None:
    """/root/reference/tests/test_ac_bytes.py:192-252."""
    if matchkind is None:
        ac = BytesAhoCorasick(WINTER_PATTERNS)
    else:
        ac = BytesAhoCorasick(WINTER_PATTERNS, matchkind=matchkind)
    assert _strings(ac) == expected


def test_overlapping() -> None:
    """/root/reference/tests/test_ac_bytes.py:255-295."""
    ac = BytesAhoCorasick(WINTER_PATTERNS)
    assert ac.find_matches_as_indexes(WINTER) == ac.find_matches_as_indexes(
        WINTER, overlapping=False
    )
    expected = [b"winter", b"disc", b"disco", b"discontent", b"content"]
    got = [
        WINTER[s:e]
        for (_, s, e) in ac.find_matches_as_indexes(WINTER, overlapping=True)
    ]
    assert got == expected
    for kind in (MatchKind.LeftmostFirst, MatchKind.LeftmostLongest):
        ac_bad = BytesAhoCorasick(WINTER_PATTERNS, matchkind=kind)
        with pytest.raises(
            ValueError,
            match=(
                "overlapping searches require a searcher with Standard "
                f"semantics, but this searcher has {kind.name} semantics"
            ),
        ):
            ac_bad.find_matches_as_indexes(WINTER, overlapping=True)


def test_no_find_matches_as_strings() -> None:
    """BytesAhoCorasick has no string API (/root/reference/README.md:82)."""
    ac = BytesAhoCorasick([b"x"])
    assert not hasattr(ac, "find_matches_as_strings")
