# Typed public surface, mirroring the reference stub's coverage
# (/root/reference/pysrc/ahocorasick_rs/ahocorasick_rs.pyi:1-45) plus the
# TPU extras (batch methods, tune(), stats(), backend=/mesh= kwargs,
# save/load).  The implementation modules carry full inline annotations;
# this stub is the one-file contract for the package root.
from __future__ import annotations

import sys
from enum import Enum
from typing import Any, Iterable, Optional

from jax.sharding import Mesh

if sys.version_info >= (3, 12):
    from collections.abc import Buffer
else:
    from typing_extensions import Buffer

__version__: str

class Implementation(Enum):
    NoncontiguousNFA = ...
    ContiguousNFA = ...
    DFA = ...

class MatchKind(Enum):
    Standard = ...
    LeftmostFirst = ...
    LeftmostLongest = ...

MATCHKIND_STANDARD: MatchKind
MATCHKIND_LEFTMOST_FIRST: MatchKind
MATCHKIND_LEFTMOST_LONGEST: MatchKind

class AhoCorasick:
    def __init__(
        self,
        patterns: Iterable[str],
        matchkind: MatchKind = ...,
        store_patterns: Optional[bool] = ...,
        implementation: Optional[Implementation] = ...,
        *,
        backend: str = ...,
        mesh: Optional[Mesh] = ...,
    ) -> None: ...
    def find_matches_as_indexes(
        self, haystack: str, overlapping: bool = ...
    ) -> list[tuple[int, int, int]]: ...
    def find_matches_as_indexes_batch(
        self, haystacks: Iterable[str], overlapping: bool = ...
    ) -> list[list[tuple[int, int, int]]]: ...
    def find_matches_as_strings(
        self, haystack: str, overlapping: bool = ...
    ) -> list[str]: ...
    def find_matches_as_strings_batch(
        self, haystacks: Iterable[str], overlapping: bool = ...
    ) -> list[list[str]]: ...
    def tune(self, sample: str | Buffer) -> dict[str, Any]: ...
    def stats(self) -> dict[str, Any]: ...

class BytesAhoCorasick:
    def __init__(
        self,
        patterns: Iterable[Buffer],
        matchkind: MatchKind = ...,
        implementation: Optional[Implementation] = ...,
        *,
        backend: str = ...,
        mesh: Optional[Mesh] = ...,
    ) -> None: ...
    def find_matches_as_indexes(
        self, haystack: Buffer, overlapping: bool = ...
    ) -> list[tuple[int, int, int]]: ...
    def find_matches_as_indexes_batch(
        self, haystacks: Iterable[Buffer], overlapping: bool = ...
    ) -> list[list[tuple[int, int, int]]]: ...
    def tune(self, sample: str | Buffer) -> dict[str, Any]: ...
    def stats(self) -> dict[str, Any]: ...

def save_matcher(
    path: str, matcher: AhoCorasick | BytesAhoCorasick
) -> None: ...
def load_matcher(path: str) -> AhoCorasick | BytesAhoCorasick: ...

__all__ = [
    "AhoCorasick",
    "BytesAhoCorasick",
    "MatchKind",
    "Implementation",
    "save_matcher",
    "load_matcher",
    "MATCHKIND_STANDARD",
    "MATCHKIND_LEFTMOST_FIRST",
    "MATCHKIND_LEFTMOST_LONGEST",
]
