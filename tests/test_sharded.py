"""Single-chip vs sharded-mesh equivalence (SURVEY.md §4 gap plan).

Runs the data-parallel sharded scan on an 8-device virtual CPU mesh (see
``conftest.py``) and checks bit-exact agreement with the sequential host
walk, including matches that straddle shard boundaries (caught by the lane
halos, attributed to the owning shard, never duplicated).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

import jax

from ahocorasick_rs_tpu.models.automaton import build_automaton
from ahocorasick_rs_tpu.ops import resolve as R
from ahocorasick_rs_tpu.ops.scan_host import scan_python
from ahocorasick_rs_tpu.ops.scan_jax import DeviceTables
from ahocorasick_rs_tpu.parallel.sharded import make_mesh, scan_sharded


def _check(patterns: list[bytes], hay: bytes, engine: str = "dfa",
           lanes_per_device: int = 8) -> None:
    am = build_automaton(patterns)
    tables = DeviceTables(am, engine)
    mesh = make_mesh()
    pos, st = scan_sharded(
        am,
        np.frombuffer(hay, dtype=np.uint8),
        tables,
        mesh,
        lanes_per_device=lanes_per_device,
    )
    got = R.resolve(
        *R.expand_occurrences(am, pos, st), kind="standard", overlapping=True
    )
    p2, s2 = scan_python(am, hay)
    want = R.resolve(
        *R.expand_occurrences(am, p2, s2), kind="standard", overlapping=True
    )
    assert got == want


def test_mesh_has_8_devices() -> None:
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("engine", ["dfa", "classed"])
def test_sharded_equals_sequential_random(engine: str) -> None:
    rng = random.Random(5)
    patterns = list(
        {
            bytes(rng.choice(b"ab") for _ in range(rng.randint(1, 7)))
            for _ in range(12)
        }
    )
    hay = bytes(rng.choice(b"ab") for _ in range(50_000))
    _check(patterns, hay, engine)


def test_boundary_straddling_matches() -> None:
    """A long pattern crossing every shard boundary must be found once."""
    pattern = b"abcdefghij"
    # lanes_per_device=2, 8 devices ⇒ 16 lanes; craft a haystack where the
    # pattern sits across each lane boundary of width n/16.
    n = 16 * 64
    hay = bytearray(b"." * n)
    for lane in range(1, 16):
        off = lane * 64 - 5
        hay[off : off + len(pattern)] = pattern
    _check([pattern], bytes(hay), lanes_per_device=2)


def test_sharded_empty_and_tiny() -> None:
    _check([b"xy"], b"")
    _check([b"xy"], b"x")
    _check([b"xy"], b"xy")


# ---------------------------------------------------------------------------
# Public-API routing: AhoCorasick(..., mesh=...) / backend="sharded"
# (SURVEY.md §5 config row: TPU extras as keyword-only args).
# ---------------------------------------------------------------------------

from ahocorasick_rs_tpu import (  # noqa: E402
    AhoCorasick,
    BytesAhoCorasick,
    MatchKind,
)

_PATTERNS = ["content", "disco", "disc", "discontent", "winter", "lo wo"]


def _corpus(n: int = 30_000) -> str:
    rng = random.Random(17)
    parts = []
    while sum(map(len, parts)) < n:
        parts.append(
            rng.choice(
                [
                    "the winter of my discontent ",
                    "hello world ",
                    "disco disco ",
                    "filler text with no hits ",
                ]
            )
        )
    return "".join(parts)


@pytest.mark.parametrize(
    "kind",
    [MatchKind.Standard, MatchKind.LeftmostFirst, MatchKind.LeftmostLongest],
)
def test_public_api_sharded_all_kinds(kind: MatchKind) -> None:
    hay = _corpus()
    mesh = make_mesh()
    ac = AhoCorasick(_PATTERNS, matchkind=kind, backend="sharded", mesh=mesh)
    ref = AhoCorasick(_PATTERNS, matchkind=kind, backend="python")
    assert ac.find_matches_as_indexes(hay) == ref.find_matches_as_indexes(hay)


def test_public_api_sharded_overlapping() -> None:
    hay = _corpus()
    ac = AhoCorasick(_PATTERNS, backend="sharded", mesh=make_mesh())
    ref = AhoCorasick(_PATTERNS, backend="python")
    assert ac.find_matches_as_indexes(
        hay, overlapping=True
    ) == ref.find_matches_as_indexes(hay, overlapping=True)


def test_public_api_sharded_defaults_mesh() -> None:
    """backend="sharded" without a mesh builds one over all devices."""
    hay = _corpus(5_000)
    ac = AhoCorasick(_PATTERNS, backend="sharded")
    ref = AhoCorasick(_PATTERNS, backend="python")
    assert ac.find_matches_as_indexes(hay) == ref.find_matches_as_indexes(hay)
    assert ac._mesh is not None and ac._mesh.devices.size == 8


def test_public_api_sharded_bytes() -> None:
    hay = _corpus().encode()
    pats = [p.encode() for p in _PATTERNS]
    ac = BytesAhoCorasick(pats, backend="sharded", mesh=make_mesh())
    ref = BytesAhoCorasick(pats, backend="python")
    assert ac.find_matches_as_indexes(hay) == ref.find_matches_as_indexes(hay)


# ---------------------------------------------------------------------------
# Prefiltered (Teddy) sharded pipeline: fire+verify per shard, right-halo
# ppermute for boundary windows, start-position ownership.
# ---------------------------------------------------------------------------


def _teddy_sharded_check(patterns, hay, kind=MatchKind.Standard,
                         overlapping=False):
    ac = AhoCorasick(patterns, matchkind=kind, mesh=make_mesh())
    ac._teddy_state = "force"  # CPU mesh: bypass the tpu-backend gate
    ref = AhoCorasick(patterns, matchkind=kind, backend="python")
    got = ac.find_matches_as_indexes(hay, overlapping=overlapping)
    want = ref.find_matches_as_indexes(hay, overlapping=overlapping)
    assert got == want
    assert ac.stats()["last_backend"] == "teddy_sharded"


@pytest.mark.parametrize(
    "kind",
    [MatchKind.Standard, MatchKind.LeftmostFirst, MatchKind.LeftmostLongest],
)
def test_teddy_sharded_all_kinds(kind: MatchKind) -> None:
    _teddy_sharded_check(_PATTERNS, _corpus(40_000), kind=kind)


def test_teddy_sharded_overlapping() -> None:
    _teddy_sharded_check(_PATTERNS, _corpus(40_000), overlapping=True)


def test_teddy_sharded_boundary_straddle() -> None:
    """Matches spanning shard boundaries: fired by the force-fire zone of
    the owning shard's last block, verified through the right halo."""
    pattern = "abcdefghijklmnop"  # 16 bytes: crosses any 16B group
    n = 8 * 8 * 128  # 8 devices x 8 rows x 128 = one row block each
    hay = ["."] * n
    shard = n // 8
    text = list("." * n)
    for d in range(1, 8):
        off = d * shard - 7  # straddles the shard boundary
        text[off : off + len(pattern)] = pattern
    _teddy_sharded_check([pattern], "".join(text))


def test_teddy_sharded_pattern_longer_than_shard() -> None:
    """A pattern longer than n/n_dev bytes: the shard size must grow to at
    least the halo length or boundary-spanning matches are unfindable
    (regression: the right-halo slice clamped to the shard length)."""
    import random as _r

    rng = _r.Random(3)
    pattern = "".join(rng.choice("ab") for _ in range(3000))
    text = list("." * 8192)
    text[1548 : 1548 + len(pattern)] = pattern  # spans several 1KB shards
    _teddy_sharded_check([pattern], "".join(text))


def test_public_api_mesh_auto_routes_small_to_host() -> None:
    """mesh= with a tiny haystack stays on the low-latency host tiers."""
    ac = AhoCorasick(_PATTERNS, mesh=make_mesh())
    assert ac.find_matches_as_indexes("the winter of my discontent") == [
        (4, 4, 10),
        (2, 17, 21),
    ]
