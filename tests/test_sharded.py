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
