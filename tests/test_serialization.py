"""Save/load round-trips for compiled automatons and matchers."""

from __future__ import annotations

import numpy as np
import pytest

from ahocorasick_rs_tpu import AhoCorasick, BytesAhoCorasick, MatchKind
from ahocorasick_rs_tpu.models.automaton import build_automaton
from ahocorasick_rs_tpu.utils.serialization import (
    load_automaton,
    load_matcher,
    save_automaton,
    save_matcher,
)


def test_automaton_roundtrip(tmp_path) -> None:
    am = build_automaton([b"hello", b"world", b"lo wo"])
    path = str(tmp_path / "am.npz")
    save_automaton(path, am)
    am2 = load_automaton(path)
    assert am2.num_states == am.num_states
    assert np.array_equal(am2.edge_keys, am.edge_keys)
    assert np.array_equal(am2.fail, am.fail)
    assert np.array_equal(am2.match_pids, am.match_pids)
    assert np.array_equal(am2.delta, am.delta)
    assert am2.max_len == am.max_len


def test_matcher_roundtrip_str(tmp_path) -> None:
    patterns = ["winter", "disco", "discontent"]
    ac = AhoCorasick(patterns, matchkind=MatchKind.LeftmostLongest)
    path = str(tmp_path / "m.npz")
    save_matcher(path, ac)
    ac2 = load_matcher(path)
    hay = "the winter of my discontent"
    assert ac2.find_matches_as_indexes(hay) == ac.find_matches_as_indexes(hay)
    assert ac2.find_matches_as_strings(hay) == ac.find_matches_as_strings(hay)
    with pytest.raises(ValueError):
        ac2.find_matches_as_indexes(hay, overlapping=True)


def test_matcher_roundtrip_bytes(tmp_path) -> None:
    b = BytesAhoCorasick([b"ab", b"bc", b"abcd"])
    path = str(tmp_path / "b.npz")
    save_matcher(path, b)
    b2 = load_matcher(path)
    hay = b"xxabcdxx"
    assert b2.find_matches_as_indexes(hay) == b.find_matches_as_indexes(hay)
    assert b2.find_matches_as_indexes(
        hay, overlapping=True
    ) == b.find_matches_as_indexes(hay, overlapping=True)


def test_matcher_roundtrip_keeps_patterns(tmp_path) -> None:
    """Byte patterns persist for BOTH classes (non-UTF-8 bytes included), so
    a loaded matcher can still compile its Teddy prefilter — performance
    identity, not just behavioral identity."""
    raw = [b"\xff\xfe", b"ab\x00cd", b"hello"]
    b = BytesAhoCorasick(raw)
    path = str(tmp_path / "p.npz")
    save_matcher(path, b)
    b2 = load_matcher(path)
    assert b2._byte_patterns == raw
    assert b2._teddy_state == "auto"

    # str matcher with store_patterns=False still keeps byte patterns
    ac = AhoCorasick(["alpha", "beta"], store_patterns=False)
    path2 = str(tmp_path / "p2.npz")
    save_matcher(path2, ac)
    ac2 = load_matcher(path2)
    assert ac2._patterns is None  # store_patterns choice preserved
    assert ac2._byte_patterns == [b"alpha", b"beta"]
    assert ac2.find_matches_as_strings("a beta alpha") == ["beta", "alpha"]


def test_version_check(tmp_path) -> None:
    am = build_automaton([b"x"])
    path = str(tmp_path / "v.npz")
    save_automaton(path, am)
    data = dict(np.load(path))
    data["__format__"] = np.int64(99)
    np.savez(path, **data)
    with pytest.raises(ValueError):
        load_automaton(path)


def test_matcher_version_checks(tmp_path) -> None:
    """Unknown matcher versions are rejected; a v1 file without pattern
    data gets a clear re-save message instead of a KeyError (ADVICE r2)."""
    ac = AhoCorasick(["ab"])
    path = str(tmp_path / "m.npz")
    save_matcher(path, ac)
    data = dict(np.load(path))
    assert int(data["__format__"]) == 2

    bad = dict(data)
    bad["__format__"] = np.int64(99)
    np.savez(path, **bad)
    with pytest.raises(ValueError, match="version 99"):
        load_matcher(path)

    v1 = dict(data)
    v1["__format__"] = np.int64(1)
    del v1["pattern_blob"]
    np.savez(path, **v1)
    with pytest.raises(ValueError, match="re-save"):
        load_matcher(path)


def test_tuned_prefilter_config_roundtrips(tmp_path) -> None:
    """A tuned (m, words, passes) choice survives save/load — the loaded
    matcher rebuilds the same prefilter instead of the auto heuristic."""
    from ahocorasick_rs_tpu import AhoCorasick
    from ahocorasick_rs_tpu.utils.serialization import (
        load_matcher,
        save_matcher,
    )

    ac = AhoCorasick(["hello", "world", "zebra", "quartz"])
    ac._pf_config = {"m": 4, "words": 1, "passes": 1}  # as tune() would set
    path = str(tmp_path / "m.npz")
    save_matcher(path, ac)
    loaded = load_matcher(path)
    assert loaded._pf_config == {"m": 4, "words": 1, "passes": 1}
    loaded._teddy_state = "force"
    teddy = loaded._get_teddy()
    assert (teddy.m, teddy.words, teddy.passes) == (4, 1, 1)
    got = loaded.find_matches_as_indexes("say hello to the zebra world")
    assert got == ac.find_matches_as_indexes("say hello to the zebra world")
