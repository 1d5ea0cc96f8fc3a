"""Cross-engine and cross-tier equivalence (SURVEY.md §4 gap plan).

All three table layouts (DFA / ContiguousNFA / NoncontiguousNFA) and all
execution tiers (python walk / numpy lanes / JAX device) must produce
identical output for every matchkind and for overlapping iteration.  The
reference never tests this directly; for the TPU build it is the core
correctness harness, since the tiers share semantics but not code paths.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from ahocorasick_rs_tpu import (
    AhoCorasick,
    BytesAhoCorasick,
    Implementation,
    MatchKind,
)

ENGINES = [
    Implementation.DFA,
    Implementation.ContiguousNFA,
    Implementation.NoncontiguousNFA,
]
KINDS = [MatchKind.Standard, MatchKind.LeftmostFirst, MatchKind.LeftmostLongest]


def _corpus(seed: int, n: int, alphabet: bytes) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.choice(alphabet) for _ in range(n))


def _patterns(seed: int, count: int, alphabet: bytes) -> list[bytes]:
    rng = random.Random(seed)
    pats = set()
    while len(pats) < count:
        k = rng.randint(1, 9)
        pats.add(bytes(rng.choice(alphabet) for _ in range(k)))
    return sorted(pats)


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_engines_and_tiers_agree_bytes(kind: MatchKind, seed: int) -> None:
    alphabet = b"abc"
    patterns = _patterns(seed, 25, alphabet)
    hay = _corpus(seed + 100, 20_000, alphabet)
    reference = BytesAhoCorasick(
        patterns, matchkind=kind, backend="python"
    ).find_matches_as_indexes(hay)
    assert reference  # dense alphabet ⇒ matches must exist
    for engine in ENGINES:
        for backend in ("numpy", "device"):
            ac = BytesAhoCorasick(
                patterns,
                matchkind=kind,
                implementation=engine,
                backend=backend,
            )
            got = ac.find_matches_as_indexes(hay)
            assert got == reference, (engine, backend)


@pytest.mark.parametrize("seed", [0, 1])
def test_engines_and_tiers_agree_overlapping(seed: int) -> None:
    alphabet = b"ab"
    patterns = _patterns(seed, 12, alphabet)
    hay = _corpus(seed + 7, 8_000, alphabet)
    reference = BytesAhoCorasick(
        patterns, backend="python"
    ).find_matches_as_indexes(hay, overlapping=True)
    assert len(reference) > 100
    for engine in ENGINES:
        for backend in ("numpy", "device"):
            ac = BytesAhoCorasick(
                patterns, implementation=engine, backend=backend
            )
            got = ac.find_matches_as_indexes(hay, overlapping=True)
            assert got == reference, (engine, backend)


@pytest.mark.parametrize("kind", KINDS)
def test_str_tiers_agree_unicode(kind: MatchKind) -> None:
    rng = random.Random(3)
    chars = "ab☃é🤦"
    hay = "".join(rng.choice(chars) for _ in range(6_000))
    patterns = sorted(
        {
            "".join(rng.choice(chars) for _ in range(rng.randint(1, 4)))
            for _ in range(15)
        }
    )
    reference = AhoCorasick(
        patterns, matchkind=kind, backend="python"
    ).find_matches_as_indexes(hay)
    assert reference
    for backend in ("numpy", "device"):
        got = AhoCorasick(
            patterns, matchkind=kind, backend=backend
        ).find_matches_as_indexes(hay)
        assert got == reference, backend


def test_device_segmenting_agrees() -> None:
    """Device tier streams large inputs through halo'd segments; forcing a
    tiny segment size must not change results."""
    from ahocorasick_rs_tpu.models.automaton import build_automaton
    from ahocorasick_rs_tpu.ops import resolve as R
    from ahocorasick_rs_tpu.ops.scan_host import scan_python
    from ahocorasick_rs_tpu.ops.scan_jax import DeviceTables, scan_device

    patterns = _patterns(11, 10, b"ab")
    am = build_automaton(patterns)
    hay_b = _corpus(12, 30_000, b"ab")
    hay = np.frombuffer(hay_b, dtype=np.uint8)
    tables = DeviceTables(am, "dfa")
    pos, st = scan_device(am, hay, tables, segment_bytes=4096)
    got = R.resolve(
        *R.expand_occurrences(am, pos, st), kind="standard", overlapping=True
    )
    p2, s2 = scan_python(am, hay_b)
    want = R.resolve(
        *R.expand_occurrences(am, p2, s2), kind="standard", overlapping=True
    )
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_stride2_matches_stride1(seed: int) -> None:
    """The stride-2 packed-pair scan must agree with the plain scan for
    odd/even haystack lengths and odd pattern lengths (halo rounding)."""
    from ahocorasick_rs_tpu.models.automaton import build_automaton
    from ahocorasick_rs_tpu.ops.scan_jax import DeviceTables, scan_device

    patterns = _patterns(seed, 15, b"abcd") + [b"x"]  # incl. len-1 pattern
    am = build_automaton(patterns)
    t2 = DeviceTables(am, "dfa")
    t1 = DeviceTables(am, "dfa", packed2_max_bytes=0)
    assert t2.ensure_packed2() and not t1.ensure_packed2()
    for n in (1, 2, 4095, 4096, 4097, 20_000):
        hay = np.frombuffer(
            _corpus(seed + n, n, b"abcdx"), dtype=np.uint8
        )
        p2, s2 = scan_device(am, hay, t2)
        p1, s1 = scan_device(am, hay, t1)
        assert np.array_equal(p1, p2), n
        assert np.array_equal(s1, s2), n


def test_auto_backend_consistency_across_sizes() -> None:
    """The auto dispatcher's tier boundaries must be seamless."""
    patterns = [b"ring", b"spring", b"ingspr"]
    for n in (0, 1, 100, 2048, 2049, 5000):
        hay = (b"springring" * (1 + n // 10))[:n]
        auto = BytesAhoCorasick(patterns).find_matches_as_indexes(hay)
        ref = BytesAhoCorasick(
            patterns, backend="python"
        ).find_matches_as_indexes(hay)
        assert auto == ref, n


def test_auto_router_measured_throughput_gate():
    """auto routes device-eligible scans to the measured-faster tier
    group, with a re-probe of the losing device tier every 8th eligible
    scan (adaptive routing; transfer-starved fabrics must not lock users
    onto a slower device path forever)."""
    from ahocorasick_rs_tpu import AhoCorasick

    ac = AhoCorasick(["needle", "pin"])
    ac._device_amortized = lambda n: True  # isolate the throughput gate

    # no measurements yet: explore the device tier
    assert ac._auto_device_ok(1 << 22)

    # device measured but host never sampled: without probe material the
    # next eligible scan samples the host tier itself
    ac._tier_bps = {"device": 1e9}
    assert not ac._auto_device_ok(1 << 22)

    # ... but when the haystack is available, the missing host sample is
    # collected by a BOUNDED probe slice (not by routing the whole
    # request to the host): the EMA fills and the comparison engages
    # immediately (advisor r4: no full-size host stall for one sample)
    ac._tier_bps = {"device": 1e12}  # faster than any host scan
    hay = np.frombuffer(b"x" * (1 << 20), dtype=np.uint8)
    assert ac._auto_device_ok(1 << 22, hay)  # device still faster
    assert "host" in ac._tier_bps

    # device measured 10x slower than host: host wins, except the probe.
    # The counter ticks once per scan in _find/_find_batch, so the gate
    # itself is read-only — both the Teddy gate and the dense gate of one
    # scan see the SAME decision (a probe scan can take the Teddy path).
    ac._tier_bps = {"host": 1e9, "device": 1e8}
    ac._probe_ctr = 0
    decisions = []
    for _ in range(16):
        ac._probe_ctr += 1  # the per-scan router tick
        first = ac._auto_device_ok(1 << 22)
        assert first == ac._auto_device_ok(1 << 22)  # stable within a scan
        decisions.append(first)
    assert decisions.count(True) == 2  # two probes in 16 scans
    assert decisions[7] and decisions[15]

    # device measured faster: always chosen
    ac._tier_bps = {"host": 1e8, "device": 1e9}
    assert all(ac._auto_device_ok(1 << 22) for _ in range(8))

    # within the 1.2x hysteresis band: device keeps the benefit of doubt
    ac._tier_bps = {"host": 1.1e9, "device": 1e9}
    assert all(ac._auto_device_ok(1 << 22) for _ in range(8))


def test_note_scan_records_tier_group_ema():
    from ahocorasick_rs_tpu import AhoCorasick
    from ahocorasick_rs_tpu.api import DEVICE_TIER_MIN

    ac = AhoCorasick(["needle"])
    ac._last_backend = "native"
    ac._note_scan(DEVICE_TIER_MIN, 1.0)
    assert ac._tier_bps["host"] == DEVICE_TIER_MIN
    ac._last_backend = "teddy"
    ac._note_scan(4 * DEVICE_TIER_MIN, 1.0)
    assert ac._tier_bps["device"] == 4 * DEVICE_TIER_MIN
    # EMA: second host sample averages in
    ac._last_backend = "native"
    ac._note_scan(3 * DEVICE_TIER_MIN, 1.0)
    assert ac._tier_bps["host"] == 2 * DEVICE_TIER_MIN
    # sub-device-tier scans are not comparable signals
    ac._last_backend = "python"
    ac._note_scan(100, 0.001)
    assert ac._tier_bps["host"] == 2 * DEVICE_TIER_MIN
    assert "tier_bytes_per_second" in ac.stats()
