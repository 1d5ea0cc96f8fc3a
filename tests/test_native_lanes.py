"""Interleaved-lane native scanners: bit-exactness vs the serial walk.

The lanes scanners (native/ac_builder.cpp ``ac_scan_*_lanes``) split the
haystack into 8 segments per thread, warm each from the root over a
``max_len - 1`` halo (the framework's standard exactness argument), and
step all automata in one interleaved loop to overlap the dependent table
fetches.  The contract under test: output identical to the serial
scanners for every corpus shape, including matches straddling lane and
thread boundaries and skewed match density (per-lane slice overflow).
"""

from __future__ import annotations

import numpy as np
import pytest

from ahocorasick_rs_tpu.models import native
from ahocorasick_rs_tpu.models.automaton import build_automaton

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)

PATS = [b"needle", b"pin", b"nee", b"edl", b"xyzzy", b"aaaa"]


def _scan_pair(am, hay, classes=None, threads=2):
    """(serial, lanes) match arrays for the same haystack."""
    if classes is None:
        delta = am.delta
        p1, s1 = native.scan_dense_native(delta, am.match_count, hay)
    else:
        delta = am.delta_classed
        p1, s1 = native.scan_dense_native(
            delta, am.match_count, hay, classes=classes
        )
    sc = native.DenseScanner(
        delta, am.match_count, classes=classes, halo=am.max_len - 1
    )
    sc._threads = threads
    sc.LANES_MIN_BYTES = 0  # force the lanes path regardless of size
    sc.THREADS_MIN_BYTES = 0  # and the multi-thread orchestration
    p2, s2 = sc.scan(hay)
    return (p1, s1), (p2, s2)


@pytest.mark.parametrize("threads", [1, 2, 3])
@pytest.mark.parametrize("use_classes", [False, True])
def test_lanes_equals_serial_random(threads, use_classes):
    rng = np.random.default_rng(11)
    am = build_automaton(PATS)
    n = 1 << 18
    hay = rng.integers(97, 123, n, dtype=np.uint8).astype(np.uint8)
    # plant matches everywhere, incl. at every lane boundary for both
    # thread counts (lane starts are multiples of n / (threads*8))
    for T in (1, 2, 3):
        seg = (n // T) // 8
        for b in range(max(seg, 3), n - 8, max(seg, 1)):
            hay[b - 3 : b + 3] = np.frombuffer(b"needle", np.uint8)
    classes = am.byte_classes if use_classes else None
    (p1, s1), (p2, s2) = _scan_pair(am, hay, classes, threads)
    assert np.array_equal(p1, p2)
    assert np.array_equal(s1, s2)
    assert len(p1) > 0


def test_lanes_skewed_density_overflow_retry():
    """All matches packed into one lane's range: its slice overflows and
    the retry must still produce the exact serial output."""
    am = build_automaton(PATS)
    n = 1 << 17
    hay = np.full(n, ord("z"), dtype=np.uint8)
    # dense aaaa runs inside the first 1/16th only
    k = n // 16
    hay[:k] = ord("a")
    (p1, s1), (p2, s2) = _scan_pair(am, hay)
    assert np.array_equal(p1, p2)
    assert np.array_equal(s1, s2)
    assert len(p1) == k - 3  # 'aaaa' at every position


def test_lanes_small_input_falls_back():
    am = build_automaton(PATS)
    hay = np.frombuffer(b"a pin in a needle stack", np.uint8)
    (p1, s1), (p2, s2) = _scan_pair(am, hay)
    assert np.array_equal(p1, p2)
    assert np.array_equal(s1, s2)


def test_public_api_uses_lanes_tier():
    """The auto-routed native tier serves big host scans through the
    lanes scanner and stays bit-exact with the python tier."""
    from ahocorasick_rs_tpu import AhoCorasick

    rng = np.random.default_rng(12)
    pats = ["needle", "pin", "stack"]
    body = "".join(
        chr(c) for c in rng.integers(97, 123, 200_000)
    )
    hay = body[:5000] + "needle" + body[5000:9000] + "pin" + body[9000:]
    ac = AhoCorasick(pats)  # auto: native tier at this size
    ref = AhoCorasick(pats, backend="numpy")
    assert ac.find_matches_as_indexes(hay) == ref.find_matches_as_indexes(
        hay
    )
    assert ac.stats()["last_backend"] == "native"


@pytest.mark.parametrize("use_classes", [False, True])
def test_batch_lanes_equals_serial(use_classes):
    """Interleaved batched scan == serial batched scan on ragged docs
    (empties, match-dense docs that overflow lane slices, group
    boundaries)."""
    rng = np.random.default_rng(21)
    am = build_automaton(PATS)
    docs = []
    for i in range(200):
        k = int(rng.integers(0, 120))
        d = rng.integers(97, 123, k, dtype=np.uint8).astype(np.uint8)
        if i % 7 == 0 and k > 10:
            d[2:8] = np.frombuffer(b"needle", np.uint8)
        if i % 31 == 0:
            d = np.frombuffer(b"aaaa" * 40, np.uint8)  # match-dense
        docs.append(d)
    docs.append(np.zeros(0, np.uint8))
    offsets = np.zeros(len(docs) + 1, np.int64)
    np.cumsum([len(d) for d in docs], out=offsets[1:])
    buf = np.concatenate(docs)
    classes = am.byte_classes if use_classes else None
    delta = am.delta_classed if use_classes else am.delta
    lib = native._load()
    cap = 1 << 16
    out_pos = np.empty(cap, np.int64)
    out_state = np.empty(cap, np.int32)
    d32 = np.ascontiguousarray(delta, np.int32)
    mc = np.ascontiguousarray(am.match_count, np.int32)
    if use_classes:
        found = lib.ac_scan_classed_batch(
            d32, d32.shape[1], np.ascontiguousarray(classes, np.int32),
            mc, buf, offsets, len(docs), out_pos, out_state, cap,
        )
    else:
        found = lib.ac_scan_dense_batch(
            d32, mc, buf, offsets, len(docs), out_pos, out_state, cap
        )
    want = (out_pos[:found].copy(), out_state[:found].copy())
    got = native.scan_dense_native_batch(
        delta, am.match_count, buf, offsets, classes=classes
    )
    # force the lanes path regardless of size thresholds
    import ahocorasick_rs_tpu.models.native as nat

    lanes_fn = (
        lib.ac_scan_classed_batch_lanes if use_classes
        else lib.ac_scan_dense_batch_lanes
    )
    small = 64  # tiny cap: exercises the overflow retry
    while True:
        op = np.empty(small, np.int64)
        os_ = np.empty(small, np.int32)
        if use_classes:
            f2 = lanes_fn(
                d32, d32.shape[1],
                np.ascontiguousarray(classes, np.int32), mc, buf,
                offsets, len(docs), 2, op, os_, small,
            )
        else:
            f2 = lanes_fn(
                d32, mc, buf, offsets, len(docs), 2, op, os_, small
            )
        if f2 <= small:
            break
        small = int(f2)
    assert np.array_equal(op[:f2], want[0])
    assert np.array_equal(os_[:f2], want[1])
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1].astype(np.int32), want[1])
    assert nat is native
