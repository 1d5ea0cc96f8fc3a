"""Bulk differential fuzzer: all host tiers vs the brute-force oracle.

Randomized pattern sets (varied sizes, alphabets, lengths) and haystacks
(random, repetitive, planted, boundary-adjacent) are scanned through the
public API on every host execution tier and every engine, across all four
semantics, and compared against a definitional brute-force oracle
(``str.find``-style enumeration of every occurrence + per-semantics
reduction).  Raw numpy randomness makes this ~100x faster per case than
Hypothesis, so a few minutes sweep tens of thousands of configurations —
the bulk-coverage complement to the replayed Hypothesis corpus.

Usage: ``python tools/fuzz_differential.py [seconds]`` (default 120).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from ahocorasick_rs_tpu import (  # noqa: E402
    BytesAhoCorasick,
    Implementation,
    MatchKind,
)

KINDS = [MatchKind.Standard, MatchKind.LeftmostFirst, MatchKind.LeftmostLongest]
IMPLS = [
    None,
    Implementation.DFA,
    Implementation.ContiguousNFA,
    Implementation.NoncontiguousNFA,
]


def oracle_occurrences(
    pats: list[bytes], hay: bytes
) -> list[tuple[int, int, int]]:
    occ = []
    for pid, p in enumerate(pats):
        start = 0
        while True:
            i = hay.find(p, start)
            if i < 0:
                break
            occ.append((pid, i, i + len(p)))
            start = i + 1
    return occ


def oracle(
    pats: list[bytes], hay: bytes, kind: MatchKind, overlapping: bool
) -> list[tuple[int, int, int]]:
    occ = oracle_occurrences(pats, hay)
    if overlapping:
        occ.sort(key=lambda t: (t[2], t[1] - t[2], t[0]))
        return occ
    if kind is MatchKind.Standard:
        occ.sort(key=lambda t: (t[2], t[1]))
    elif kind is MatchKind.LeftmostFirst:
        occ.sort(key=lambda t: (t[1], t[0]))
    else:
        occ.sort(key=lambda t: (t[1], t[1] - t[2], t[0]))
    out = []
    cur = 0
    for t in occ:
        if t[1] >= cur:
            out.append(t)
            cur = t[2]
    return out


def gen_case(rng: np.random.Generator):
    alpha = int(rng.choice([2, 4, 26, 256]))
    npat = int(rng.integers(1, 40))
    pats = []
    seen = set()
    for _ in range(npat):
        k = int(rng.integers(1, 12))
        p = bytes(rng.integers(0, alpha, k, dtype=np.uint8))
        if p not in seen:
            seen.add(p)
            pats.append(p)
    n = int(rng.integers(0, 4000))
    style = int(rng.integers(0, 3))
    if style == 0:
        hay = bytes(rng.integers(0, alpha, n, dtype=np.uint8))
    elif style == 1 and pats:
        # concatenated patterns with noise — maximal overlap pressure
        parts = []
        while sum(map(len, parts)) < n:
            if rng.random() < 0.7:
                parts.append(pats[int(rng.integers(0, len(pats)))])
            else:
                parts.append(
                    bytes(rng.integers(0, alpha, 3, dtype=np.uint8))
                )
        hay = b"".join(parts)[:n]
    else:
        period = bytes(rng.integers(0, alpha, max(1, alpha // 2)))
        hay = (period * (n // max(len(period), 1) + 1))[:n]
    return pats, hay


def big_nested_check(rng: np.random.Generator) -> int:
    """Match-dense >=1MB case: nested prefixes over repetitive corpora.

    The streamed host path (small ``_STREAM_MIN`` forces it), the
    non-streamed native/numpy tiers, and the sequential python walk are
    three independent implementations; all must agree tuple-for-tuple on
    the regime where occurrence sets blow up (VERDICT r4: fuzz coverage
    beyond 4KB haystacks).  The python walk is the reference here — the
    bytes.find oracle would enumerate the full occurrence set itself.
    """
    base = int(rng.integers(97, 123))
    depth = int(rng.integers(2, 9))
    pats = [bytes([base]) * k for k in range(1, depth + 1)]
    for _ in range(int(rng.integers(0, 4))):
        k = int(rng.integers(1, 6))
        p = bytes(rng.integers(97, 123, k, dtype=np.uint8))
        if p not in pats:
            pats.append(p)
    n = int(rng.integers(1 << 20, (1 << 20) + (1 << 19)))
    style = int(rng.integers(0, 2))
    if style == 0:
        hay = bytes([base]) * n  # maximal density
    else:
        period = bytes([base]) * int(rng.integers(1, 12)) + b"!"
        hay = (period * (n // len(period) + 1))[:n]
    checks = 0
    for kind in KINDS:
        want = BytesAhoCorasick(
            pats, matchkind=kind, backend="python"
        ).find_matches_as_indexes(hay)
        for backend in ("native", "numpy"):
            ac = BytesAhoCorasick(pats, matchkind=kind, backend=backend)
            # force the streamed path with tiny segments
            ac._STREAM_MIN = 1 << 18
            ac._STREAM_SEG = 1 << 17
            ac._STREAM_OCC = 1 << 15
            got_stream = ac.find_matches_as_indexes(hay)
            assert got_stream == want, (
                f"BIG STREAM MISMATCH kind={kind} backend={backend} "
                f"pats={pats!r} n={n} style={style} "
                f"got={len(got_stream)} want={len(want)}"
            )
            checks += 1
        # non-streamed vectorized resolve on the same corpus
        ac2 = BytesAhoCorasick(pats, matchkind=kind, backend="numpy")
        got_vec = ac2.find_matches_as_indexes(hay)
        assert got_vec == want, (
            f"BIG VECTOR MISMATCH kind={kind} pats={pats!r} n={n}"
        )
        checks += 1
    return checks


def main() -> None:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    rng = np.random.default_rng(int(time.time()))
    cases = 0
    checks = 0
    t0 = time.time()
    while time.time() - t0 < budget:
        if cases % 120 == 20:
            checks += big_nested_check(rng)
        pats, hay = gen_case(rng)
        cases += 1
        for kind in KINDS:
            want = None
            for impl in IMPLS:
                for backend in ("python", "numpy", "auto"):
                    ac = BytesAhoCorasick(
                        pats,
                        matchkind=kind,
                        implementation=impl,
                        backend=backend,
                    )
                    got = ac.find_matches_as_indexes(hay)
                    if want is None:
                        want = oracle(pats, hay, kind, False)
                    assert got == want, (
                        f"MISMATCH kind={kind} impl={impl} "
                        f"backend={backend} pats={pats!r} hay={hay!r}\n"
                        f"got={got}\nwant={want}"
                    )
                    checks += 1
                    if kind is MatchKind.Standard:
                        got_o = ac.find_matches_as_indexes(
                            hay, overlapping=True
                        )
                        want_o = oracle(pats, hay, kind, True)
                        assert got_o == want_o, (
                            f"OVERLAP MISMATCH impl={impl} "
                            f"backend={backend} pats={pats!r} "
                            f"hay={hay!r}"
                        )
                        checks += 1
        if cases % 50 == 0:
            print(
                f"{cases} cases, {checks} checks, "
                f"{time.time() - t0:.0f}s",
                flush=True,
            )
    print(f"PASS: {cases} cases, {checks} checks in {budget:.0f}s", flush=True)


if __name__ == "__main__":
    main()
