"""Device-path conformance on the REAL TPU (tests force CPU).

Runs the public API's device tiers on the attached TPU chip against the
python-tier oracle for a matrix of corpora x semantics x backends, and
writes ``TPU_CONFORMANCE_r05.json`` (round-5 re-run including the halo
fire kernel and streamed staging).  This is executed evidence that the
device kernels (dense lane scan, stride-2, prefiltered Teddy) are
bit-exact on real hardware, not just under the CPU interpret/virtual-mesh
test environment.

Usage: ``python tools/tpu_conformance.py`` (tunnel-tolerant: one corpus
at a time, compilation cache enabled).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ahocorasick_rs_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from ahocorasick_rs_tpu import (  # noqa: E402
    AhoCorasick,
    BytesAhoCorasick,
    Implementation,
    MatchKind,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "TPU_CONFORMANCE_r05.json",
)


def corpora() -> list[tuple[str, list[bytes], bytes]]:
    """(name, patterns, haystack) cases spanning the device-path shapes."""
    rng = np.random.default_rng(77)
    letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)
    out = []

    # LONG-recipe-like: 500 name patterns over 4MB lowercase text
    names = sorted(
        {
            bytes(letters[rng.integers(0, 26, int(rng.integers(5, 12)))])
            for _ in range(500)
        }
    )
    hay = bytearray(bytes(letters[rng.integers(0, 26, 4 << 20)]))
    for i in range(200):
        p = names[int(rng.integers(0, len(names)))]
        off = int(rng.integers(0, len(hay) - 16))
        hay[off : off + len(p)] = p
    out.append(("long_names_4mb", names, bytes(hay)))

    # overlapping-heavy: nested patterns, repetitive haystack
    pats = [b"a", b"aa", b"aaa", b"ab", b"aab", b"ba"]
    hay2 = (b"a" * 37 + b"b" + b"a" * 11 + b"ba") * 60_000
    out.append(("nested_repeats", pats, hay2))

    # binary byte patterns incl. NUL and 0xFF
    bpats = [bytes([0, 1, 2]), b"\xff\xfe", b"\x00\x00a", b"zz\x00"]
    hb = bytearray(rng.integers(0, 256, 3 << 20, dtype=np.uint8).tobytes())
    for i in range(100):
        p = bpats[int(rng.integers(0, len(bpats)))]
        off = int(rng.integers(0, len(hb) - 8))
        hb[off : off + len(p)] = p
    out.append(("binary_3mb", bpats, bytes(hb)))
    return out


def main() -> None:
    record: dict = {
        "round": 4,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "cases": [],
        "ok": True,
    }
    t_start = time.time()
    for name, pats, hay in corpora():
        for kind, overlapping in [
            (MatchKind.Standard, False),
            (MatchKind.Standard, True),
            (MatchKind.LeftmostFirst, False),
            (MatchKind.LeftmostLongest, False),
        ]:
            oracle = BytesAhoCorasick(
                pats, matchkind=kind, backend="numpy"
            )
            want = oracle.find_matches_as_indexes(
                hay, overlapping=overlapping
            )
            for backend, force_teddy, impl in [
                ("device", False, None),
                ("device", True, None),
                ("device", False, Implementation.ContiguousNFA),
            ]:
                ac = BytesAhoCorasick(
                    pats,
                    matchkind=kind,
                    implementation=impl,
                    backend=backend,
                )
                if force_teddy:
                    ac._teddy_state = "force"
                else:
                    ac._teddy_state = "off"
                got = ac.find_matches_as_indexes(
                    hay, overlapping=overlapping
                )
                case = {
                    "corpus": name,
                    "matchkind": kind.name,
                    "overlapping": overlapping,
                    "backend": backend,
                    "teddy": force_teddy,
                    "implementation": impl.name if impl else "DFA",
                    "matches": len(want),
                    "exact": got == want,
                    "tier": ac.stats()["last_backend"],
                }
                record["cases"].append(case)
                if not case["exact"]:
                    record["ok"] = False
                print(
                    f"{name} {kind.name} ov={overlapping} "
                    f"{case['implementation']} teddy={force_teddy}: "
                    f"{'OK' if case['exact'] else 'MISMATCH'} "
                    f"({len(want)} matches, tier={case['tier']})",
                    flush=True,
                )
    # str-side unicode device check
    upats = ["wörld", "día", "ação"]
    body = ("texto día con wörld e ação misturados " * 120_000)
    oracle = AhoCorasick(upats, backend="numpy")
    ac = AhoCorasick(upats, backend="device")
    want = oracle.find_matches_as_indexes(body)
    got = ac.find_matches_as_indexes(body)
    ok = got == want
    record["cases"].append(
        {
            "corpus": "unicode_str_device",
            "matchkind": "Standard",
            "matches": len(want),
            "exact": ok,
            "tier": ac.stats()["last_backend"],
        }
    )
    record["ok"] = record["ok"] and ok
    print(f"unicode_str_device: {'OK' if ok else 'MISMATCH'}", flush=True)
    record["seconds"] = round(time.time() - t_start, 1)
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
    print(
        f"{'ALL EXACT' if record['ok'] else 'FAILURES'} — "
        f"{len(record['cases'])} cases in {record['seconds']}s -> {OUT}",
        flush=True,
    )
    if not record["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
