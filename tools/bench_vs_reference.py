"""Competitor benchmark: this package vs the REAL reference binaries.

The reference's benchmark is a *comparison* harness against
``pyahocorasick`` (/root/reference/benchmarks/test_comparison.py:72-166)
backing the README's "1.5x to 7x as fast" claim
(/root/reference/README.md:207).  This tool reproduces that recipe —
same dataset shapes, same scenarios — over

* ``pyahocorasick`` (``automaton.iter`` / ``iter_long``),
* ``ahocorasick_rs`` (the reference Rust binding),
* this package's host tier (per-document loop, like the reference calls),
* this package's batch API (the TPU-native layout for this workload),

and emits one markdown table plus a JSON artifact stating
"Nx vs pyahocorasick / Mx vs ahocorasick_rs" per scenario.  It runs in CI
(job ``reference-conformance``) where both competitor wheels install from
PyPI; ``--self-test`` replaces missing competitors with this package so
the harness itself runs on the no-network dev rig.

Datasets (shape parity with /root/reference/benchmarks/test_comparison.py):

* SHORT: the reference's literal 10 patterns over 10,000 ~70-char
  haystacks (test_comparison.py:36-53 — the haystacks embed a running
  counter so CPython's cached UTF-8 conversion cannot hide call
  overhead, per the file's own comment).
* LONG: ~4,200 lowercase synthetic names (>4 chars; the reference uses
  names.txt, not shipped here) over 100,000 ~600-char haystacks with
  1-in-90 containing a name (test_comparison.py:16-34).

Usage::

    python tools/bench_vs_reference.py [--out BENCH_VS_REFERENCE.md]
        [--long-haystacks 100000] [--self-test]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Any, Callable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import ahocorasick_rs_tpu as tpu  # noqa: E402

PATTERNS_SHORT = [
    "abc", "hello", "world", "aardvark", "fish", "what",
    "arbitrarymonkey", "birds", "host7", "host76",
]


def make_haystacks_short() -> list[str]:
    return [
        "arbitrarymonkey says hello to fish host76, 0.123 my friend, "
        f"but why??? {i}"
        for i in range(10_000)
    ]


def make_patterns_long(rng: np.random.Generator) -> list[str]:
    """~4,200 unique lowercase names of len 5-11 (names.txt shape)."""
    letters = "abcdefghijklmnopqrstuvwxyz"
    names: set = set()
    while len(names) < 4200:
        k = int(rng.integers(5, 12))
        names.add("".join(letters[i] for i in rng.integers(0, 26, k)))
    return sorted(names)


def make_haystacks_long(
    patterns: list[str], count: int, rng: np.random.Generator
) -> list[str]:
    line = (
        "no one who had ever seen {} in her infancy would have supposed "
        "her born to be an heroine. her situation in life, the character "
        "of her father and mother, her own person and disposition, were "
        "all equally against her. her father was a clergyman, without "
        "being neglected, or poor, and a very respectable man, though "
        "his name was whatevs - and he had never been handsome. he had a "
        "considerable independence besides two good livings - and he was "
        "not in the least addicted to locking up his daughters. her "
        "mother was a woman of useful plain sense, with a good temper, "
        "and, what is more remarkable, with a good constitution {}."
    )
    out = []
    for i in range(count):
        name = patterns[i % len(patterns)] if i % 90 == 0 else "notaperson"
        out.append(line.format(name, i))
    return out


def best_of(fn: Callable[[], Any], reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def scenarios(
    mod_kind: str, mod: Any, patterns: list[str], haystacks: list[str]
) -> dict:
    """Per-library scenario timings (seconds, best of 3).

    ``mod_kind`` is ``pyahocorasick`` | ``reference`` | ``ours`` |
    ``ours_batch``; scenario set mirrors
    /root/reference/benchmarks/test_comparison.py:100-166.
    """
    out: dict = {}
    if mod_kind == "pyahocorasick":
        automaton = mod.Automaton()
        for key in patterns:
            automaton.add_word(key, key)
        automaton.make_automaton()

        def overlapping() -> None:
            for h in haystacks:
                list(automaton.iter(h))

        def longest() -> None:
            for h in haystacks:
                list(automaton.iter_long(h))

        out["overlapping_strings"] = best_of(overlapping)
        out["leftmost_longest_strings"] = best_of(longest)
        return out

    if mod_kind in ("reference", "ours"):
        ac = mod.AhoCorasick(patterns)
        ac_l = mod.AhoCorasick(
            patterns, matchkind=mod.MatchKind.LeftmostLongest
        )

        def std_strings() -> None:
            for h in haystacks:
                ac.find_matches_as_strings(h)

        def std_indexes() -> None:
            for h in haystacks:
                ac.find_matches_as_indexes(h)

        def overlapping() -> None:
            for h in haystacks:
                ac.find_matches_as_strings(h, overlapping=True)

        def longest() -> None:
            for h in haystacks:
                ac_l.find_matches_as_strings(h)

        out["standard_strings"] = best_of(std_strings)
        out["standard_indexes"] = best_of(std_indexes)
        out["overlapping_strings"] = best_of(overlapping)
        out["leftmost_longest_strings"] = best_of(longest)
        return out

    # ours_batch: the TPU-native batched API over the same workload
    ac = mod.AhoCorasick(patterns)
    ac_l = mod.AhoCorasick(patterns, matchkind=mod.MatchKind.LeftmostLongest)
    out["standard_strings"] = best_of(
        lambda: ac.find_matches_as_strings_batch(haystacks)
    )
    out["standard_indexes"] = best_of(
        lambda: ac.find_matches_as_indexes_batch(haystacks)
    )
    out["overlapping_strings"] = best_of(
        lambda: ac.find_matches_as_strings_batch(haystacks, overlapping=True)
    )
    out["leftmost_longest_strings"] = best_of(
        lambda: ac_l.find_matches_as_strings_batch(haystacks)
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="BENCH_VS_REFERENCE.md")
    ap.add_argument("--json-out", default="BENCH_VS_REFERENCE.json")
    ap.add_argument("--long-haystacks", type=int, default=100_000)
    ap.add_argument("--self-test", action="store_true")
    args = ap.parse_args()

    libs: dict = {}
    if args.self_test:
        libs["reference"] = tpu  # stand-in so the harness runs anywhere
    else:
        import ahocorasick  # pyahocorasick

        import ahocorasick_rs

        libs["pyahocorasick"] = ahocorasick
        libs["reference"] = ahocorasick_rs
    libs["ours"] = tpu
    libs["ours_batch"] = tpu

    rng = np.random.default_rng(42)
    # ONE pattern set, used both for the matchers and for planting names
    # in the haystacks — two make_patterns_long(rng) calls would advance
    # the RNG and plant a disjoint name set (zero matches, voiding the
    # 1-in-90 hit-rate recipe; code-review r5 finding)
    patterns_long = make_patterns_long(rng)
    datasets = {
        "short": (PATTERNS_SHORT, make_haystacks_short()),
        "long": (
            patterns_long,
            make_haystacks_long(patterns_long, args.long_haystacks, rng),
        ),
    }

    results: dict = {}
    for ds_name, (patterns, haystacks) in datasets.items():
        results[ds_name] = {}
        for lib_name, mod in libs.items():
            kind = "pyahocorasick" if lib_name == "pyahocorasick" else (
                "ours_batch" if lib_name == "ours_batch" else (
                    "ours" if lib_name == "ours" else "reference"
                )
            )
            t = scenarios(kind, mod, patterns, haystacks)
            results[ds_name][lib_name] = t
            print(f"{ds_name}/{lib_name}: {t}", flush=True)

    # sanity cross-check: identical outputs for one haystack per dataset
    if not args.self_test:
        import ahocorasick_rs as ref

        for ds_name, (patterns, haystacks) in datasets.items():
            h = haystacks[0]
            want = ref.AhoCorasick(patterns).find_matches_as_indexes(h)
            got = tpu.AhoCorasick(patterns).find_matches_as_indexes(h)
            assert got == want, f"output mismatch on {ds_name}"

    lines = [
        "# Competitor benchmark (reference recipe)",
        "",
        "Methodology: the reference's own benchmark datasets and "
        "scenarios (/root/reference/benchmarks/test_comparison.py), "
        "best-of-3 wall time per scenario, single process.  `ours` calls "
        "the per-document API like the reference does; `ours_batch` is "
        "this package's batched API over the identical workload.  "
        f"Machine: {os.uname().machine}, CI runner.",
        "",
    ]
    summary: dict = {}
    for ds_name, per_lib in results.items():
        lines.append(f"## {ds_name}")
        lines.append("")
        scens = sorted(
            {s for t in per_lib.values() for s in t}
        )
        header = "| scenario | " + " | ".join(per_lib) + " | speedups |"
        lines.append(header)
        lines.append("|" + "---|" * (len(per_lib) + 2))
        for s in scens:
            row = [s]
            for lib_name in per_lib:
                v = per_lib[lib_name].get(s)
                row.append("-" if v is None else f"{v:.3f}s")
            ours = per_lib.get("ours", {}).get(s)
            ours_b = per_lib.get("ours_batch", {}).get(s)
            best_ours = min(
                (x for x in (ours, ours_b) if x is not None),
                default=None,
            )
            sp = []
            for other in ("pyahocorasick", "reference"):
                o = per_lib.get(other, {}).get(s)
                if o is not None and best_ours:
                    sp.append(f"{o / best_ours:.2f}x vs {other}")
                    summary.setdefault(ds_name, {})[f"{s}_vs_{other}"] = (
                        round(o / best_ours, 3)
                    )
            row.append("; ".join(sp) or "-")
            lines.append("| " + " | ".join(row) + " |")
        lines.append("")
    md = "\n".join(lines)
    with open(args.out, "w") as f:
        f.write(md)
    with open(args.json_out, "w") as f:
        json.dump({"results": results, "speedups": summary}, f, indent=1)
    print(md)


if __name__ == "__main__":
    main()
