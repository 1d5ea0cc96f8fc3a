"""Differential conformance against the REAL ``ahocorasick_rs`` binary.

Everything else in this repo pins correctness to golden cases transcribed
from the reference's tests plus a self-written brute-force oracle — both of
which share an author with the code under test.  This tool removes that
circularity: it compares ``ahocorasick_rs_tpu`` output **tuple-for-tuple
against the actual reference extension module** (the Rust binding over the
``aho-corasick`` crate, /root/reference/src/lib.rs) across

* randomized pattern sets x alphabets x haystack styles (random,
  pattern-concatenated, periodic, unicode),
* all three match kinds x overlapping x all four ``implementation``
  values, on both ``AhoCorasick`` (str) and ``BytesAhoCorasick`` classes,
* every golden case from the reference's own test suite
  (/root/reference/tests/test_ac.py:196-292), and
* an **error-text section** asserting this package's exception types AND
  message strings equal the reference's verbatim (the crate ``MatchError``
  display, PyO3 downcast/extraction texts — SURVEY.md §3.6 items 5/7).
  On mismatch the reference's exact text is printed so it can be copied
  into the package with evidence.

The dev rig has no network and no Rust toolchain, so the reference wheel
cannot exist there; this tool is wired into CI
(.github/workflows/main.yml, job ``reference-conformance``) where
``pip install ahocorasick_rs`` works.  ``--self-test`` substitutes this
package for the reference so the harness logic itself is testable anywhere.

Usage::

    python tools/conformance_vs_reference.py [--min-tuple-checks 1000000]
        [--max-seconds 2400] [--seed N] [--self-test]

Exit 0 iff every comparison matched, the error texts matched, and the
tuple-comparison target was reached within the time budget.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Any, Callable, Optional

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import ahocorasick_rs_tpu as tpu  # noqa: E402

KIND_NAMES = ["Standard", "LeftmostFirst", "LeftmostLongest"]
IMPL_NAMES = [None, "NoncontiguousNFA", "ContiguousNFA", "DFA"]

#: golden inputs from the reference's own tests
#: (/root/reference/tests/test_ac.py:196-292, README.md:29-54)
WINTER_PATTERNS = ["content", "disco", "disc", "discontent", "winter"]
WINTER_HAYSTACK = "This is the winter of my discontent"
QUICKSTART_PATTERNS = ["hello", "world", "fish"]
QUICKSTART_HAYSTACK = "this is my first hello world. hello!"
UNICODE_PATTERNS = ["d ☃f", "há", "l🤦l"]
UNICODE_HAYSTACK = "hello, world ☃fishá l🤦l"


class Stats:
    def __init__(self) -> None:
        self.cases = 0
        self.list_checks = 0
        self.tuple_checks = 0
        self.failures: list[str] = []

    def note(self, got: list, want: list) -> None:
        self.list_checks += 1
        self.tuple_checks += max(len(got), len(want), 1)


def _kind(mod: Any, name: Optional[str]) -> Any:
    return None if name is None else getattr(mod.MatchKind, name)

def _impl(mod: Any, name: Optional[str]) -> Any:
    return None if name is None else getattr(mod.Implementation, name)


def build_matcher(
    mod: Any,
    pats: list,
    kind_name: Optional[str],
    impl_name: Optional[str],
    is_bytes: bool,
) -> Any:
    cls = mod.BytesAhoCorasick if is_bytes else mod.AhoCorasick
    kwargs: dict = {}
    if kind_name is not None:
        kwargs["matchkind"] = _kind(mod, kind_name)
    if impl_name is not None:
        kwargs["implementation"] = _impl(mod, impl_name)
    return cls(pats, **kwargs)


def compare_case(
    ref_mod: Any,
    pats: list,
    hays: list,
    is_bytes: bool,
    stats: Stats,
    rng: np.random.Generator,
) -> None:
    """Compare every (kind, impl, overlapping) combination on this case."""
    stats.cases += 1
    for kind_name in KIND_NAMES:
        for impl_name in IMPL_NAMES:
            # build each side separately so a one-sided refusal (either
            # direction) is reported, not silently skipped (code-review
            # r5 finding: the old single-try swallowed ours-only
            # ValueErrors as "both refused")
            ref_exc = ours_exc = None
            ref = ours = None
            try:
                ref = build_matcher(
                    ref_mod, pats, kind_name, impl_name, is_bytes
                )
            except ValueError as e:
                ref_exc = e
            try:
                ours = build_matcher(
                    tpu, pats, kind_name, impl_name, is_bytes
                )
            except ValueError as e:
                ours_exc = e
            if (ref_exc is None) != (ours_exc is None):
                stats.failures.append(
                    "build refused by only one side\n"
                    f"  reference: {ref_exc!r}\n  ours: {ours_exc!r}\n"
                    f"  pats={pats!r} kind={kind_name} impl={impl_name}"
                )
                continue
            if ref_exc is not None:
                continue  # both refused — acceptable parity
            overlaps = [False, True] if kind_name == "Standard" else [False]
            for hay in hays:
                for ov in overlaps:
                    want = ref.find_matches_as_indexes(hay, overlapping=ov)
                    got = ours.find_matches_as_indexes(hay, overlapping=ov)
                    stats.note(got, want)
                    if got != want:
                        stats.failures.append(
                            "MATCH MISMATCH\n"
                            f"  pats={pats!r}\n  hay={hay!r}\n"
                            f"  kind={kind_name} impl={impl_name} "
                            f"overlapping={ov} bytes={is_bytes}\n"
                            f"  reference={want!r}\n  ours={got!r}"
                        )
                        if len(stats.failures) > 20:
                            raise SystemExit(render_failures(stats))
                if not is_bytes and rng.random() < 0.25:
                    wants = ref.find_matches_as_strings(hay)
                    gots = ours.find_matches_as_strings(hay)
                    stats.note(gots, wants)
                    if gots != wants:
                        stats.failures.append(
                            "STRINGS MISMATCH\n"
                            f"  pats={pats!r}\n  hay={hay!r}\n"
                            f"  kind={kind_name} impl={impl_name}\n"
                            f"  reference={wants!r}\n  ours={gots!r}"
                        )


def gen_case(
    rng: np.random.Generator,
) -> tuple[list, list, bool]:
    """One randomized (patterns, haystacks, is_bytes) case.

    Mirrors the coverage axes of the reference's hypothesis suite
    (/root/reference/tests/test_ac.py:86-193) plus adversarial styles:
    nested/overlapping patterns, periodic haystacks, planted matches,
    non-ASCII code points (str side), NUL/0xFF bytes (bytes side).
    """
    is_bytes = bool(rng.random() < 0.5)
    alpha = int(rng.choice([2, 3, 26, 256 if is_bytes else 60]))
    npat = int(rng.integers(1, 24))
    pats: list = []
    seen = set()
    for _ in range(npat):
        k = int(rng.integers(1, 10))
        raw = rng.integers(0, alpha, k, dtype=np.int64)
        if is_bytes:
            p: Any = bytes((raw % 256).astype(np.uint8))
        else:
            # include multi-byte code points so UTF-8 index mapping and
            # code-point offsets are exercised against the reference
            p = "".join(
                chr(97 + int(c)) if c < 26 else chr(0x2600 + int(c))
                for c in raw
            )
        if p and p not in seen:
            seen.add(p)
            pats.append(p)
    if not pats:
        pats = [b"a" if is_bytes else "a"]
    hays = []
    for _ in range(3):
        n = int(rng.integers(0, 600))
        style = int(rng.integers(0, 3))
        if style == 0:
            raw = rng.integers(0, alpha, n, dtype=np.int64)
            if is_bytes:
                hay: Any = bytes((raw % 256).astype(np.uint8))
            else:
                hay = "".join(
                    chr(97 + int(c)) if c < 26 else chr(0x2600 + int(c))
                    for c in raw
                )
        elif style == 1:
            # concatenated patterns + noise: maximal overlap pressure
            parts: list = []
            total = 0
            while total < n and pats:
                p = pats[int(rng.integers(0, len(pats)))]
                parts.append(p)
                total += len(p)
            hay = (b"" if is_bytes else "").join(parts)
        else:
            p0 = pats[int(rng.integers(0, len(pats)))]
            reps = max(1, n // max(len(p0), 1))
            hay = p0 * reps
        hays.append(hay)
    return pats, hays, is_bytes


def golden_cases(ref_mod: Any, stats: Stats, rng: np.random.Generator) -> None:
    compare_case(
        ref_mod, WINTER_PATTERNS, [WINTER_HAYSTACK], False, stats, rng
    )
    compare_case(
        ref_mod, QUICKSTART_PATTERNS, [QUICKSTART_HAYSTACK], False, stats, rng
    )
    compare_case(
        ref_mod, UNICODE_PATTERNS, [UNICODE_HAYSTACK], False, stats, rng
    )
    compare_case(
        ref_mod,
        [p.encode() for p in WINTER_PATTERNS],
        [WINTER_HAYSTACK.encode()],
        True,
        stats,
        rng,
    )


def _capture(fn: Callable[[], Any]) -> tuple[Optional[str], Optional[str]]:
    try:
        fn()
        return None, None
    except Exception as e:  # noqa: BLE001 - differential capture
        return type(e).__name__, str(e)


def error_text_section(ref_mod: Any, stats: Stats) -> None:
    """Exception type + message parity, string-for-string.

    Covers every error path the reference maps explicitly
    (/root/reference/src/lib.rs:36-39,149,205-212,288-298,387-389) plus
    the PyO3 argument-extraction haystack errors.  A mismatch prints the
    reference's verbatim text — the evidence needed to fix the package.
    """
    np_arr2d = np.zeros((2, 2), dtype=np.uint8)
    np_strided = np.zeros(16, dtype=np.uint8)[::2]
    cases: list[tuple[str, Callable[[Any], Any]]] = [
        ("nonstr-pattern", lambda m: m.AhoCorasick(["x", 12])),
        ("empty-str-pattern", lambda m: m.AhoCorasick(["x", ""])),
        ("empty-bytes-pattern", lambda m: m.BytesAhoCorasick([b"x", b""])),
        (
            "overlapping-leftmost-first",
            lambda m: m.AhoCorasick(
                ["ab"], matchkind=m.MatchKind.LeftmostFirst
            ).find_matches_as_indexes("abab", overlapping=True),
        ),
        (
            "overlapping-leftmost-longest",
            lambda m: m.AhoCorasick(
                ["ab"], matchkind=m.MatchKind.LeftmostLongest
            ).find_matches_as_indexes("abab", overlapping=True),
        ),
        (
            "bytes-overlapping-leftmost",
            lambda m: m.BytesAhoCorasick(
                [b"ab"], matchkind=m.MatchKind.LeftmostFirst
            ).find_matches_as_indexes(b"abab", overlapping=True),
        ),
        (
            "str-haystack-int",
            lambda m: m.AhoCorasick(["x"]).find_matches_as_indexes(12),
        ),
        (
            "bytes-haystack-str",
            lambda m: m.BytesAhoCorasick([b"x"]).find_matches_as_indexes(
                "xx"
            ),
        ),
        (
            "bytes-haystack-2d",
            lambda m: m.BytesAhoCorasick([b"x"]).find_matches_as_indexes(
                np_arr2d
            ),
        ),
        (
            "bytes-haystack-noncontiguous",
            lambda m: m.BytesAhoCorasick([b"x"]).find_matches_as_indexes(
                np_strided
            ),
        ),
    ]
    for name, trigger in cases:
        ref_type, ref_text = _capture(lambda: trigger(ref_mod))
        our_type, our_text = _capture(lambda: trigger(tpu))
        stats.list_checks += 1
        stats.tuple_checks += 1
        if (ref_type, ref_text) != (our_type, our_text):
            stats.failures.append(
                f"ERROR-TEXT MISMATCH [{name}]\n"
                f"  reference: {ref_type}: {ref_text!r}\n"
                f"  ours:      {our_type}: {our_text!r}"
            )
        else:
            print(f"  error-text OK [{name}]: {ref_type}: {ref_text!r}")


def dense_adversarial_section(
    ref_mod: Any, stats: Stats, rng: np.random.Generator
) -> None:
    """Match-dense corpora through the guarded resolve paths vs the
    reference.

    Nested pattern sets over repetitive corpora route this package's
    scans through the streamed resolver, the fused native resolve-scan,
    and the leftmost priority automaton (thresholds are lowered so the
    dense machinery engages at CI-friendly sizes) — the one code region
    the small-case sweep cannot reach.  Every output is compared
    tuple-for-tuple against the reference binary.
    """
    lowered = False
    try:
        tpu.api._MatcherBase._STREAM_MIN = 1 << 16
        tpu.api._MatcherBase._STREAM_SEG = 1 << 15
        tpu.api._MatcherBase._STREAM_OCC = 1 << 13
        lowered = True
    except Exception:
        pass  # private attrs may move; the section still runs full-size
    try:
        for _ in range(12):
            base = int(rng.integers(97, 123))
            depth = int(rng.integers(2, 17))
            pats = [bytes([base]) * k for k in range(1, depth + 1)]
            for _ in range(int(rng.integers(0, 3))):
                extra = bytes(
                    rng.integers(97, 123, int(rng.integers(1, 5)),
                                 dtype=np.uint8)
                )
                if extra not in pats:
                    pats.append(extra)
            n = int(rng.integers(1 << 17, 1 << 19))
            if rng.random() < 0.5:
                hay = bytes([base]) * n
            else:
                period = bytes([base]) * int(rng.integers(1, 9)) + b"!"
                hay = (period * (n // len(period) + 1))[:n]
            for kind_name in KIND_NAMES:
                ref = build_matcher(ref_mod, pats, kind_name, None, True)
                ours = build_matcher(tpu, pats, kind_name, None, True)
                want = ref.find_matches_as_indexes(hay)
                got = ours.find_matches_as_indexes(hay)
                stats.note(got, want)
                if got != want:
                    diff_at = next(
                        (
                            i
                            for i, (a, b) in enumerate(zip(got, want))
                            if a != b
                        ),
                        min(len(got), len(want)),
                    )
                    stats.failures.append(
                        "DENSE MISMATCH\n"
                        f"  pats={pats!r} n={n} kind={kind_name}\n"
                        f"  got {len(got)} vs want {len(want)}; "
                        f"first diff near {diff_at}"
                    )
                    return
        print(
            f"  dense-adversarial OK ({stats.tuple_checks} cumulative "
            "tuple comparisons)"
        )
    finally:
        if lowered:
            tpu.api._MatcherBase._STREAM_MIN = 64 << 20
            tpu.api._MatcherBase._STREAM_SEG = 16 << 20
            tpu.api._MatcherBase._STREAM_OCC = 8 << 20


def render_failures(stats: Stats) -> str:
    return (
        f"{len(stats.failures)} DIVERGENCES after {stats.cases} cases / "
        f"{stats.tuple_checks} tuple comparisons:\n\n"
        + "\n\n".join(stats.failures[:20])
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--min-tuple-checks", type=int, default=1_000_000)
    ap.add_argument(
        "--min-list-checks",
        type=int,
        default=150_000,
        help=(
            "minimum list-level comparisons from the randomized sweep "
            "(the dense section alone can satisfy the tuple target)"
        ),
    )
    ap.add_argument("--max-seconds", type=float, default=2400.0)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument(
        "--self-test",
        action="store_true",
        help=(
            "use this package as its own 'reference' — verifies the "
            "harness runs end-to-end where the reference wheel cannot "
            "be installed (the dev rig)"
        ),
    )
    args = ap.parse_args()

    if args.self_test:
        ref_mod: Any = tpu
        print("SELF-TEST MODE: reference := ahocorasick_rs_tpu")
    else:
        import ahocorasick_rs as ref_mod  # the real binary

        print(
            "reference binary:",
            getattr(ref_mod, "__file__", "<unknown>"),
        )

    seed = args.seed if args.seed is not None else int(time.time())
    rng = np.random.default_rng(seed)
    print(f"seed={seed}")
    stats = Stats()

    print("== error-text section ==")
    error_text_section(ref_mod, stats)
    print("== golden cases ==")
    golden_cases(ref_mod, stats, rng)
    print("== dense-adversarial section ==")
    dense_adversarial_section(ref_mod, stats, rng)
    print("== randomized differential sweep ==")
    t0 = time.time()
    last_report = t0
    while (
        (
            stats.tuple_checks < args.min_tuple_checks
            or stats.list_checks < args.min_list_checks
        )
        and time.time() - t0 < args.max_seconds
        and not stats.failures
    ):
        pats, hays, is_bytes = gen_case(rng)
        compare_case(ref_mod, pats, hays, is_bytes, stats, rng)
        if time.time() - last_report > 20:
            last_report = time.time()
            print(
                f"  {stats.cases} cases, {stats.list_checks} list checks, "
                f"{stats.tuple_checks} tuple comparisons, "
                f"{time.time() - t0:.0f}s",
                flush=True,
            )

    summary = {
        "cases": stats.cases,
        "list_checks": stats.list_checks,
        "tuple_checks": stats.tuple_checks,
        "seconds": round(time.time() - t0, 1),
        "seed": seed,
        "self_test": args.self_test,
        "failures": len(stats.failures),
    }
    print("SUMMARY:", summary)
    if stats.failures:
        print(render_failures(stats))
        raise SystemExit(1)
    if (
        stats.tuple_checks < args.min_tuple_checks
        or stats.list_checks < args.min_list_checks
    ):
        print(
            f"FAIL: {stats.tuple_checks} tuple / {stats.list_checks} "
            f"list comparisons (< {args.min_tuple_checks} / "
            f"{args.min_list_checks}) within {args.max_seconds}s"
        )
        raise SystemExit(2)
    print("PASS: zero divergences vs reference")


if __name__ == "__main__":
    main()
