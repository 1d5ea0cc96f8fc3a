"""Benchmark: haystack GB/s/chip for the device scan paths on the TPU.

Two sections, one JSON line:

* **Streaming north star** — mirrors the reference's LONG recipe
  (/root/reference/benchmarks/test_comparison.py:16-34: ~1k lowercase name
  patterns, ~1-in-90 lines of ~600 chars containing a name) as one large
  corpus.  ``value`` is the best device scan-path throughput over
  device-resident data (BASELINE.json north star: haystack GB/s/chip);
  ``vs_baseline`` compares against the native single-core C++ DFA scan of
  the same automaton over the same corpus (the closest available
  equivalent of the reference's Rust hot loop on this machine).
* **Scenario parity** — the reference's five benchmark scenarios
  (standard-as-strings, standard-as-indexes, overlapping,
  leftmost-longest, pure-Python loop control;
  /root/reference/benchmarks/test_comparison.py:100-166) over SHORT
  (10 patterns x 10k ~70-char haystacks) and LONG (1k patterns x 20k
  ~600-char haystacks) datasets, each timed as a full pass **end to end**
  (host strings in, host tuples out — includes every transfer) for both
  the per-haystack loop and the single-dispatch batch API.

Measurement methodology (hard-won on this rig): only timings that end in a
host fetch of a value derived from the computation are real — this tunnel's
``block_until_ready`` returns early.  Every timed path here returns host
values.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import string
import time
import traceback

import numpy as np

HAYSTACK_MB = 64
PATTERNS = 1000
REPS = 3


def synth_names(count: int, rng: np.random.Generator) -> list[bytes]:
    """Deterministic lowercase 'name' patterns, len 5-11."""
    letters = np.frombuffer(
        string.ascii_lowercase.encode(), dtype=np.uint8
    )
    names = set()
    while len(names) < count:
        k = int(rng.integers(5, 12))
        names.add(bytes(letters[rng.integers(0, 26, k)]))
    return sorted(names)


def synth_corpus(n_bytes: int, names: list[bytes],
                 rng: np.random.Generator) -> np.ndarray:
    """Random lowercase words + spaces with names spliced in ~1-in-90 lines
    of ~600 chars (reference LONG dataset shape)."""
    letters = np.frombuffer(
        (string.ascii_lowercase + "      ").encode(), dtype=np.uint8
    )
    corpus = letters[rng.integers(0, len(letters), n_bytes)]
    line_len = 600
    n_lines = n_bytes // line_len
    hit_lines = rng.integers(0, n_lines, max(1, n_lines // 90))
    for ln in hit_lines:
        name = names[int(rng.integers(0, len(names)))]
        off = int(ln) * line_len + int(rng.integers(0, line_len - 12))
        corpus[off : off + len(name)] = np.frombuffer(name, dtype=np.uint8)
    return corpus


def _time_best(fn, reps: int = REPS) -> float:
    """Best wall time of ``fn`` (fn must end in a host fetch)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def make_datasets(rng: np.random.Generator):
    """SHORT and LONG datasets in the reference benchmark's shape."""
    short_patterns = [
        "abc", "hello", "world", "aardvark", "fish",
        "what", "arbitrarymonkey", "birds", "host7", "host76",
    ]
    short_hay = [
        f"arbitrarymonkey says hello to fish host76, 0.123 my friend, "
        f"but why??? {i}"
        for i in range(10_000)
    ]
    long_names = [n.decode() for n in synth_names(PATTERNS, rng)]
    filler = (
        "no one who had ever seen {} in her infancy would have supposed "
        "her born to be an heroine; her situation in life, the character "
        "of her father and mother, her own person and disposition were "
        "all equally against her, and the rest of this line is ordinary "
        "prose of roughly six hundred characters so the haystack length "
        "matches the reference recipe with room to spare for the counter "
        "value {} at the end, padded with plain words that never match "
        "any generated name pattern because they are common english and "
        "the names are uniform random lowercase strings of length five "
        "to eleven which almost surely do not occur in this text"
    )
    long_hay = []
    for i in range(20_000):
        name = long_names[i % len(long_names)] if i % 90 == 0 else "nobody"
        long_hay.append(filler.format(name, i))
    return {
        "short": (short_patterns, short_hay),
        "long": (long_names, long_hay),
    }


def bench_scenarios(detail: dict) -> None:
    """Reference scenario parity, end-to-end timings (incl. transfers)."""
    from ahocorasick_rs_tpu import AhoCorasick, MatchKind

    rng = np.random.default_rng(7)
    out: dict = {}
    for ds_name, (patterns, haystacks) in make_datasets(rng).items():
        total_mb = sum(len(h) for h in haystacks) / 1e6
        ac = AhoCorasick(patterns)
        ll = AhoCorasick(patterns, matchkind=MatchKind.LeftmostLongest)
        n_matches = sum(len(m) for m in ac.find_matches_as_indexes_batch(
            haystacks
        ))
        scen: dict = {
            "haystacks": len(haystacks),
            "total_mb": round(total_mb, 2),
            "matches": n_matches,
        }

        def put(key, seconds):
            scen[key] = {
                "seconds": round(seconds, 4),
                "mb_per_s": round(total_mb / seconds, 2),
            }

        put("standard_strings_loop", _time_best(
            lambda: [ac.find_matches_as_strings(h) for h in haystacks],
            reps=2,
        ))
        put("standard_indexes_loop", _time_best(
            lambda: [ac.find_matches_as_indexes(h) for h in haystacks],
            reps=2,
        ))
        ac.find_matches_as_strings_batch(haystacks)  # warm/compile
        put("standard_strings_batch", _time_best(
            lambda: ac.find_matches_as_strings_batch(haystacks), reps=2
        ))
        put("standard_indexes_batch", _time_best(
            lambda: ac.find_matches_as_indexes_batch(haystacks), reps=2
        ))
        put("overlapping_strings_batch", _time_best(
            lambda: ac.find_matches_as_strings_batch(
                haystacks, overlapping=True
            ),
            reps=2,
        ))
        ll.find_matches_as_strings_batch(haystacks)
        put("leftmost_longest_strings_batch", _time_best(
            lambda: ll.find_matches_as_strings_batch(haystacks), reps=2
        ))

        def control():
            for h in haystacks:
                _ = h

        put("python_loop_control", _time_best(control, reps=2))
        scen["batch_backend"] = ac.stats()["last_backend"]
        out[ds_name] = scen
    detail["scenarios"] = out


def bench_large_set(detail: dict) -> None:
    """BASELINE config-5 evidence: a 100k-pattern set end to end.

    Records construction seconds (native builder + engine tables) and the
    auto-routed scan throughput on a 16MB haystack — huge sets route to
    the host tiers until the device-table upload amortizes (api.py
    ``_device_amortized``), so this is the user-visible first-scan number.
    """
    from ahocorasick_rs_tpu import BytesAhoCorasick

    rng = np.random.default_rng(99)
    pats = synth_names(100_000, rng)
    t0 = time.perf_counter()
    ac = BytesAhoCorasick(pats)
    build_s = time.perf_counter() - t0
    hay = synth_corpus(16 << 20, pats[:1000], rng)
    data = hay.tobytes()
    ac.find_matches_as_indexes(data)  # warm
    t = _time_best(lambda: ac.find_matches_as_indexes(data), reps=2)
    detail["large_set"] = {
        "patterns": len(pats),
        "states": ac.stats()["num_states"],
        "implementation": ac.stats()["implementation"],
        "build_seconds": round(build_s, 2),
        "scan_backend": ac.stats()["last_backend"],
        "scan_mb_per_s": round(16 * 1024 * 1024 / t / 1e6, 2),
    }


def bench_million_set(detail: dict) -> None:
    """BASELINE config-5 evidence at stated scale: a 10^6-pattern set.

    Records construction seconds, peak RSS (``ru_maxrss`` is a process
    lifetime high-water mark, so the pre-build reading is recorded too),
    the auto-chosen engine, and the auto-routed scan throughput on a 16MB
    haystack — the artifact form of the round-3 STATUS.md claim so round
    5+ cannot silently regress it (VERDICT r3 missing #3).
    """
    import resource

    from ahocorasick_rs_tpu import BytesAhoCorasick

    rng = np.random.default_rng(1001)
    pats = synth_names(1_000_000, rng)
    rss_before_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    ac = BytesAhoCorasick(pats)
    build_s = time.perf_counter() - t0
    rss_after_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    hay = synth_corpus(16 << 20, pats[:1000], rng)
    data = hay.tobytes()
    ac.find_matches_as_indexes(data)  # warm
    t = _time_best(lambda: ac.find_matches_as_indexes(data), reps=2)
    detail["million_set"] = {
        "patterns": len(pats),
        "states": ac.stats()["num_states"],
        "implementation": ac.stats()["implementation"],
        "build_seconds": round(build_s, 2),
        "peak_rss_gb": round(rss_after_kb / 1e6, 2),
        "pre_build_rss_gb": round(rss_before_kb / 1e6, 2),
        "scan_backend": ac.stats()["last_backend"],
        "scan_mb_per_s": round(16 * 1024 * 1024 / t / 1e6, 2),
    }


def bench_bytes_overlapping_1gb(detail: dict) -> None:
    """BASELINE config-3 evidence: 50k random byte patterns,
    overlapping=True Standard matches over a 1 GB binary haystack, one
    chip.  Auto-routed through the public API — the recorded backend says
    which tier actually served it on this rig (the 1GB corpus amortizes
    the device-table upload, so this lands on the device tier when the
    TPU is reachable).
    """
    from ahocorasick_rs_tpu import BytesAhoCorasick

    rng = np.random.default_rng(31)
    pats = []
    seen = set()
    while len(pats) < 50_000:
        k = int(rng.integers(5, 12))
        p = bytes(rng.integers(0, 256, k, dtype=np.uint8))
        if p not in seen:
            seen.add(p)
            pats.append(p)
    t0 = time.perf_counter()
    ac = BytesAhoCorasick(pats)
    build_s = time.perf_counter() - t0
    n = 1 << 30
    hay = rng.integers(0, 256, n, dtype=np.uint8)
    # plant a few occurrences so the match pipeline is exercised
    for i in range(64):
        off = int(rng.integers(0, n - 16))
        p = pats[int(rng.integers(0, len(pats)))]
        hay[off : off + len(p)] = np.frombuffer(p, dtype=np.uint8)
    data = hay.tobytes()
    n_matches = len(ac.find_matches_as_indexes(data, overlapping=True))
    t0 = time.perf_counter()
    got = ac.find_matches_as_indexes(data, overlapping=True)
    seconds = time.perf_counter() - t0
    assert len(got) == n_matches
    detail["bytes_overlapping_1gb"] = {
        "patterns": len(pats),
        "states": ac.stats()["num_states"],
        "implementation": ac.stats()["implementation"],
        "build_seconds": round(build_s, 2),
        "haystack_gb": 1,
        "matches": n_matches,
        "scan_backend": ac.stats()["last_backend"],
        "scan_mb_per_s": round(n / seconds / 1e6, 2),
    }


def bench_match_dense(detail: dict) -> None:
    """Adversarial match-dense regime (VERDICT r4 weak #2): nested
    patterns ``a, aa, ..., a*64`` over 128MB of ``"a"`` — the occurrence
    set is 64x the haystack, where the occurrence-set engine would cost
    O(n * 64) memory.  The density guards must land this on the fused
    native resolver (O(output + max_len) memory, one pass).

    ``leftmost_longest`` is the headline number (output n/64 matches;
    resolver does O(occurrences) ring updates — the known cost of the
    shared-semantics design vs the reference's per-kind automata).
    ``standard`` is O(n log depth) time; measured at 16MB because its
    OUTPUT is O(n) tuples by API contract (the corpus is one giant run
    of the shortest pattern).
    """
    import resource

    from ahocorasick_rs_tpu import BytesAhoCorasick, MatchKind

    pats = [b"a" * k for k in range(1, 65)]
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    n = 128 << 20
    hay = b"a" * n
    ac = BytesAhoCorasick(pats, matchkind=MatchKind.LeftmostLongest)
    # cold call: the auto router explores the device tier once, hits the
    # MatchDenseError bailout, and records a device-EMA floor; the timed
    # call below is the steady state every later scan sees
    t0 = time.perf_counter()
    got = ac.find_matches_as_indexes(hay)
    cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = ac.find_matches_as_indexes(hay)
    seconds = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert len(got) == n // 64, len(got)
    entry = {
        "patterns": "a*1..a*64 (nested)",
        "haystack_mb": n >> 20,
        "occurrence_set_size": n * 64 - 64 * 63 // 2,
        "leftmost_longest": {
            "matches": len(got),
            "scan_backend": ac.stats()["last_backend"],
            "mb_per_s": round(n / seconds / 1e6, 2),
            "cold_first_scan_seconds": round(cold_s, 2),
            "peak_rss_delta_gb": round(max(0, rss1 - rss0) / 1e6, 3),
        },
    }
    n2 = 16 << 20
    hay2 = hay[:n2]
    ac2 = BytesAhoCorasick(pats)
    ac2.find_matches_as_indexes(hay2)  # cold: device explore + bailout
    t0 = time.perf_counter()
    got2 = ac2.find_matches_as_indexes(hay2)
    seconds = time.perf_counter() - t0
    assert len(got2) == n2, len(got2)
    entry["standard_16mb"] = {
        "matches": len(got2),
        "scan_backend": ac2.stats()["last_backend"],
        "mb_per_s": round(n2 / seconds / 1e6, 2),
        "note": "output is O(n) tuples by API contract on this corpus",
    }
    detail["match_dense"] = entry


def bench_sparse_device(detail: dict) -> None:
    """Forced sparse-CSR device kernel cost, on record (VERDICT r3 weak
    #7): auto-routing deliberately keeps NoncontiguousNFA scans on the
    host tiers; this is what a user gets by forcing ``backend="device"``
    on a sparse-engine matcher (binary-search goto + bounded failure
    walk, ops/scan_jax.py ``_scan_compact_sparse``).
    """
    from ahocorasick_rs_tpu import BytesAhoCorasick, Implementation

    rng = np.random.default_rng(55)
    pats = synth_names(1000, rng)
    ac = BytesAhoCorasick(
        pats,
        implementation=Implementation.NoncontiguousNFA,
        backend="device",
    )
    n = 16 << 20
    hay = synth_corpus(n, pats, rng)
    data = hay.tobytes()
    ac.find_matches_as_indexes(data)  # warm/compile
    t = _time_best(lambda: ac.find_matches_as_indexes(data), reps=2)
    detail["sparse_device_forced"] = {
        "patterns": len(pats),
        "haystack_mb": 16,
        "scan_backend": ac.stats()["last_backend"],
        "scan_mb_per_s": round(n / t / 1e6, 2),
    }


def main() -> None:
    try:
        from ahocorasick_rs_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass  # cache is a speedup, never a requirement

    rng = np.random.default_rng(1234)
    names = synth_names(PATTERNS, rng)
    n = HAYSTACK_MB << 20

    from ahocorasick_rs_tpu.models.automaton import build_automaton
    from ahocorasick_rs_tpu.models.prefilter import build_prefilter

    am = build_automaton(names)
    hay = synth_corpus(n, names, rng)
    detail: dict = {
        "haystack_mb": HAYSTACK_MB,
        "patterns": len(names),
        "states": am.num_states,
        "paths_run": [],
    }

    # --- host-native baseline (reference-equivalent CPU hot loop) ---
    from ahocorasick_rs_tpu.models import native

    baseline_gbps = None
    if native.available():
        native.scan_dense_native(am.delta, am.match_count, hay[: 1 << 20])
        t = _time_best(
            lambda: native.scan_dense_native(am.delta, am.match_count, hay),
            reps=2,
        )
        baseline_gbps = n / t / 1e9
        detail["cpu_native_gbps"] = round(baseline_gbps, 4)
        detail["paths_run"].append("cpu_native")
        # the framework's actual host tier: 16 interleaved halo'd lanes
        # per worker thread (the serial walk above stays the baseline —
        # it is the reference-equivalent hot loop)
        sc = native.DenseScanner(
            am.delta, am.match_count, halo=am.max_len - 1
        )
        sc.scan(hay[: 1 << 20])
        t = _time_best(lambda: sc.scan(hay), reps=2)
        detail["cpu_lanes_gbps"] = round(n / t / 1e9, 4)
        detail["paths_run"].append("cpu_lanes")

    plain_gbps = teddy_gbps = None
    matches = None
    try:
        import jax.numpy as jnp

        from ahocorasick_rs_tpu.ops import scan_jax
        from ahocorasick_rs_tpu.ops import resolve as R

        tables = scan_jax.DeviceTables(am, "dfa")
        halo = am.max_len - 1
        halo += halo & 1  # stride-2 needs even halo; harmless for stride-1
        L, T = scan_jax.choose_layout(n, halo)
        buf = np.zeros(L * T, dtype=np.uint8)
        buf[:n] = hay
        hay_dev = jnp.asarray(buf)
        cap = 1 << 16

        def plain_once(k: int = 0):
            _, _, total = scan_jax._scan_compact(
                tables.table, tables.classes, hay_dev, tables.match_count,
                jnp.int32(n - k), L, T, halo, cap, tables.use_classes,
            )
            return int(total)  # host fetch = real completion

        matches = plain_once()
        t = _time_best(lambda: plain_once(1))
        plain_gbps = n / t / 1e9
        detail["tpu_plain_scan_gbps"] = round(plain_gbps, 4)
        detail["matches"] = matches
        detail["paths_run"].append("tpu_plain")

        stride2_gbps = None
        if tables.ensure_packed2():

            def stride2_once(k: int = 0):
                _, _, total = scan_jax._scan_compact2(
                    tables.packed2, tables.table_classed, tables.classes2,
                    hay_dev, jnp.int32(n - k), L, T, halo, cap,
                )
                return int(total)

            m2 = stride2_once()
            assert m2 == matches, (m2, matches)
            t = _time_best(lambda: stride2_once(1))
            stride2_gbps = n / t / 1e9
            detail["tpu_stride2_scan_gbps"] = round(stride2_gbps, 4)
            detail["paths_run"].append("tpu_stride2")
            plain_gbps = max(plain_gbps, stride2_gbps)
        else:
            detail["tpu_stride2_scan_gbps"] = "skipped (packed2 over budget)"

        pf = build_prefilter(names)
        detail["prefilter"] = {
            "m": pf.m,
            "words": pf.words,
            "est_fire_rate": round(pf.est_fire_rate, 5),
        }
        from ahocorasick_rs_tpu.ops.scan_teddy import TeddyScanner

        scanner = TeddyScanner(
            am, pf, tables.table, tables.classes, tables.match_count,
            tables.use_classes,
        )
        hay2d = scanner.stage(hay)
        occ = scanner.occurrences(hay, hay2d=hay2d)  # compile + warm
        if occ is not None:
            got = R.resolve(*occ, kind="standard", overlapping=True)
            assert len(got) == matches, (len(got), matches)
            t = _time_best(lambda: scanner.occurrences(hay, hay2d=hay2d))
            teddy_gbps = n / t / 1e9
            detail["tpu_teddy_gbps"] = round(teddy_gbps, 4)
            detail["paths_run"].append("tpu_teddy")

            def teddy_e2e():
                h2 = scanner.stage(hay)
                return scanner.occurrences(hay, hay2d=h2)

            t = _time_best(teddy_e2e, reps=2)
            detail["tpu_teddy_end_to_end_gbps"] = round(n / t / 1e9, 4)
            # double-buffered streamed staging over 4 segments (the
            # user-visible large-corpus path; stage k+1 overlaps
            # compute k — measured 2.7x vs sequential in r5)
            big = np.concatenate([hay] * 4)
            t0 = time.perf_counter()
            occ_b = scanner.occurrences_streamed(big)
            tb = time.perf_counter() - t0
            if occ_b is not None:
                detail["tpu_teddy_e2e_256mb_streamed_gbps"] = round(
                    len(big) / tb / 1e9, 4
                )
        else:
            detail["tpu_teddy_gbps"] = "fallback (fire rate too high)"
    except Exception:
        detail["tpu_error"] = traceback.format_exc(limit=1).splitlines()[-1]

    try:
        bench_scenarios(detail)
    except Exception:
        detail["scenario_error"] = (
            traceback.format_exc(limit=1).splitlines()[-1]
        )

    for section in (
        bench_match_dense,
        bench_large_set,
        bench_million_set,
        bench_bytes_overlapping_1gb,
        bench_sparse_device,
    ):
        try:
            section(detail)
        except Exception:
            detail[section.__name__ + "_error"] = (
                traceback.format_exc(limit=1).splitlines()[-1]
            )

    candidates = [g for g in (plain_gbps, teddy_gbps) if g is not None]
    if candidates:
        value = max(candidates)
    else:
        value = baseline_gbps or 0.0
        detail["note"] = "TPU unavailable; reporting host-native throughput"
    vs_baseline = (
        round(value / baseline_gbps, 3) if baseline_gbps else None
    )
    print(
        json.dumps(
            {
                "metric": "dfa_scan_haystack_throughput_per_chip",
                "value": round(value, 4),
                "unit": "GB/s",
                "vs_baseline": vs_baseline,
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
