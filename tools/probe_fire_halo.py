"""A/B the halo'd fire kernel vs the force-fire formulation on real TPU.

Measures, on the 64MB LONG-shaped corpus (the round-4 tuning corpus):
per-byte fire counts, fired COARSE groups, and the fused fire+verify
pipeline wall time, with ``USE_FIRE_HALO`` on and off — the evidence
artifact for VERDICT r4 item 4 (the force-fired wrap positions were ~13%
of fired groups, all re-paid in verify windows).

Also measures the double-buffered streamed path vs sequential
stage+dispatch on a 256MB corpus (VERDICT r4 item 5).

Run on the TPU rig: ``python tools/probe_fire_halo.py [--quick]``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--mb", type=int, default=64)
    args = ap.parse_args()

    from ahocorasick_rs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    from bench import synth_corpus, synth_names
    from ahocorasick_rs_tpu.models.automaton import build_automaton
    from ahocorasick_rs_tpu.models.prefilter import build_prefilter
    from ahocorasick_rs_tpu.ops import scan_teddy as T
    from ahocorasick_rs_tpu.ops.scan_jax import DeviceTables

    rng = np.random.default_rng(1234)
    names = synth_names(1000, rng)
    n = args.mb << 20
    hay = synth_corpus(n, names, rng)
    am = build_automaton(names)
    pf = build_prefilter(names)
    assert pf is not None
    tables = DeviceTables(am, "dfa")

    results = {}
    digests = {}
    for halo in (False, True):
        T.USE_FIRE_HALO = halo
        scanner = T.TeddyScanner(
            am, pf, tables.table, tables.classes, tables.match_count,
            tables.use_classes,
        )
        hay2d = scanner.stage(hay)
        # per-byte fire count + fired groups (diagnostics)
        rows_pp = 2 * pf.m * pf.words
        mask = None
        for p in range(pf.passes):
            sub = jax.lax.slice_in_dim(
                scanner.tables, p * rows_pp, (p + 1) * rows_pp, axis=0
            )
            mp = T.fire_mask(sub, hay2d, pf.m, pf.words, 1)
            mask = mp if mask is None else (mask & mp)
        fires = int(jnp.sum(mask.reshape(-1)[:n] != 0))
        G = mask.size // T.COARSE
        grp = jnp.max(mask.reshape(G, T.COARSE), axis=1)
        gidx = jnp.arange(G)
        fired_groups = int(
            jnp.sum((grp != 0) & (gidx * T.COARSE < n))
        )
        occ = scanner.occurrences(hay, hay2d=hay2d)  # warm/compile
        assert occ is not None
        digests[halo] = tuple(int(a.sum()) for a in occ) + tuple(
            len(a) for a in occ
        )
        best = float("inf")
        reps = 2 if args.quick else 4
        for _ in range(reps):
            t0 = time.perf_counter()
            scanner.occurrences(hay, hay2d=hay2d)
            best = min(best, time.perf_counter() - t0)
        results[halo] = {
            "per_byte_fires": fires,
            "fired_groups": fired_groups,
            "pipeline_ms": round(best * 1e3, 1),
            "gbps": round(n / best / 1e9, 4),
        }
        print(f"halo={halo}: {results[halo]}", flush=True)
    assert digests[False] == digests[True], (
        "halo kernel changed the occurrence set!",
        digests,
    )
    print("exactness: occurrence digests identical", flush=True)

    if not args.quick:
        # double-buffered streamed staging vs sequential (256MB)
        T.USE_FIRE_HALO = True
        scanner = T.TeddyScanner(
            am, pf, tables.table, tables.classes, tables.match_count,
            tables.use_classes,
        )
        big = np.concatenate([hay] * 4)
        nb = len(big)
        t0 = time.perf_counter()
        seq_parts = []
        W = am.max_len + T.COARSE - 1
        for s0 in range(0, nb, scanner.SEG_BYTES):
            win = big[s0 : min(nb, s0 + scanner.SEG_BYTES + W)]
            h2 = scanner.stage(win)
            occ = scanner.occurrences(win, hay2d=h2)
            seq_parts.append(occ)
        seq_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        occ_s = scanner.occurrences_streamed(big)
        stream_s = time.perf_counter() - t0
        print(
            {
                "e2e_256mb_sequential_s": round(seq_s, 2),
                "e2e_256mb_streamed_s": round(stream_s, 2),
                "sequential_gbps": round(nb / seq_s / 1e9, 4),
                "streamed_gbps": round(nb / stream_s / 1e9, 4),
            },
            flush=True,
        )


if __name__ == "__main__":
    main()
