"""Round-4 Teddy pipeline breakdown: where do the non-fire ms go?

Measures, device-resident at 64MB with the bench prefilter config:
  * fire-only (2 passes, AND, sum)
  * fire + coarsen (group max, no compaction)
  * fire + coarsen + compact_sparse
  * full fused pipeline (fire + compact + verify)
for COARSE in {16, 32, 64} (monkeypatched; each value is a fresh trace).

All timings end in a host fetch (tunnel block_until_ready lies).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ahocorasick_rs_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402

from bench import synth_names, synth_corpus  # noqa: E402
from ahocorasick_rs_tpu.models.automaton import build_automaton  # noqa: E402
from ahocorasick_rs_tpu.models.prefilter import build_prefilter  # noqa: E402
from ahocorasick_rs_tpu.ops import scan_jax, scan_teddy  # noqa: E402


def t_best(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    N = 64 << 20
    rng = np.random.default_rng(1234)
    names = synth_names(1000, rng)
    am = build_automaton(names)
    pf = build_prefilter(names)
    hay = synth_corpus(N, names, rng)
    m, words, passes = pf.m, pf.words, pf.passes
    print("pf", m, words, passes, flush=True)

    tables = scan_jax.DeviceTables(am, "dfa")
    sc = scan_teddy.TeddyScanner(
        am, pf, tables.table, tables.classes, tables.match_count,
        tables.use_classes,
    )
    h2 = sc.stage(hay)
    _ = np.asarray(h2[0])  # force staging complete
    tabs = sc.tables

    @jax.jit
    def fire_only(tabs, h2):
        rows_pp = 2 * m * words
        mask = None
        for p in range(passes):
            sub = jax.lax.slice_in_dim(
                tabs, p * rows_pp, (p + 1) * rows_pp, axis=0
            )
            mp = scan_teddy.fire_mask(sub, h2, m, words, 1)
            mask = mp if mask is None else (mask & mp)
        return jnp.sum(mask, dtype=jnp.int32)

    print("  fires/byte:", int(fire_only(tabs, h2)), flush=True)
    dt = t_best(lambda: int(fire_only(tabs, h2)))
    print("fire-only:", round(dt, 4), flush=True)

    @partial(jax.jit, static_argnames=("coarse",))
    def fire_coarsen(tabs, h2, n, coarse):
        rows_pp = 2 * m * words
        mask = None
        for p in range(passes):
            sub = jax.lax.slice_in_dim(
                tabs, p * rows_pp, (p + 1) * rows_pp, axis=0
            )
            mp = scan_teddy.fire_mask(sub, h2, m, words, 1)
            mask = mp if mask is None else (mask & mp)
        mask = mask.reshape(-1)
        G = mask.shape[0] // coarse
        grp = jnp.max(mask.reshape(G, coarse), axis=1)
        return jnp.sum(grp, dtype=jnp.int32)

    @partial(jax.jit, static_argnames=("coarse", "cap"))
    def fire_coarsen_compact(tabs, h2, n, coarse, cap):
        rows_pp = 2 * m * words
        mask = None
        for p in range(passes):
            sub = jax.lax.slice_in_dim(
                tabs, p * rows_pp, (p + 1) * rows_pp, axis=0
            )
            mp = scan_teddy.fire_mask(sub, h2, m, words, 1)
            mask = mp if mask is None else (mask & mp)
        mask = mask.reshape(-1)
        G = mask.shape[0] // coarse
        grp = jnp.max(mask.reshape(G, coarse), axis=1)
        gidx = jnp.arange(G, dtype=jnp.int32)
        fired = (grp != 0) & (gidx * coarse < n)
        fire_grp, ftotal = scan_jax.compact_sparse(fired, cap)
        return fire_grp[0] + ftotal

    for coarse in (16, 32, 64):
        g = int(fire_coarsen(tabs, h2, jnp.int32(N), coarse))
        dt = t_best(lambda: int(fire_coarsen(tabs, h2, jnp.int32(N), coarse)))
        print(f"fire+coarsen[{coarse}]: {dt:.4f}  fired_groups={g}",
              flush=True)
        int(fire_coarsen_compact(tabs, h2, jnp.int32(N), coarse, 16384))
        dt = t_best(
            lambda: int(
                fire_coarsen_compact(tabs, h2, jnp.int32(N), coarse, 16384)
            )
        )
        print(f"fire+coarsen+compact[{coarse}]: {dt:.4f}", flush=True)

    # full pipeline at each COARSE (monkeypatch; fresh scanner each time)
    for coarse in (16, 32, 64):
        scan_teddy.COARSE = coarse
        sc2 = scan_teddy.TeddyScanner(
            am, pf, tables.table, tables.classes, tables.match_count,
            tables.use_classes,
        )
        occ = sc2.occurrences(hay, hay2d=h2)
        if occ is None:
            print(f"full[{coarse}]: fell back", flush=True)
            continue
        dt = t_best(lambda: sc2.occurrences(hay, hay2d=h2))
        print(
            f"full[{coarse}]: {dt:.4f} = {N / dt / 1e9:.4f} GB/s  "
            f"(occ={len(occ[0])}, caps {sc2.fire_cap}/{sc2.match_cap})",
            flush=True,
        )
    scan_teddy.COARSE = 16


if __name__ == "__main__":
    main()
