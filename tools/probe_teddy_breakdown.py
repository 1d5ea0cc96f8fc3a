"""Where do the Teddy pipeline's milliseconds go? (device-resident, 64MB)"""
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
    print("pf", pf.m, pf.words, pf.passes, flush=True)

    tables = scan_jax.DeviceTables(am, "dfa")
    sc = scan_teddy.TeddyScanner(
        am, pf, tables.table, tables.classes, tables.match_count,
        tables.use_classes,
    )
    h2 = sc.stage(hay)
    h2.block_until_ready()
    m, words, passes = pf.m, pf.words, pf.passes
    tabs = sc.tables

    # fire only (both passes, AND, sum)
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

    print("  fires:", int(fire_only(tabs, h2)), flush=True)
    dt = t_best(lambda: int(fire_only(tabs, h2)))
    print("fire-only (2 passes):", round(dt, 4), "=",
          round(N / dt / 1e9, 4), "GB/s", flush=True)

    # single pass fire
    @jax.jit
    def fire_one(tabs, h2):
        sub = jax.lax.slice_in_dim(tabs, 0, 2 * m * words, axis=0)
        return jnp.sum(
            scan_teddy.fire_mask(sub, h2, m, words, 1), dtype=jnp.int32
        )

    int(fire_one(tabs, h2))
    dt = t_best(lambda: int(fire_one(tabs, h2)))
    print("fire-only (1 pass):  ", round(dt, 4), flush=True)

    # fire + coarsen + compact (no verify)
    @partial(jax.jit, static_argnames=("cap",))
    def fire_compact(tabs, h2, n, cap):
        rows_pp = 2 * m * words
        mask = None
        for p in range(passes):
            sub = jax.lax.slice_in_dim(
                tabs, p * rows_pp, (p + 1) * rows_pp, axis=0
            )
            mp = scan_teddy.fire_mask(sub, h2, m, words, 1)
            mask = mp if mask is None else (mask & mp)
        mask = mask.reshape(-1)
        G = mask.shape[0] // scan_teddy.COARSE
        grp = jnp.max(mask.reshape(G, scan_teddy.COARSE), axis=1)
        gidx = jnp.arange(G, dtype=jnp.int32)
        fired = (grp != 0) & (gidx * scan_teddy.COARSE < n)
        fire_grp, ftotal = scan_jax.compact_sparse(fired, cap)
        return fire_grp[0] + ftotal

    int(fire_compact(tabs, h2, jnp.int32(N), 16384))
    dt = t_best(lambda: int(fire_compact(tabs, h2, jnp.int32(N), 16384)))
    print("fire+coarsen+compact:", round(dt, 4), flush=True)

    # full pipeline
    occ = sc.occurrences(hay, hay2d=h2)
    print("  occ:", len(occ[0]), "caps", sc.fire_cap, sc.match_cap,
          flush=True)
    dt = t_best(lambda: sc.occurrences(hay, hay2d=h2))
    print("full occurrences:    ", round(dt, 4), "=",
          round(N / dt / 1e9, 4), "GB/s", flush=True)


if __name__ == "__main__":
    main()
