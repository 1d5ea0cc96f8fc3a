"""One-off rig probe: what dominates the device scan time?

Times each stage in isolation (every timing ends in a host fetch).
Not part of the package; results feed PERF_NOTES.md.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

N = 64 << 20  # 64MB corpus


def t_best(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)

    from bench import synth_names, synth_corpus
    from ahocorasick_rs_tpu.models.automaton import build_automaton

    names = synth_names(1000, rng)
    am = build_automaton(names)
    hay = synth_corpus(N, names, rng)
    print("states", am.num_states, "classes", am.num_classes, flush=True)

    hay_dev = jnp.asarray(hay)
    hay_dev.block_until_ready()

    # ---- 0. mask construction (rare mask, ~0.5% true) ----
    mask_np = np.zeros(N, dtype=bool)
    mask_np[rng.integers(0, N, N // 200)] = True
    mask = jnp.asarray(mask_np)
    k = int(mask_np.sum())
    print("mask trues:", k, flush=True)
    cap = 1 << 19

    # ---- 1. nonzero(size=cap) over N ----
    @jax.jit
    def f_nonzero(m):
        p = jnp.nonzero(m, size=cap, fill_value=-1)[0]
        return p[0] + p[cap - 1]

    int(f_nonzero(mask))
    print("nonzero(64M, cap=512k):", t_best(lambda: int(f_nonzero(mask))),
          flush=True)

    # ---- 2. cumsum + scatter compaction ----
    @jax.jit
    def f_scatter(m):
        idx = jnp.arange(m.shape[0], dtype=jnp.int32)
        tgt = jnp.where(m, jnp.cumsum(m, dtype=jnp.int32) - 1, cap)
        out = jnp.full((cap + 1,), -1, jnp.int32).at[tgt].set(
            idx, mode="drop", unique_indices=True
        )
        return out[0] + out[cap - 1]

    int(f_scatter(mask))
    print("cumsum+scatter(64M, cap=512k):",
          t_best(lambda: int(f_scatter(mask))), flush=True)

    # ---- 2b. cumsum alone ----
    @jax.jit
    def f_cumsum(m):
        c = jnp.cumsum(m, dtype=jnp.int32)
        return c[-1]

    int(f_cumsum(mask))
    print("cumsum(64M):", t_best(lambda: int(f_cumsum(mask))), flush=True)

    # ---- 3. two-level: block-sum then small nonzero ----
    B = 4096

    @jax.jit
    def f_twolevel(m):
        m2 = m.reshape(-1, B)
        cnt = jnp.sum(m2, axis=1, dtype=jnp.int32)  # [N/B]
        c = jnp.cumsum(cnt)
        return c[-1]

    int(f_twolevel(mask))
    print("blocksum(64M,B=4096):", t_best(lambda: int(f_twolevel(mask))),
          flush=True)

    # ---- 4. stride2 scan floor: total-only (no compaction) ----
    from ahocorasick_rs_tpu.ops import scan_jax

    tables = scan_jax.DeviceTables(am, "dfa")
    halo = am.max_len - 1
    halo += halo & 1
    L, T = scan_jax.choose_layout(N, halo)
    print("layout L,T =", L, T, flush=True)
    buf = np.zeros(L * T, dtype=np.uint8)
    buf[:N] = hay
    hd = jnp.asarray(buf)
    hd.block_until_ready()

    if tables.ensure_packed2():
        @partial(jax.jit, static_argnames=("L", "T", "halo"))
        def f_scan2_total(packed2, classes, hay, n, L, T, halo):
            flat = hay.astype(jnp.int32)
            ext = classes[scan_jax.build_lanes(flat, L, T, halo, n)]
            C = tables.table_classed.shape[1]
            cc = ext[:, 0::2] * C + ext[:, 1::2]
            hp = halo // 2

            def body(states, col):
                v = packed2[states, col]
                return v >> 2, v & 3

            init = jnp.zeros((L,), jnp.int32)
            after_halo, _ = jax.lax.scan(body, init, cc[:, :hp].T)
            _, flags = jax.lax.scan(body, after_halo, cc[:, hp:].T)
            # count matched bytes without materialising per-byte order
            idx2 = jnp.arange(flags.T.size, dtype=jnp.int32)
            f = flags.T.reshape(-1)
            tot = jnp.sum(
                jnp.where(idx2 * 2 < n, f & 1, 0)
                + jnp.where(idx2 * 2 + 1 < n, f >> 1, 0),
                dtype=jnp.int32,
            )
            return tot

        g = lambda: int(f_scan2_total(
            tables.packed2, tables.classes2, hd, jnp.int32(N), L, T, halo))
        print("warm stride2 total-only...", flush=True)
        print("  matches:", g(), flush=True)
        dt = t_best(g)
        print("stride2 total-only(64M):", dt, "=", N / dt / 1e9, "GB/s",
              flush=True)

    # ---- 5. Teddy fire kernel floor: mask sum only ----
    from ahocorasick_rs_tpu.models.prefilter import build_prefilter
    from ahocorasick_rs_tpu.ops import scan_teddy

    pf = build_prefilter(names)
    print("prefilter m,words,est:", pf.m, pf.words, pf.est_fire_rate,
          flush=True)
    rows = N // 128
    hay2d = jnp.asarray(hay.reshape(rows, 128))
    hay2d.block_until_ready()
    tabs = jnp.asarray(pf.tables)

    @partial(jax.jit, static_argnames=("m", "words"))
    def f_fire_total(tabs, h2, m, words):
        mask = scan_teddy.fire_mask(tabs, h2, m, words, pf.passes)
        return jnp.sum(mask, dtype=jnp.int32)

    g2 = lambda: int(f_fire_total(tabs, hay2d, pf.m, pf.words))
    print("  fires:", g2(), flush=True)
    dt = t_best(g2)
    print("teddy fire total-only(64M):", dt, "=", N / dt / 1e9, "GB/s",
          flush=True)

    # ---- 6. device->host fetch bandwidth ----
    small = jnp.asarray(np.zeros(2 << 20, dtype=np.uint8))
    small.block_until_ready()
    dt = t_best(lambda: np.asarray(small).sum())
    print("fetch 2MB:", dt, "=", 2 / 1024 / dt, "GB/s", flush=True)

    # ---- 7. plain scan total-only (stride 1) ----
    @partial(jax.jit, static_argnames=("L", "T", "halo"))
    def f_scan1_total(table, hay, match_count, n, L, T, halo):
        flat = hay.astype(jnp.int32)
        ext = scan_jax.build_lanes(flat, L, T, halo, n)
        out = scan_jax.scan_lanes(table, ext, halo)
        fs = out.reshape(-1)
        idx = jnp.arange(L * T, dtype=jnp.int32)
        return jnp.sum((match_count[fs] > 0) & (idx < n), dtype=jnp.int32)

    g3 = lambda: int(f_scan1_total(
        tables.table, hd, tables.match_count, jnp.int32(N), L, T, halo))
    print("  matches:", g3(), flush=True)
    dt = t_best(g3)
    print("plain total-only(64M):", dt, "=", N / dt / 1e9, "GB/s", flush=True)


if __name__ == "__main__":
    main()
