"""Round-3 measurement: new compaction + coarse Teddy verify, 16/64 MB."""
from __future__ import annotations

import time

import numpy as np
import jax.numpy as jnp

from bench import synth_names, synth_corpus
from ahocorasick_rs_tpu.models.automaton import build_automaton
from ahocorasick_rs_tpu.models.prefilter import build_prefilter
from ahocorasick_rs_tpu.ops import scan_jax
from ahocorasick_rs_tpu.ops import resolve as R
from ahocorasick_rs_tpu.ops.scan_teddy import TeddyScanner
from ahocorasick_rs_tpu.models import native


def t_best(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(1234)
    names = synth_names(1000, rng)
    am = build_automaton(names)
    pf = build_prefilter(names)
    print("states", am.num_states, "prefilter", pf.m, pf.words,
          round(pf.est_fire_rate, 4), flush=True)

    for MB in (16, 64):
        n = MB << 20
        hay = synth_corpus(n, names, rng)

        # native CPU baseline
        native.scan_dense_native(am.delta, am.match_count, hay[: 1 << 20])
        t = t_best(
            lambda: native.scan_dense_native(am.delta, am.match_count, hay),
            reps=2,
        )
        cpu = n / t / 1e9
        print(f"[{MB}MB] cpu_native {cpu:.4f} GB/s", flush=True)

        tables = scan_jax.DeviceTables(am, "dfa")
        scanner = TeddyScanner(
            am, pf, tables.table, tables.classes, tables.match_count,
            tables.use_classes,
        )
        hay2d = scanner.stage(hay)
        occ = scanner.occurrences(hay, hay2d=hay2d)
        assert occ is not None
        want = R.resolve(*occ, kind="standard", overlapping=True)
        # correctness cross-check vs native
        p, s = native.scan_dense_native(am.delta, am.match_count, hay)
        ref = R.resolve(*R.expand_occurrences(am, p, s),
                        kind="standard", overlapping=True)
        assert want == ref, (len(want), len(ref))
        t = t_best(lambda: scanner.occurrences(hay, hay2d=hay2d))
        print(f"[{MB}MB] teddy device-resident {n/t/1e9:.4f} GB/s "
              f"(matches {len(ref)}, fire_cap {scanner.fire_cap}, "
              f"match_cap {scanner.match_cap})", flush=True)

        # end-to-end including stage()
        def e2e():
            h2 = scanner.stage(hay)
            return scanner.occurrences(hay, hay2d=h2)

        t = t_best(e2e, reps=2)
        print(f"[{MB}MB] teddy end-to-end   {n/t/1e9:.4f} GB/s", flush=True)

        # plain scan with new compaction
        halo = am.max_len - 1
        halo += halo & 1
        L, T = scan_jax.choose_layout(n, halo)
        buf = np.zeros(L * T, dtype=np.uint8)
        buf[:n] = hay
        hd = jnp.asarray(buf)
        cap = 1 << 14

        def plain(k=0):
            _, _, tot = scan_jax._scan_compact(
                tables.table, tables.classes, hd, tables.match_count,
                jnp.int32(n - k), L, T, halo, cap, tables.use_classes)
            return int(tot)

        m = plain()
        t = t_best(lambda: plain(1))
        print(f"[{MB}MB] plain scan         {n/t/1e9:.4f} GB/s "
              f"(matched pos {m})", flush=True)

        if tables.ensure_packed2():
            def s2(k=0):
                _, _, tot = scan_jax._scan_compact2(
                    tables.packed2, tables.table_classed, tables.classes2,
                    hd, jnp.int32(n - k), L, T, halo, cap)
                return int(tot)

            m2 = s2()
            assert m2 == m, (m2, m)
            t = t_best(lambda: s2(1))
            print(f"[{MB}MB] stride2 scan       {n/t/1e9:.4f} GB/s",
                  flush=True)


if __name__ == "__main__":
    main()
