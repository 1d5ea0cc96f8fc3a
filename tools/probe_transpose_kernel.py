"""Feasibility probes for the transposed-layout fire kernel (round 4).

Questions, each answered by a tiny Pallas compile+run on the real TPU:
 1. Does a sublane-grouped reduction [R/16, 16, 128] -> max over axis=1
    compile in Mosaic (the in-kernel COARSE reduction in TRANSPOSED
    layout — the lane-dim variant was rejected in round 3)?
 2. Do sublane (axis-0) rolls work as the fingerprint-position shift?
 3. What does a device-side uint8 transpose of 64MB cost
    ([nblk, 128, R] -> [nblk, R, 128])?

Run AFTER probe_teddy_r4 (shares the tunnel).
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def t_best(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


R = 1024


def k_reduce(x_ref, o_ref):
    x = x_ref[:].astype(jnp.int32)  # [R, 128]
    g = jnp.max(x.reshape(R // 16, 16, 128), axis=1)
    o_ref[:] = g.astype(jnp.uint8)


def k_rollrows(x_ref, o_ref):
    x = x_ref[:].astype(jnp.int32)
    y = x & pltpu.roll(x, R - 1, 0)  # x[r] & x[r+1] (wrapping)
    o_ref[:] = y.astype(jnp.uint8)


def main():
    rng = np.random.default_rng(0)
    nblk = 32
    x = rng.integers(0, 256, (nblk * R, 128), dtype=np.uint8)
    xd = jnp.asarray(x)

    # 1. sublane-grouped reduce
    try:
        out = pl.pallas_call(
            k_reduce,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((R // 16, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblk * R // 16, 128),
                                           jnp.uint8),
        )(xd)
        got = np.asarray(out)
        want = x.reshape(nblk * R // 16, 16, 128).max(axis=1)
        print("reduce OK, correct:", bool((got == want).all()), flush=True)
        dt = t_best(lambda: np.asarray(pl.pallas_call(
            k_reduce,
            grid=(nblk,),
            in_specs=[pl.BlockSpec((R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R // 16, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblk * R // 16, 128),
                                           jnp.uint8),
        )(xd)[0]))
        print(f"reduce time ({nblk*R*128>>20}MB): {dt:.4f}", flush=True)
    except Exception as e:
        print("reduce FAILED:", str(e)[:300], flush=True)

    # 2. sublane roll
    try:
        out = pl.pallas_call(
            k_rollrows,
            grid=(nblk,),
            in_specs=[pl.BlockSpec((R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblk * R, 128), jnp.uint8),
        )(xd)
        got = np.asarray(out)
        xb = x.reshape(nblk, R, 128)
        want = (xb & np.roll(xb, -1, axis=1)).reshape(nblk * R, 128)
        print("rollrows OK, correct:", bool((got == want).all()),
              flush=True)
    except Exception as e:
        print("rollrows FAILED:", str(e)[:300], flush=True)

    # 3. device-side 64MB uint8 transpose
    n = 64 << 20
    Rb = 2048
    nb = n // (Rb * 128)
    h = jnp.asarray(rng.integers(0, 256, (nb, 128, Rb), dtype=np.uint8))

    @jax.jit
    def tr(h):
        return h.transpose(0, 2, 1).reshape(nb * Rb, 128)

    out = tr(h)
    _ = np.asarray(out[0])
    dt = t_best(lambda: np.asarray(tr(h)[0]))
    print(f"64MB u8 transpose: {dt:.4f}", flush=True)


def fire_R_sweep():
    """Does a larger fire-kernel block (fewer grid iterations) pay?

    ``_block_rows`` assumes ~49KB/row of live VMEM at m=6 w=4; actual
    live tiles are ~3.5KB/row, so R could be 8x larger.  Measure the
    real fire kernel at forced R values.
    """
    from bench import synth_names, synth_corpus
    from ahocorasick_rs_tpu.models.automaton import build_automaton
    from ahocorasick_rs_tpu.models.prefilter import build_prefilter
    from ahocorasick_rs_tpu.ops import scan_jax, scan_teddy

    N = 64 << 20
    rng = np.random.default_rng(1234)
    names = synth_names(1000, rng)
    am = build_automaton(names)
    pf = build_prefilter(names)
    hay = synth_corpus(N, names, rng)
    m, words, passes = pf.m, pf.words, pf.passes
    tables = scan_jax.DeviceTables(am, "dfa")
    sc = scan_teddy.TeddyScanner(
        am, pf, tables.table, tables.classes, tables.match_count,
        tables.use_classes,
    )
    h2 = sc.stage(hay)
    _ = np.asarray(h2[0])
    tabs = sc.tables
    orig = scan_teddy._block_rows
    for R in (256, 512, 1024, 2048):
        scan_teddy._block_rows = lambda *a, R=R: R

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

        try:
            fires = int(fire_only(tabs, h2))
            dt = t_best(lambda: int(fire_only(tabs, h2)))
            print(f"fire R={R}: {dt:.4f}  fires={fires}", flush=True)
        except Exception as e:
            print(f"fire R={R} FAILED: {str(e)[:200]}", flush=True)
    scan_teddy._block_rows = orig


if __name__ == "__main__":
    main()
    fire_R_sweep()
