"""Micro-probe: per-op costs of the Teddy verify building blocks."""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def t_best(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    N = 64 << 20
    M = 1 << 19  # 512k windows
    W = 26
    S, C = 6547, 28

    hay = jnp.asarray(rng.integers(0, 256, N, dtype=np.uint8))
    hay_pad = jnp.concatenate(
        [hay.astype(jnp.int32), jnp.zeros((W,), jnp.int32)]
    )
    pos = jnp.asarray(
        np.sort(rng.integers(0, N - W, M).astype(np.int32))
    )
    table = jnp.asarray(
        rng.integers(0, S, (S, 257), dtype=np.int32)
    )
    packed2 = jnp.asarray(
        rng.integers(0, S << 2, (S, C * C), dtype=np.int32)
    )
    classes = jnp.asarray(rng.integers(0, C - 1, 257, dtype=np.int32))
    mc = jnp.asarray(rng.integers(0, 2, S, dtype=np.int32))
    jax.block_until_ready((hay_pad, pos, table, packed2, classes, mc))

    # 1. element gather ext [M, W]
    @jax.jit
    def f_elem(hp, p):
        src = p[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        ext = hp[src]
        return ext.sum(dtype=jnp.int32)

    int(f_elem(hay_pad, pos))
    print("ext element-gather [512k,26]:", t_best(
        lambda: int(f_elem(hay_pad, pos))), flush=True)

    # 2. slice gather via vmap(dynamic_slice)
    @jax.jit
    def f_slice(hp, p):
        ext = jax.vmap(
            lambda q: jax.lax.dynamic_slice(hp, (q,), (W,))
        )(p)
        return ext.sum(dtype=jnp.int32)

    int(f_slice(hay_pad, pos))
    print("ext slice-gather  [512k,26]:", t_best(
        lambda: int(f_slice(hay_pad, pos))), flush=True)

    # 3. 26-step scan over table
    @jax.jit
    def f_scan26(tb, hp, p):
        src = p[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        ext = hp[src]

        def body(st, col):
            st = tb[st, col]
            return st, st

        _, out = jax.lax.scan(body, jnp.zeros((M,), jnp.int32), ext.T)
        return out.sum(dtype=jnp.int32)

    int(f_scan26(table, hay_pad, pos))
    print("ext + scan26 walk [512k]:", t_best(
        lambda: int(f_scan26(table, hay_pad, pos))), flush=True)

    # 4. classes + 13-step packed2 scan
    @jax.jit
    def f_scan13(p2, cls, hp, p):
        src = p[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        ext = cls[hp[src]]
        cc = ext[:, 0::2] * C + ext[:, 1::2]

        def body(st, col):
            v = p2[st, col]
            return (v >> 2) % S, v

        _, out = jax.lax.scan(body, jnp.zeros((M,), jnp.int32), cc.T)
        return out.sum(dtype=jnp.int32)

    int(f_scan13(packed2, classes, hay_pad, pos))
    print("ext + classes + scan13 packed2 [512k]:", t_best(
        lambda: int(f_scan13(packed2, classes, hay_pad, pos))), flush=True)

    # 5. match_count gather over [M, W] states
    states = jnp.asarray(
        rng.integers(0, S, (M, W), dtype=np.int32)
    )
    states.block_until_ready()

    @jax.jit
    def f_mc(m, st):
        return (m[st] > 0).sum(dtype=jnp.int32)

    int(f_mc(mc, states))
    print("match_count gather [512k,26]:", t_best(
        lambda: int(f_mc(mc, states))), flush=True)

    # 6. same scans at M=128k (the 16MB regime)
    M2 = 1 << 17
    pos2 = pos[:M2]

    @jax.jit
    def f_scan26b(tb, hp, p):
        src = p[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        ext = hp[src]

        def body(st, col):
            st = tb[st, col]
            return st, st

        _, out = jax.lax.scan(body, jnp.zeros((M2,), jnp.int32), ext.T)
        return out.sum(dtype=jnp.int32)

    int(f_scan26b(table, hay_pad, pos2))
    print("ext + scan26 walk [128k]:", t_best(
        lambda: int(f_scan26b(table, hay_pad, pos2))), flush=True)

    # 7. fire-mask coarsen + nonzero(4M)
    mask = jnp.asarray(rng.integers(0, 2, N, dtype=np.uint8))
    mask.block_until_ready()

    @jax.jit
    def f_coarse(mk):
        g = jnp.max(mk.reshape(-1, 16), axis=1)
        fired = g != 0
        idx = jnp.nonzero(fired, size=1 << 19, fill_value=-1)[0]
        return idx[0] + idx[-1]

    int(f_coarse(mask))
    print("coarsen+nonzero(4M, cap512k):", t_best(
        lambda: int(f_coarse(mask))), flush=True)


if __name__ == "__main__":
    main()
