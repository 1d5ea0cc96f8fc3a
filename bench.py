"""Benchmark: DFA scan throughput (haystack GB/s/chip) on the attached TPU.

Mirrors the reference's LONG benchmark recipe
(/root/reference/benchmarks/test_comparison.py:16-34: ~4k lowercase name
patterns, long haystacks, ~1-in-90 lines containing a name) with a
synthetically generated corpus, then measures:

* ``value`` — sustained device-kernel throughput (lane build + DFA scan +
  on-device match compaction) over device-resident data: the north-star
  "haystack GB/s/chip" of BASELINE.json.
* ``vs_baseline`` — speedup over the host (NumPy vectorized lanes) tier
  running the same automaton, standing in for an optimized CPU
  implementation.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import string
import time

import numpy as np

HAYSTACK_MB = 256
REPS = 5


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
    hit_lines = rng.integers(0, n_lines, n_lines // 90)
    for ln in hit_lines:
        name = names[int(rng.integers(0, len(names)))]
        off = int(ln) * line_len + int(rng.integers(0, line_len - 12))
        corpus[off : off + len(name)] = np.frombuffer(name, dtype=np.uint8)
    return corpus


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ahocorasick_rs_tpu.models.automaton import build_automaton
    from ahocorasick_rs_tpu.ops import scan_jax
    from ahocorasick_rs_tpu.ops.scan_host import scan_numpy_lanes

    rng = np.random.default_rng(1234)
    names = synth_names(4000, rng)
    am = build_automaton(names)
    n = HAYSTACK_MB << 20
    hay = synth_corpus(n, names, rng)

    tables = scan_jax.DeviceTables(am, "dfa")
    halo = am.max_len - 1
    L, T = scan_jax.choose_layout(n, halo)
    buf = np.zeros(L * T, dtype=np.uint8)
    buf[:n] = hay
    hay_dev = jax.device_put(jnp.asarray(buf))
    cap = 1 << 22

    def run():
        return scan_jax._scan_compact(
            tables.table,
            tables.classes,
            hay_dev,
            tables.match_count,
            jnp.int32(n),
            L,
            T,
            halo,
            cap,
            tables.use_classes,
        )

    pos, st, total = run()  # compile + warm
    jax.block_until_ready((pos, st, total))
    n_matches = int(total)
    assert n_matches > 0, "benchmark corpus produced no matches"
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = run()
    jax.block_until_ready(out)
    device_gbps = n * REPS / (time.perf_counter() - t0) / 1e9

    # host-tier baseline on a slice, extrapolated
    base_n = 8 << 20
    t0 = time.perf_counter()
    scan_numpy_lanes(am, hay[:base_n], num_lanes=512)
    host_gbps = base_n / (time.perf_counter() - t0) / 1e9

    print(
        json.dumps(
            {
                "metric": "dfa_scan_haystack_throughput_per_chip",
                "value": round(device_gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(device_gbps / host_gbps, 1),
                "detail": {
                    "haystack_mb": HAYSTACK_MB,
                    "patterns": len(names),
                    "states": am.num_states,
                    "matches": n_matches,
                    "host_numpy_gbps": round(host_gbps, 3),
                    "lanes": L,
                    "time_axis": T,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
