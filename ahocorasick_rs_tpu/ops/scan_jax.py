"""Device (XLA/TPU) scan tier.

Single-chip JAX formulation of the halo'd lane scan (see ``scan_host.py`` for
the exactness argument).  The haystack is laid out as ``L`` independent
lanes, each prefixed with ``max_len - 1`` bytes of left context; one
``lax.scan`` over the time axis advances all lanes with a single vectorized
table gather per step — the device analogue of the reference's
one-lookup-per-byte hot loop (/root/reference/src/lib.rs:240-246).

Match output is compacted on device to a fixed-capacity ``(positions,
states)`` buffer plus an exact total count; the caller retries with a larger
capacity on overflow (SURVEY.md §7 "ragged match output" plan), so only
O(matches) bytes cross the device→host boundary, never the O(n) state
stream.

Shapes are bucketed (lane count fixed, time axis rounded up to a power of
two) so hypothesis-style workloads don't compile a kernel per length.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..models.automaton import Automaton, PAD_BYTE
from .scan_host import make_lanes

#: default lane count for the single-chip device scan.
DEFAULT_LANES = 1024
#: haystack bytes per device segment; larger inputs stream through
#: independent halo'd segments, bounding HBM for the [L, T] state buffer.
SEGMENT_BYTES = 64 << 20


@partial(jax.jit, static_argnames=("halo", "cap", "use_classes"))
def _scan_compact(table, classes, ext, match_count, n, halo, cap, use_classes):
    """Scan halo'd lanes and compact matched (position, state) pairs.

    ext: int32 [L, halo + T]; returns (positions[cap], states[cap], total).
    Positions are global 0-based byte indexes (lane-major layout), -1 fill.
    """
    L, HT = ext.shape
    T = HT - halo
    if use_classes:
        ext = classes[ext]

    def body(states, col):
        states = table[states, col]
        return states, states

    init = jnp.zeros((L,), jnp.int32)
    if halo:
        states, _ = jax.lax.scan(body, init, ext[:, :halo].T)
    else:
        states = init
    _, out = jax.lax.scan(body, states, ext[:, halo:].T)  # [T, L]
    flat = out.T.reshape(-1)  # lane-major == global position order
    idx = jnp.arange(L * T, dtype=jnp.int32)
    matched = (match_count[flat] > 0) & (idx < n)
    total = jnp.sum(matched, dtype=jnp.int32)
    positions = jnp.nonzero(matched, size=cap, fill_value=-1)[0].astype(
        jnp.int32
    )
    states_at = jnp.where(positions >= 0, flat[jnp.maximum(positions, 0)], -1)
    return positions, states_at, total


class DeviceTables:
    """Per-automaton cache of device-resident tables."""

    def __init__(self, am: Automaton, engine: str):
        self.engine = engine
        if engine == "dfa":
            self.table = jnp.asarray(am.delta)
            self.classes = jnp.zeros((257,), jnp.int32)  # unused placeholder
            self.use_classes = False
        else:  # byte-classed (ContiguousNFA analogue)
            self.table = jnp.asarray(am.delta_classed)
            self.classes = jnp.asarray(am.byte_classes)
            self.use_classes = True
        self.match_count = jnp.asarray(am.match_count)


def _bucket(x: int, lo: int = 16) -> int:
    b = lo
    while b < x:
        b <<= 1
    return b


def scan_device(
    am: Automaton,
    hay: np.ndarray,
    tables: DeviceTables,
    *,
    num_lanes: int = DEFAULT_LANES,
    segment_bytes: int = SEGMENT_BYTES,
) -> tuple[np.ndarray, np.ndarray]:
    """Scan ``hay`` (uint8 ndarray) on the default JAX device.

    Streams large haystacks through independent halo'd segments; within a
    segment runs the bucketed lane scan with overflow-retry compaction.
    Returns global (positions, states) as int64 NumPy arrays.
    """
    n = len(hay)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    halo = am.max_len - 1
    all_pos: list[np.ndarray] = []
    all_states: list[np.ndarray] = []
    seg = max(segment_bytes, 2 * max(1, halo))
    for seg_start in range(0, n, seg):
        seg_end = min(n, seg_start + seg)
        ctx_start = max(0, seg_start - halo)
        chunk = np.asarray(hay[ctx_start:seg_end], dtype=np.int32)
        drop = seg_start - ctx_start  # leading context positions to discard
        m = len(chunk)
        L = max(1, min(num_lanes, -(-m // max(128, halo))))
        T = _bucket(-(-m // L))
        # Pad the chunk to exactly L*T so lane l covers flat positions
        # [l*T, (l+1)*T) and flat index == chunk position.
        chunk_padded = np.full(L * T, PAD_BYTE, dtype=np.int32)
        chunk_padded[:m] = chunk
        ext, _ = make_lanes(chunk_padded, L, halo)
        ext_d = jnp.asarray(ext)
        cap = 4096
        while True:
            pos, st, total = _scan_compact(
                tables.table,
                tables.classes,
                ext_d,
                tables.match_count,
                jnp.int32(m),
                halo,
                cap,
                tables.use_classes,
            )
            total = int(total)
            if total <= cap:
                break
            cap = _bucket(total, lo=4096)
        pos = np.asarray(pos[:total], dtype=np.int64)
        st = np.asarray(st[:total], dtype=np.int64)
        keep = pos >= drop
        all_pos.append(pos[keep] - drop + seg_start)
        all_states.append(st[keep])
    positions = np.concatenate(all_pos) if all_pos else np.zeros(0, np.int64)
    states = np.concatenate(all_states) if all_states else np.zeros(0, np.int64)
    return positions, states
