"""Device (XLA/TPU) scan tier.

Single-chip JAX formulation of the halo'd lane scan (see ``scan_host.py`` for
the exactness argument).  The haystack crosses to the device as raw ``uint8``
(measured: host→device bandwidth is the scarcest resource); everything else
happens in one jitted computation:

1. **Lane build**: widen to int32, mark the padded tail with ``PAD_BYTE``,
   and materialise ``[L, halo + T]`` lanes where lane ``l``'s halo is the
   ``halo`` bytes preceding its segment.  The halo block is a reshape trick —
   ``concat([PAD*halo, flat])[:L*T].reshape(L, T)[:, :halo]`` — no gather.
2. **Scan**: ``lax.scan`` over the time axis; each step advances all ``L``
   lanes with one vectorized table gather (the device analogue of the
   reference's one-lookup-per-byte loop, /root/reference/src/lib.rs:240-246).
   TPU sustains hundreds of giga-lookups/s here, so wide-and-short layouts
   win: lanes are sized so the time axis stays in the hundreds.
3. **Compaction**: matched ``(position, state)`` pairs are compacted on
   device into a fixed-capacity buffer plus an exact count; the caller
   retries with a larger capacity on overflow (SURVEY.md §7 ragged-output
   plan).  Only O(matches) bytes ever return to the host — never the O(n)
   state stream.

Shapes are bucketed (power-of-two time axis, fixed lane count per bucket) so
varying haystack lengths reuse compiled kernels.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..models.automaton import Automaton, PAD_BYTE
from .resolve import MatchDenseError

#: target time-axis length; lanes are derived from it.  Short-and-wide
#: layouts amortize per-step overhead (measured optimum T ≈ 256–1024).
TARGET_TIME = 512
#: lane-count bounds for the single-chip scan.
MIN_LANES = 8
MAX_LANES = 1 << 16
#: haystack bytes per device segment; larger inputs stream through
#: independent halo'd segments, bounding HBM for the [T, L] state buffer.
SEGMENT_BYTES = 256 << 20
#: compaction-overflow totals past max(this, segment/8) raise
#: :class:`~..ops.resolve.MatchDenseError` instead of growing the cap
#: toward the segment length (density bailout; api._find re-routes)
DENSE_BAILOUT_MIN = 1 << 22


def build_lanes(
    flat: jax.Array, L: int, T: int, halo: int, n: jax.Array | int
) -> jax.Array:
    """In-jit halo'd lane construction from a flat int32 byte stream.

    ``flat`` has length ``L*T``; positions >= ``n`` are forced to
    ``PAD_BYTE`` (whose transition column is all-root).  Requires
    ``halo <= T``.
    """
    idx = jnp.arange(L * T, dtype=jnp.int32)
    flat = jnp.where(idx < n, flat, PAD_BYTE)
    pf = jnp.concatenate(
        [jnp.full((halo,), PAD_BYTE, jnp.int32), flat]
    )
    halos = pf[: L * T].reshape(L, T)[:, :halo]
    return jnp.concatenate([halos, flat.reshape(L, T)], axis=1)


def scan_lanes(table: jax.Array, ext: jax.Array, halo: int) -> jax.Array:
    """Advance all lanes over ``ext``; returns the state stream ``[L, T]``."""

    def body(
        states: jax.Array, col: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        states = table[states, col]
        return states, states

    init = jnp.zeros_like(ext[:, 0])
    if halo:
        states, _ = jax.lax.scan(body, init, ext[:, :halo].T)
    else:
        states = init
    _, out = jax.lax.scan(body, states, ext[:, halo:].T)
    return out.T  # [L, T]


#: bytes per block of the two-level sparse compaction
COMPACT_BLOCK = 512


def compact_sparse(mask: jax.Array, cap: int,
                   block: int = COMPACT_BLOCK) -> tuple[jax.Array, jax.Array]:
    """Ascending indexes of the True elements of a rare boolean mask.

    The direct ``jnp.nonzero(size=cap)`` lowering is top_k-like and costs
    ~10 ms/MB on this fabric (measured, PERF_NOTES.md) — it dominated every
    scan path in rounds 1-2.  This two-level scheme is bandwidth-bound
    instead: per-block counts (a cheap reduction over the whole mask), a
    small ``nonzero`` over the fired *blocks*, then rank-and-scatter over
    the selected blocks only.  Work beyond the reduction scales with
    ``cap * block``, not the mask size.

    Returns ``(idx[cap] int32 (-1 padded), total)``; ``idx`` is only
    trustworthy when ``total <= cap`` (the caller's overflow-retry
    protocol).  Since every fired block holds >= 1 match, fired blocks
    never exceed ``total``, so a single capacity covers both levels.
    """
    mask = mask.astype(bool)
    N = mask.shape[0]
    pad = (-N) % block
    if pad:
        mask = jnp.concatenate(
            [mask, jnp.zeros((pad,), dtype=mask.dtype)]
        )
    Nb = (N + pad) // block
    m2 = mask.reshape(Nb, block)
    cnt = jnp.sum(m2, axis=1, dtype=jnp.int32)
    total = jnp.sum(cnt)
    fired = cnt > 0
    blk = jnp.nonzero(fired, size=min(cap, Nb), fill_value=Nb)[0].astype(
        jnp.int32
    )
    valid = blk < Nb
    safe = jnp.where(valid, blk, 0)
    rows = m2[safe] & valid[:, None]
    scnt = jnp.sum(rows, axis=1, dtype=jnp.int32)
    offs = jnp.cumsum(scnt) - scnt
    rank = jnp.cumsum(rows, axis=1, dtype=jnp.int32) - rows
    tgt = jnp.where(rows, offs[:, None] + rank, cap)
    pos = safe[:, None] * block + jnp.arange(block, dtype=jnp.int32)[None, :]
    idx = (
        jnp.full((cap,), -1, jnp.int32)
        .at[tgt.reshape(-1)]
        .set(pos.reshape(-1), mode="drop")
    )
    return idx, total


@partial(
    jax.jit,
    static_argnames=("L", "T", "halo", "cap", "use_classes"),
)
def _scan_compact(
    table: jax.Array,
    classes: jax.Array,
    hay: jax.Array,
    match_count: jax.Array,
    n: jax.Array,
    L: int,
    T: int,
    halo: int,
    cap: int,
    use_classes: bool,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """uint8 haystack [L*T] → compacted (positions[cap], states[cap], total)."""
    flat = hay.astype(jnp.int32)
    if use_classes:
        # classes[PAD_BYTE] is the dedicated padding class, so mapping
        # before lane-build requires mapping PAD after masking; map the
        # ext instead.
        ext = build_lanes(flat, L, T, halo, n)
        ext = classes[ext]
    else:
        ext = build_lanes(flat, L, T, halo, n)
    out = scan_lanes(table, ext, halo)
    flat_s = out.reshape(-1)
    idx = jnp.arange(L * T, dtype=jnp.int32)
    matched = (match_count[flat_s] > 0) & (idx < n)
    positions, total = compact_sparse(matched, cap)
    states_at = jnp.where(
        positions >= 0, flat_s[jnp.maximum(positions, 0)], -1
    )
    return positions, states_at, total


@partial(jax.jit, static_argnames=("cap", "use_classes"))
def _scan_batch_compact(
    table: jax.Array,
    classes: jax.Array,
    hay2d: jax.Array,
    lens: jax.Array,
    match_count: jax.Array,
    cap: int,
    use_classes: bool,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched scan: one document per lane, no halo (each starts at root).

    ``hay2d`` is uint8 ``[B, T]`` (zero-padded documents), ``lens`` int32
    ``[B]``.  This is the device path for the reference's actual benchmark
    workload — tens of thousands of ~70-600 char haystacks
    (/root/reference/benchmarks/test_comparison.py:16-53) — which the
    per-call streaming scan can never serve (per-dispatch latency ~30ms).
    Returns compacted flat (lane*T + t) positions, states and the total.
    """
    B, T = hay2d.shape
    col = jnp.arange(T, dtype=jnp.int32)[None, :]
    ext = jnp.where(col < lens[:, None], hay2d.astype(jnp.int32), PAD_BYTE)
    if use_classes:
        ext = classes[ext]

    def body(
        states: jax.Array, c: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        states = table[states, c]
        return states, states

    _, out = jax.lax.scan(body, jnp.zeros((B,), jnp.int32), ext.T)
    flat_s = out.T.reshape(-1)
    valid = (col < lens[:, None]).reshape(-1)
    matched = (match_count[flat_s] > 0) & valid
    positions, total = compact_sparse(matched, cap)
    states_at = jnp.where(
        positions >= 0, flat_s[jnp.maximum(positions, 0)], -1
    )
    return positions, states_at, total


def scan_device_batch(
    am: Automaton,
    docs: list,
    tables: "DeviceTables",
) -> tuple[np.ndarray, np.ndarray, int]:
    """Scan many small documents in one device dispatch.

    Returns flat ascending ``(positions, states, T)`` where document ``i``
    occupies positions ``[i*T, i*T + len(doc_i))`` — the layout
    ``ops.resolve.resolve_batch`` consumes directly.
    """
    B = len(docs)
    if B == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), 1
    Tmax = max((len(d) for d in docs), default=1)
    T = _bucket(max(Tmax, 16), lo=16)
    Bb = _bucket(max(B, MIN_LANES), lo=MIN_LANES)
    buf = np.zeros((Bb, T), dtype=np.uint8)
    lens = np.zeros(Bb, dtype=np.int32)
    for i, d in enumerate(docs):
        buf[i, : len(d)] = d
        lens[i] = len(d)
    hay2d = jnp.asarray(buf)
    lens_dev = jnp.asarray(lens)
    cap = tables.last_cap
    while True:
        pos, st, total = jax.device_get(
            _scan_batch_compact(
                tables.table,
                tables.classes,
                hay2d,
                lens_dev,
                tables.match_count,
                cap,
                tables.use_classes,
            )
        )
        total = int(total)
        if total <= cap:
            break
        if total > max(DENSE_BAILOUT_MIN, (Bb * T) // 8):
            # density bailout, same contract as scan_device: the host
            # resolve paths own the match-dense regime (api._find_batch)
            raise MatchDenseError(
                f"{total} matched positions in a {Bb}x{T} batch"
            )
        cap = _bucket(total, lo=4096)
    tables.last_cap = max(4096, _bucket(max(total, 1), lo=4096))
    return pos[:total].astype(np.int64), st[:total].astype(np.int64), T


#: build the stride-2 packed table when it fits in this many bytes.
PACKED2_MAX_BYTES = 256 << 20


@partial(jax.jit, static_argnames=("L", "T", "halo", "cap"))
def _scan_compact2(
    packed2: jax.Array,
    table_classed: jax.Array,
    classes: jax.Array,
    hay: jax.Array,
    n: jax.Array,
    L: int,
    T: int,
    halo: int,
    cap: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Stride-2 scan: two haystack bytes per table gather.

    ``packed2[s, c1*C+c2]`` carries the two-byte-composed next state plus
    per-pair match flags (``Automaton.packed2``), so the hot loop does half
    the gathers of the plain scan *and* needs no post-scan ``match_count``
    gather over the O(n) state stream.  Intermediate (mid-pair) states are
    reconstructed only at matched positions — O(matches) extra lookups.
    ``halo`` and ``T`` must be even so pairs align across the halo boundary.
    """
    flat = hay.astype(jnp.int32)
    ext = classes[build_lanes(flat, L, T, halo, n)]  # [L, halo+T] class ids
    C = table_classed.shape[1]
    cc = ext[:, 0::2] * C + ext[:, 1::2]  # [L, (halo+T)//2]
    hp = halo // 2

    def body(
        states: jax.Array, col: jax.Array
    ) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
        v = packed2[states, col]
        s = v >> 2
        return s, (s, v & 3)

    init = jnp.zeros((L,), jnp.int32)
    if hp:
        after_halo, _ = jax.lax.scan(body, init, cc[:, :hp].T)
    else:
        after_halo = init
    _, (end_states, flags) = jax.lax.scan(body, after_halo, cc[:, hp:].T)
    end_states = end_states.T  # [L, T//2] state after each pair
    flags = flags.T

    idx = jnp.arange(L * T, dtype=jnp.int32)
    # interleave (mid, end) flags back to per-byte order
    mask2 = jnp.stack([flags & 1, flags >> 1], axis=-1).reshape(L * T)
    matched = (mask2 > 0) & (idx < n)
    positions, total = compact_sparse(matched, cap)
    pos_safe = jnp.maximum(positions, 0)
    pair = pos_safe >> 1
    flat_end = end_states.reshape(-1)
    # state entering each pair: previous pair's end state (lane-local)
    prev = jnp.concatenate(
        [after_halo[:, None], end_states[:, :-1]], axis=1
    ).reshape(-1)
    body_cls = ext[:, halo:].reshape(-1)
    mid_states = table_classed[prev[pair], body_cls[pair * 2]]
    states_at = jnp.where((pos_safe & 1) == 1, flat_end[pair], mid_states)
    states_at = jnp.where(positions >= 0, states_at, -1)
    return positions, states_at, total


@partial(jax.jit, static_argnames=("L", "T", "halo", "cap"))
def _scan_compact_sparse(
    keys: jax.Array,
    targets: jax.Array,
    fail: jax.Array,
    match_count: jax.Array,
    hay: jax.Array,
    n: jax.Array,
    L: int,
    T: int,
    halo: int,
    cap: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sparse-CSR lane scan: binary-search goto + vectorized failure walk.

    The NoncontiguousNFA engine's device path (reference contract:
    fastest build / smallest memory / slowest search,
    /root/reference/README.md:173-177).  Per step every lane resolves its
    transition by ``searchsorted`` over the sorted edge keys
    (``state * 257 + byte``); unresolved lanes walk their failure links
    inside a ``lax.while_loop`` whose trip count is bounded by the trie
    depth.  O(log E) gathers per lane-step — an order of magnitude slower
    than the dense gather scan, but it serves automata whose dense/classed
    tables exceed the device budget (BASELINE config 5: ~1M patterns).
    """
    E = keys.shape[0]
    flat = hay.astype(jnp.int32)
    ext = build_lanes(flat, L, T, halo, n)

    def resolve(
        states: jax.Array, col: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        col64 = col.astype(jnp.int64)
        Carry = tuple[jax.Array, jax.Array, jax.Array]

        def cond(carry: Carry) -> jax.Array:
            _, done, _ = carry
            return ~jnp.all(done)

        def body(carry: Carry) -> Carry:
            st, done, res = carry
            key = st.astype(jnp.int64) * 257 + col64
            j = jnp.searchsorted(keys, key)
            j_c = jnp.minimum(j, max(E - 1, 0))
            found = (j < E) & (keys[j_c] == key) if E else jnp.zeros_like(
                done
            )
            res = jnp.where(~done & found, targets[j_c], res)
            at_root_miss = ~done & ~found & (st == 0)
            res = jnp.where(at_root_miss, 0, res)
            done2 = done | found | at_root_miss
            st = jnp.where(done2, st, fail[st])
            return st, done2, res

        init = (
            states,
            jnp.zeros(states.shape, dtype=bool),
            jnp.zeros_like(states),
        )
        _, _, res = jax.lax.while_loop(cond, body, init)
        return res, res

    init = jnp.zeros((L,), jnp.int32)
    if halo:
        states, _ = jax.lax.scan(resolve, init, ext[:, :halo].T)
    else:
        states = init
    _, out = jax.lax.scan(resolve, states, ext[:, halo:].T)
    flat_s = out.T.reshape(-1)
    idx = jnp.arange(L * T, dtype=jnp.int32)
    matched = (match_count[flat_s] > 0) & (idx < n)
    positions, total = compact_sparse(matched, cap)
    states_at = jnp.where(
        positions >= 0, flat_s[jnp.maximum(positions, 0)], -1
    )
    return positions, states_at, total


class DeviceTables:
    """Per-automaton cache of device-resident tables + scan state."""

    def __init__(self, am: Automaton, engine: str,
                 packed2_max_bytes: int = PACKED2_MAX_BYTES) -> None:
        self.engine = engine
        self.keys = self.targets = self.fail = None
        if engine == "dfa":
            self.table = jnp.asarray(am.delta)
            self.classes = jnp.zeros((257,), jnp.int32)  # unused placeholder
            self.use_classes = False
        elif engine == "classed":  # byte-classed (ContiguousNFA analogue)
            self.table = jnp.asarray(am.delta_classed)
            self.classes = jnp.asarray(am.byte_classes)
            self.use_classes = True
        else:  # sparse CSR (NoncontiguousNFA analogue)
            keys, targets, fail = am.sparse
            self.keys = jnp.asarray(keys)
            self.targets = jnp.asarray(targets)
            self.fail = jnp.asarray(fail)
            self.table = None
            self.classes = jnp.zeros((257,), jnp.int32)
            self.use_classes = False
        self.match_count = jnp.asarray(am.match_count)
        self._am = am
        # stride-2 tables (used by either engine when they fit: the packed
        # pair table halves the gather count of the gather-bound scan).
        # Built lazily on first device scan (ADVICE r1: eager build cost
        # up to 256MB HBM + host transients even for callers that never
        # scan); the low-memory 'classed' engine gets a tighter budget.
        self.packed2 = None
        self.classes2 = None
        self.table_classed = None
        # low-memory 'classed' engine gets a tighter default, but an
        # explicit caller cap (including 0 to disable) is always honored
        budget = (
            packed2_max_bytes
            if engine == "dfa"
            else min(packed2_max_bytes, 64 << 20)
        )
        self._packed2_ok = (
            engine != "sparse"
            and am.num_states < (1 << 29)
            and am.packed2_bytes <= budget
        )
        #: adaptive initial compaction capacity (sticky across calls)
        self.last_cap = 4096

    def ensure_packed2(self) -> bool:
        """Build + upload the stride-2 tables on first use; False if unfit."""
        if not self._packed2_ok:
            return False
        if self.packed2 is None:
            am = self._am
            self.packed2 = jnp.asarray(am.packed2)
            self.classes2 = jnp.asarray(am.byte_classes)
            self.table_classed = jnp.asarray(am.delta_classed)
        return True


def _bucket(x: int, lo: int = 16) -> int:
    b = lo
    while b < x:
        b <<= 1
    return b


def choose_layout(m: int, halo: int) -> tuple[int, int]:
    """Pick (L, T): T a power of two >= halo, L*T >= m, L in bounds."""
    T = _bucket(max(TARGET_TIME, halo), lo=16)
    L = max(MIN_LANES, _bucket(-(-m // T), lo=MIN_LANES))
    if L > MAX_LANES:
        L = MAX_LANES
        T = _bucket(max(-(-m // L), halo), lo=16)
    return L, T


def scan_device(
    am: Automaton,
    hay: np.ndarray,
    tables: DeviceTables,
    *,
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
    stride2 = tables.ensure_packed2()
    halo = am.max_len - 1
    if stride2:
        halo += halo & 1  # pairs must align across the halo boundary
    all_pos: list[np.ndarray] = []
    all_states: list[np.ndarray] = []
    seg = max(segment_bytes, 2 * max(1, halo))
    for seg_start in range(0, n, seg):
        seg_end = min(n, seg_start + seg)
        ctx_start = max(0, seg_start - halo)
        drop = seg_start - ctx_start  # leading context positions to discard
        m = seg_end - ctx_start
        L, T = choose_layout(m, halo)
        buf = np.zeros(L * T, dtype=np.uint8)
        buf[:m] = hay[ctx_start:seg_end]
        hay_dev = jnp.asarray(buf)
        cap = tables.last_cap
        while True:
            if tables.engine == "sparse":
                pos, st, total = _scan_compact_sparse(
                    tables.keys,
                    tables.targets,
                    tables.fail,
                    tables.match_count,
                    hay_dev,
                    jnp.int32(m),
                    L,
                    T,
                    halo,
                    cap,
                )
            elif stride2:
                pos, st, total = _scan_compact2(
                    tables.packed2,
                    tables.table_classed,
                    tables.classes2,
                    hay_dev,
                    jnp.int32(m),
                    L,
                    T,
                    halo,
                    cap,
                )
            else:
                pos, st, total = _scan_compact(
                    tables.table,
                    tables.classes,
                    hay_dev,
                    tables.match_count,
                    jnp.int32(m),
                    L,
                    T,
                    halo,
                    cap,
                    tables.use_classes,
                )
            # one host fetch for all outputs (each fetch is a round trip)
            pos, st, total = jax.device_get((pos, st, total))
            total = int(total)
            if total <= cap:
                break
            if total > max(DENSE_BAILOUT_MIN, m // 8):
                # match-dense corpus: growing the compaction capacity
                # toward n and expanding occurrence sets on host is the
                # wrong complexity class — let the host resolver take it
                raise MatchDenseError(
                    f"{total} matched positions in a {m}-byte segment"
                )
            cap = _bucket(total, lo=4096)
        tables.last_cap = max(4096, _bucket(total, lo=4096))
        pos = pos[:total].astype(np.int64)
        st = st[:total].astype(np.int64)
        keep = pos >= drop
        all_pos.append(pos[keep] - drop + seg_start)
        all_states.append(st[keep])
    positions = np.concatenate(all_pos) if all_pos else np.zeros(0, np.int64)
    states = np.concatenate(all_states) if all_states else np.zeros(0, np.int64)
    return positions, states
