"""Prefiltered scan: Pallas Teddy fire kernel + exact windowed verification.

Pipeline (device):

1. **Fire kernel** (Pallas): the haystack, laid out ``[R, 128]`` row-major
   (position = row*128 + lane), streams through VMEM blocks.  Per block the
   kernel computes Teddy's ``AND_k tables_k[h[i+k]]`` with in-register
   128-lane shuffles (``take_along_axis(axis=1)`` — the TPU's PSHUFB) and
   static lane rolls — no gathers.  Block-boundary rolls wrap, so the last
   ``m-1`` positions of each block are force-fired; verification discards
   false fires, so wrap-around can only over-fire, never miss.
2. **Compaction**: fire positions are compacted on device (capacity +
   exact-count retry, as in ``scan_jax``).
3. **Verification**: every fire position ``i`` is a *candidate match start*.
   Windows ``hay[i : i+max_len]`` are gathered into lanes and walked from
   the root with the engine's transition table; a window match of length
   ``j`` at step ``j`` has start exactly ``i``.  Each true occurrence fires
   at its start, lands in exactly one window, and is emitted exactly once.

The result is the complete occurrence set (pids, starts, ends) in canonical
(end asc, len desc, pid asc) order — identical to the dense scan's output.
Gather cost now scales with *matches*, not haystack bytes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.automaton import Automaton, PAD_BYTE
from ..models.prefilter import Prefilter
from .scan_jax import compact_sparse

#: A/B switch for the halo'd fire kernel (tools/probe_fire_halo.py);
#: False restores the force-fire-every-block formulation.
USE_FIRE_HALO = True

#: rows per fire-kernel block (R*128 bytes of haystack per block).
#: Empirical ceiling on this jax/libtpu: R=512 == R=256 kernel time
#: (the Mosaic grid loop is free) while R >= 1024 overruns the ~16MB
#: scoped-VMEM limit even when the per-unit estimate says it fits —
#: e.g. an m=7/words=1 fingerprint at R=2048 allocated 16.14M on the
#: kernel stack (caught by the round-5 cross-tier verify on real TPU).
BLOCK_ROWS = 512


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _leftroll(
    x: jnp.ndarray, k: int, R: int, hrow: jnp.ndarray | None = None
) -> jnp.ndarray:
    """y[p] = x[p + k] over row-major [R, 128].

    Without ``hrow`` the shift wraps within the block (the original
    force-fire formulation).  With ``hrow`` — the [1, 128] row that
    FOLLOWS the block in the global layout — the wrapped lanes of the
    last row read the true next bytes instead, so positions
    ``R*128-(m-1) ..`` compute real fingerprints and need no force-fire
    (k < 128 always holds: fingerprints are <= 8 bytes).
    """
    a = pltpu.roll(x, 128 - k, 1)
    b = pltpu.roll(x, R - 1, 0)
    c = pltpu.roll(b, 128 - k, 1)
    if hrow is not None:
        ch = jnp.broadcast_to(pltpu.roll(hrow, 128 - k, 1), x.shape)
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        c = jnp.where(row == R - 1, ch, c)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= 128 - k, c, a)


def _make_fire_kernel(
    m: int, words: int, passes: int, halo: bool = False
) -> Callable[..., None]:
    """Fire kernel for an ``m``-byte, ``words``-plane, ``passes``-pass
    fingerprint.

    Statically unrolled over passes, fingerprint positions and mask
    planes; table row layout per ``models/prefilter.py``:
    row ((p*m + k)*2 + lohi)*words + w.  A position fires when EVERY pass
    has some plane surviving all position-ANDs — the per-pass hit masks
    are AND-combined, which squares the false-fire rate for independently
    bucketed passes while keeping soundness (a true match survives every
    pass by construction).

    With ``halo`` the kernel takes an extra [32, 128] input holding the
    rows that FOLLOW the block; the last ``m-1`` positions then compute
    real fingerprints from the true next bytes instead of being
    force-fired (VERDICT r4 item 4: the wrap force-fires were ~13% of
    fired groups on the LONG corpus, all paid again in verify windows).
    Only the final grid block still force-fires its tail — its "next"
    bytes don't exist.
    """

    def _fire_kernel(*refs: Any) -> None:
        if halo:
            tabs_ref, x_ref, hx_ref, out_ref = refs
        else:
            tabs_ref, x_ref, out_ref = refs
        x = x_ref[:]  # [R, 128] uint8
        R = x.shape[0]
        t = tabs_ref[:]  # [passes*2*m*words, 128] int32 nibble tables
        lo0 = (x & jnp.uint8(15)).astype(jnp.int32)
        hi0 = x.astype(jnp.int32) >> 4
        hlo = hhi = None
        if halo:
            hr = hx_ref[0:1, :]  # the row right after this block
            hlo = (hr & jnp.uint8(15)).astype(jnp.int32)
            hhi = hr.astype(jnp.int32) >> 4

        def lut(row: int, idx: jax.Array) -> jax.Array:
            tab = jnp.broadcast_to(t[row : row + 1, :], idx.shape)
            return jnp.take_along_axis(tab, idx, axis=1)

        # Gather-shuffles commute with position permutation, so rolling the
        # nibble *inputs* once per fingerprint position (2 rolls, shared by
        # every plane and pass) replaces the per-(k, word) roll of the
        # ANDed terms — words*passes fewer leftrolls per position.
        any_fire = None
        fires = [None] * (passes * words)
        lo, hi = lo0, hi0
        for k in range(m):
            if k:
                lo = _leftroll(lo0, k, R, hlo)
                hi = _leftroll(hi0, k, R, hhi)
            for p in range(passes):
                base = p * m * 2 * words
                for w in range(words):
                    term = lut(base + (2 * k) * words + w, lo) & lut(
                        base + (2 * k + 1) * words + w, hi
                    )
                    j = p * words + w
                    fires[j] = term if k == 0 else (fires[j] & term)
        for p in range(passes):
            pass_hit = None
            for w in range(words):
                hit = fires[p * words + w] != 0
                pass_hit = hit if pass_hit is None else (pass_hit | hit)
            any_fire = (
                pass_hit if any_fire is None else (any_fire & pass_hit)
            )
        # Force-fire the wrap zone: every block without halo, only the
        # final block (whose next bytes don't exist) with halo.
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        pos = row * 128 + lane
        wrap = pos >= R * 128 - (m - 1)
        if halo:
            wrap = wrap & (
                pl.program_id(0) == pl.num_programs(0) - 1
            )
        any_fire = any_fire | wrap
        out_ref[:] = any_fire.astype(jnp.uint8)

    return _fire_kernel


def _block_rows(m: int, words: int, passes: int) -> int:
    """Block height fitting the kernel's live int32 tiles in VMEM.

    Live intermediates estimate ≈ R * 512B * (passes*2*m*words); the
    estimate is loose in BOTH directions (at m=6 w=4 it says 25MB for
    R=512, which compiles; at m=7 w=1 it says 14.7MB for R=2048, which
    OOMs at 16.14M actual), so besides the 16MB budget the block height
    is clamped at :data:`BLOCK_ROWS` = 512 — measured identical kernel
    time to 256 and the largest height that compiles across observed
    fingerprint shapes.  Bigger blocks mean fewer force-fired wrap
    positions: R 256 -> 512 cut per-byte fires 38538 -> 33421 on the
    64MB LONG corpus at identical kernel time (probe_transpose_kernel).
    """
    r = (16 << 20) // (512 * 2 * m * words * passes)
    R = 128
    while R * 2 <= min(r, BLOCK_ROWS):
        R *= 2
    return R


def fire_mask(
    tables: jnp.ndarray,
    hay2d: jnp.ndarray,
    m: int,
    words: int,
    passes: int = 1,
) -> jnp.ndarray:
    """uint8 [Rtot, 128] fire mask for a row-major haystack layout.

    Multi-block layouts pass the haystack a second time through a
    [32, 128] halo BlockSpec mapping block ``i`` to the rows at
    ``(i+1)*R`` (clamped for the final block), so block-boundary
    positions compute real fingerprints instead of force-firing.
    """
    Rtot = hay2d.shape[0]
    R = min(_block_rows(m, words, passes), Rtot)
    nblk = Rtot // R
    rows = passes * 2 * m * words
    use_halo = (
        USE_FIRE_HALO and nblk > 1 and R % 32 == 0 and Rtot % 32 == 0
    )
    in_specs = [
        pl.BlockSpec(
            (rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    inputs: tuple = (tables, hay2d)
    if use_halo:
        rb = R // 32  # R in 32-row halo-chunk units
        last_chunk = Rtot // 32 - 1

        in_specs.append(
            pl.BlockSpec(
                (32, 128),
                lambda i: (jnp.minimum((i + 1) * rb, last_chunk), 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs = (tables, hay2d, hay2d)
    return pl.pallas_call(
        _make_fire_kernel(m, words, passes, halo=use_halo),
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Rtot, 128), jnp.uint8),
        interpret=_use_interpret(),
    )(*inputs)


#: bit position where the verify table carries the "next state has matches"
#: flag; states must stay below this (automata that large use the sparse
#: engine, which never builds a Teddy scanner).
FLAG_SHIFT = 24


def _verify_body(
    vtable: jax.Array,
    classes: jax.Array,
    hay_pad: jax.Array,
    fire_pos: jax.Array,
    n: jax.Array,
    W: int,
    cap2: int,
    use_classes: bool,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Walk W-byte windows from each fire position; compact match steps.

    Two gather-killers versus the naive formulation (each was ~130ms/64MB
    on this fabric):

    * window bytes come from ceil(W/VCHUNK) chunk-row gathers over a
      ``[n/VCHUNK, VCHUNK]`` view of ``hay_pad`` (fire positions are
      COARSE-aligned and VCHUNK divides COARSE, so chunks line up);
      ``hay_pad`` carries zero-byte
      tail padding (uint8 cannot hold PAD_BYTE) and any position >= ``n``
      is remapped to PAD_BYTE *after* the gather via the ``invalid``
      mask, so the padding bytes themselves are never trusted;
    * ``vtable`` packs ``has_match`` into bit FLAG_SHIFT of every
      transition (see :class:`TeddyScanner`), so the per-step scan gather
      yields the match flag for free and no ``match_count[states]`` gather
      over [M, W] exists at all.

    fire_pos: int32 [M] (-1 padded).  Returns (win_idx[cap2], step[cap2],
    state[cap2], total).
    """
    M = fire_pos.shape[0]
    pos_safe = jnp.maximum(fire_pos, 0)
    col = jnp.arange(W, dtype=jnp.int32)[None, :]
    src = pos_safe[:, None] + col
    # fire positions are COARSE-aligned, so the window bytes come from
    # ceil(W/VCHUNK) *chunk-row* gathers over a [n/VCHUNK, VCHUNK] view —
    # far fewer HBM fetches than per-element gathers (measured 26ms vs
    # 32ms at [32k, 26] on 64MB; element gathers were themselves 2.5x
    # faster than the vmap(dynamic_slice) lowering).  Row count, not row
    # width, dominates gather cost, so VCHUNK rides COARSE up to 32.
    # Widening happens after the gather — no O(n) int32 haystack copy.
    nchunk = -(-W // VCHUNK)
    h16 = hay_pad.reshape(-1, VCHUNK)
    rows = (pos_safe // VCHUNK)[:, None] + jnp.arange(
        nchunk, dtype=jnp.int32
    )[None, :]
    ext = h16[rows].reshape(M, nchunk * VCHUNK)[:, :W].astype(jnp.int32)
    invalid = (src >= n) | (fire_pos[:, None] < 0)
    ext = jnp.where(invalid, PAD_BYTE, ext)
    if use_classes:
        ext = classes[ext]

    def body(
        states: jax.Array, colv: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        v = vtable[states, colv]
        return v & ((1 << FLAG_SHIFT) - 1), v

    _, out = jax.lax.scan(body, jnp.zeros((M,), jnp.int32), ext.T)
    packed = out.T  # [M, W]: next-state | flag<<FLAG_SHIFT
    matched = packed >= (1 << FLAG_SHIFT)
    sel, total = compact_sparse(matched.reshape(-1), cap2)
    win = jnp.where(sel >= 0, sel // W, -1)
    step = jnp.where(sel >= 0, sel % W, 0)
    st = packed.reshape(-1)[jnp.maximum(sel, 0)] & ((1 << FLAG_SHIFT) - 1)
    return win, step, st, total


#: haystack bytes per coarse verification group.  The per-byte fire mask is
#: OR-reduced over groups of this size before compaction, so the (expensive)
#: position extraction runs over N/COARSE elements and each verification
#: window covers COARSE candidate starts at once.  Measured r4 (64MB LONG
#: corpus, probe_teddy_r4): full pipeline 107.5/101.7/111.1 ms at
#: 16/32/64 — 32 balances compaction input against window length.
COARSE = 32
#: chunk-row width of the verification window gather; must divide COARSE
#: (fire positions are COARSE-aligned, rows are position // VCHUNK).
VCHUNK = 32 if COARSE % 32 == 0 else 16


@partial(
    jax.jit,
    static_argnames=(
        "cap", "cap2", "m", "words", "passes", "W", "use_classes"
    ),
)
def _fire_verify(
    tables: jax.Array,
    vtable: jax.Array,
    classes: jax.Array,
    hay2d: jax.Array,
    n: jax.Array,
    cap: int,
    cap2: int,
    m: int,
    words: int,
    passes: int,
    W: int,
    use_classes: bool,
) -> tuple[jax.Array, ...]:
    """Fused fire + coarse compact + verify in ONE device dispatch.

    A round trip on this fabric costs ~100ms, so the prefilter pipeline must
    not bounce fire positions through the host between stages.  Fire
    positions are compacted at COARSE-byte granularity: per-byte fires are
    too dense for cheap exact compaction (measured 0.6%/byte on the LONG
    corpus → jnp.nonzero alone cost 10x the fire kernel), while coarse
    groups shrink the nonzero input by COARSE and let one verification
    window cover COARSE candidate starts.  ``W`` is the *window* length
    (max_len + COARSE - 1); the host keeps only matches whose start falls
    inside the window's group.

    Results are only trustworthy when ``ftotal <= cap`` and ``mtotal <=
    cap2`` — the caller retries with doubled capacities otherwise
    (overflow-and-rescan protocol, SURVEY.md §7).
    """
    # One pallas_call per pass (identical kernel shape → one Mosaic
    # compile, reused), AND-combined in XLA: a single kernel statically
    # unrolled over both passes doubled the Mosaic program and wedged the
    # remote compiler on this fabric.
    rows_pp = 2 * m * words
    mask = None
    for p in range(passes):
        sub = jax.lax.slice_in_dim(
            tables, p * rows_pp, (p + 1) * rows_pp, axis=0
        )
        mp = fire_mask(sub, hay2d, m, words, 1)
        mask = mp if mask is None else (mask & mp)
    mask = mask.reshape(-1)
    G = mask.shape[0] // COARSE
    grp = jnp.max(mask.reshape(G, COARSE), axis=1)
    gidx = jnp.arange(G, dtype=jnp.int32)
    fired = (grp != 0) & (gidx * COARSE < n)
    fire_grp, ftotal = compact_sparse(fired, cap)
    fire_pos = jnp.where(fire_grp >= 0, fire_grp * COARSE, -1)
    # trailing zero pad (uint8 can't hold PAD_BYTE): positions >= n are
    # remapped to PAD_BYTE inside _verify_body after the gather; padded to
    # a whole number of 16-byte chunks for the chunk-row window gather
    pad = (-(-W // VCHUNK)) * VCHUNK
    hay_pad = jnp.concatenate(
        [hay2d.reshape(-1), jnp.zeros((pad,), jnp.uint8)]
    )
    win, step, st, mtotal = _verify_body(
        vtable, classes, hay_pad, fire_pos, n, W, cap2, use_classes
    )
    return fire_pos, ftotal, win, step, st, mtotal


def _bucket(x: int, lo: int = 1024) -> int:
    b = lo
    while b < x:
        b <<= 1
    return b


def expand_verified(
    am: Automaton,
    ws: np.ndarray,
    step: np.ndarray,
    st: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host CSR expansion of verified window matches (unsorted).

    ``ws[i]`` is window ``i``'s (COARSE-aligned) start, ``step[i]`` the
    0-based walk step whose state ``st[i]`` had matches.  Expands each
    state's match CSR and keeps only matches whose start lies inside the
    window's COARSE group — each true occurrence fires at its start, so it
    is kept by exactly one window.  Shared by the single-chip and sharded
    prefiltered pipelines.
    """
    cnt = am.match_count[st].astype(np.int64)
    tot = int(cnt.sum())
    if tot == 0:
        z = np.zeros(0, dtype=np.int64)
        return z.astype(np.int32), z, z
    rep = np.repeat(np.arange(len(st)), cnt)
    csum = np.cumsum(cnt)
    inner = np.arange(tot, dtype=np.int64) - np.repeat(csum - cnt, cnt)
    flat_csr = am.match_offsets[st[rep]] + inner
    pids = am.match_pids[flat_csr]
    lens = am.match_lens[flat_csr]
    wsr = ws[rep]
    ends = wsr + step[rep] + 1
    starts = ends - lens
    keep = (starts >= wsr) & (starts < wsr + COARSE)
    return pids[keep].astype(np.int32), starts[keep], ends[keep]


class TeddyScanner:
    """Per-automaton prefiltered scanner (device tables + adaptive state)."""

    def __init__(
        self,
        am: Automaton,
        pf: Prefilter,
        table: jax.Array,
        classes: jax.Array,
        match_count: jax.Array,
        use_classes: bool,
    ) -> None:
        if am.num_states >= (1 << FLAG_SHIFT):
            # automata this big route to the sparse engine and never get a
            # prefilter; guard anyway for direct constructions
            raise ValueError(
                "prefiltered scan needs state ids < 2**24"
            )
        self.am = am
        self.m = pf.m
        self.words = pf.words
        self.passes = pf.passes
        self.tables = jnp.asarray(pf.tables)
        # verify table: transition target | has_match(target) << FLAG_SHIFT
        # — the verification walk reads match flags for free (no separate
        # match_count gather over [fires, window]).
        self.vtable = table | (
            (match_count[table] > 0).astype(jnp.int32) << FLAG_SHIFT
        )
        self.classes = classes
        self.use_classes = use_classes
        self.fire_cap = 1 << 14
        self.match_cap = 1 << 12
        #: set False after a scan observes a pathological fire rate
        self.worthwhile = True

    def stage(self, hay: np.ndarray) -> jnp.ndarray:
        """Pad + reshape + transfer a haystack to the device layout.

        ``jnp.asarray`` dispatches the host->device copy asynchronously,
        so a caller can stage segment ``k+1`` while segment ``k``'s
        fused pipeline is still executing (``occurrences_streamed``).
        """
        n = len(hay)
        rows = -(-max(n, 1) // 128)
        R = min(BLOCK_ROWS, _bucket(rows, lo=8))
        rows_p = max(R, _bucket(rows, lo=8))  # power-of-two block count
        buf = np.zeros(rows_p * 128, dtype=np.uint8)
        buf[:n] = hay
        return jnp.asarray(buf.reshape(rows_p, 128))

    #: segment length of the double-buffered streamed pipeline
    SEG_BYTES = 64 << 20

    def occurrences_streamed(
        self, hay: np.ndarray, seg_bytes: int | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        """Segmented prefiltered scan with double-buffered staging.

        Splits the haystack into ``seg_bytes`` segments, each staged
        with a ``W``-byte right overlap so every match STARTING inside
        a segment is verified there (same start-attribution rule as the
        sharded right-halo); matches starting in the overlap are
        dropped and re-found by the next segment.  Segment ``k+1``'s
        host->device transfer is dispatched before segment ``k``'s
        result fetch blocks, overlapping transfer with compute
        (VERDICT r4 item 5 — the round-4 path staged the whole corpus,
        fully serial with the dispatch).
        """
        n = len(hay)
        seg = seg_bytes or self.SEG_BYTES
        if n <= seg:
            return self.occurrences(hay)
        W = self.am.max_len + COARSE - 1
        starts = list(range(0, n, seg))

        def window(i: int) -> np.ndarray:
            s0 = starts[i]
            return hay[s0 : min(n, s0 + seg + W)]

        out_p: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        out_e: list[np.ndarray] = []
        cur_win = window(0)
        cur2d = self.stage(cur_win)
        for i, s0 in enumerate(starts):
            nxt_win = nxt2d = None
            if i + 1 < len(starts):
                nxt_win = window(i + 1)
                nxt2d = self.stage(nxt_win)  # async, overlaps compute
            occ = self.occurrences(cur_win, hay2d=cur2d)
            if occ is None:
                return None  # fire rate says the dense tiers win
            pids, sts, ends = occ
            if i + 1 < len(starts):
                keep = sts < seg  # starts in the overlap belong to i+1
                pids, sts, ends = pids[keep], sts[keep], ends[keep]
            out_p.append(pids)
            out_s.append(sts + s0)
            out_e.append(ends + s0)
            cur_win, cur2d = nxt_win, nxt2d
        pids = np.concatenate(out_p)
        sts = np.concatenate(out_s)
        ends = np.concatenate(out_e)
        # boundary-spanning matches kept by segment k can END after
        # segment k+1's first matches — restore the canonical
        # (end asc, len desc, pid asc) order the resolvers require
        order = np.lexsort((pids, sts, ends))
        return pids[order], sts[order], ends[order]

    def occurrences(
        self, hay: np.ndarray, hay2d: jnp.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        """Complete (pids, starts, ends) for the haystack, or None when the
        observed fire rate says the dense scan should take over."""
        am = self.am
        n = len(hay)
        W = am.max_len + COARSE - 1  # window covers COARSE starts
        if hay2d is None:
            hay2d = self.stage(hay)
        cap, cap2 = self.fire_cap, self.match_cap
        too_many = max(1 << 16, n // 2)  # groups×W beyond this: dense wins
        while True:
            # ONE device_get for every output: each separate host fetch
            # costs a tunnel round trip (10-30ms), which dominated the
            # pipeline tail when fetched piecemeal.
            fire_np, ftotal, win, step, st, mtotal = jax.device_get(
                _fire_verify(
                    self.tables,
                    self.vtable,
                    self.classes,
                    hay2d,
                    jnp.int32(n),
                    cap,
                    cap2,
                    self.m,
                    self.words,
                    self.passes,
                    W,
                    self.use_classes,
                )
            )
            ftotal = int(ftotal)
            if ftotal > cap:
                if ftotal * max(W, 1) > too_many:
                    # keep the sticky caps in step with what we observed so
                    # a retried corpus doesn't re-run the undersized kernel
                    self.fire_cap = max(self.fire_cap, _bucket(ftotal))
                    self.worthwhile = False
                    return None
                cap = _bucket(ftotal)
                continue
            mtotal = int(mtotal)  # trustworthy only once ftotal <= cap
            if mtotal > cap2:
                cap2 = _bucket(mtotal)
                continue
            break
        self.fire_cap = max(1 << 14, _bucket(max(ftotal, 1)))
        self.match_cap = max(1 << 12, _bucket(max(mtotal, 1)))
        if ftotal * max(W, 1) > too_many:
            # verification rescans too much — let caller fall back
            self.worthwhile = False
            return None
        win = win[:mtotal].astype(np.int64)
        step = step[:mtotal].astype(np.int64)
        st = st[:mtotal].astype(np.int64)
        fire_np = fire_np.astype(np.int64)
        pids, starts, ends = expand_verified(
            am, fire_np[win], step, st
        )
        order = np.lexsort((pids, starts, ends))
        return pids[order], starts[order], ends[order]
