"""Data-parallel sharded haystack scan over a JAX device mesh.

The reference is strictly single-process (SURVEY.md §2.3); this module is the
scale-out layer the TPU design adds:

* the transition table is **replicated** to every chip,
* the haystack crosses to devices as raw ``uint8``, sharded along a 1-D mesh
  (each device owns a contiguous byte range),
* each device builds its halo'd lanes locally; the one piece of remote
  context — the ``max_len - 1`` bytes preceding the shard — arrives from the
  left neighbour via ``jax.lax.ppermute`` over ICI (the distributed halo
  exchange),
* matches are compacted per shard on device and gathered; a match is
  attributed to the device owning its end position, so boundary-spanning
  matches are found exactly once and no stitching pass exists.

Collectives ride the mesh: within a host that's ICI; across hosts
(``jax.distributed``-initialized meshes) XLA routes them over DCN.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from typing import TYPE_CHECKING

from ..models.automaton import Automaton, PAD_BYTE
from ..ops.resolve import MatchDenseError
from ..ops.scan_jax import (
    DENSE_BAILOUT_MIN,
    DeviceTables,
    _bucket,
    compact_sparse,
)

if TYPE_CHECKING:
    from ..ops.scan_teddy import TeddyScanner


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    """A 1-D mesh over the first ``num_devices`` (default: all) devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def _put_sharded(
    buf: np.ndarray, mesh: Mesh, spec: P
) -> jax.Array:
    """Stage a host buffer onto the mesh, sharded per ``spec``.

    ``jax.device_put`` with a cross-process sharding takes a slow
    consistency path (measured 0.3s for a 64MB buffer on the 2-process
    CPU rig — 100x the cost of the local-shard copies);
    ``make_array_from_callback`` builds the array from per-shard views of
    ``buf`` and only touches addressable shards, so it is near-free on
    every process and identical in result (every process holds the same
    full ``buf``, single-controller SPMD style).
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        buf.shape, sharding, lambda idx: buf[idx]
    )


def _fetch(tree: object) -> object:
    """Host-fetch jitted outputs from a (possibly multi-process) mesh.

    The scan programs ``all_gather`` their compacted outputs over the
    mesh axis *inside* the jitted computation (out_specs ``P()``), so
    every process holds a fully-replicated result and this is a plain
    local ``device_get`` — no per-call ``process_allgather`` (which
    re-jits a collective and cost a fixed ~0.2s/call on gloo, the
    dominant term of the round-4 weak-scaling deficit).  The
    ``process_allgather`` path remains only as a fallback for arrays
    that are not fully replicated.
    """
    leaves = jax.tree.leaves(tree)
    if jax.process_count() > 1 and not all(
        getattr(x, "is_fully_replicated", True) for x in leaves
    ):
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(tree, tiled=True)
    return jax.device_get(tree)


def _shard_scan_fn(
    table: jax.Array,
    classes: jax.Array,
    flat_u8: jax.Array,
    match_count: jax.Array,
    n: jax.Array,
    *,
    L: int,
    T: int,
    halo: int,
    cap: int,
    use_classes: bool,
    axis: str,
    n_dev: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-device body: halo exchange, lane build, scan, local compaction."""
    flat = flat_u8.astype(jnp.int32)
    dev = jax.lax.axis_index(axis).astype(jnp.int32)
    offset = dev * (L * T)
    idx = jnp.arange(L * T, dtype=jnp.int32) + offset
    flat = jnp.where(idx < n, flat, PAD_BYTE)

    if halo:
        # distributed halo exchange: my tail -> right neighbour's head
        tail = flat[L * T - halo :]
        prev_tail = jax.lax.ppermute(
            tail, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        prev_tail = jnp.where(dev == 0, PAD_BYTE, prev_tail)
        pf = jnp.concatenate([prev_tail, flat])
        halos = pf[: L * T].reshape(L, T)[:, :halo]
        ext = jnp.concatenate([halos, flat.reshape(L, T)], axis=1)
    else:
        ext = flat.reshape(L, T)
    if use_classes:
        ext = classes[ext]

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
    flat_s = out.T.reshape(-1)
    matched = (match_count[flat_s] > 0) & (idx < n)
    local_pos, total = compact_sparse(matched, cap)
    states_at = jnp.where(
        local_pos >= 0, flat_s[jnp.maximum(local_pos, 0)], -1
    )
    positions = jnp.where(local_pos >= 0, local_pos + offset, -1)
    # gather the compacted results over the mesh INSIDE the program: the
    # output is replicated to every process, so the host fetch is a
    # local device_get instead of a per-call host-level allgather (one
    # XLA collective of ~cap ints, fused into this dispatch)
    return (
        jax.lax.all_gather(positions, axis),
        jax.lax.all_gather(states_at, axis),
        jax.lax.all_gather(total, axis),
    )


@partial(
    jax.jit,
    static_argnames=("L", "T", "halo", "cap", "use_classes", "mesh", "axis"),
)
def _sharded_scan(
    table: jax.Array,
    classes: jax.Array,
    flat_u8: jax.Array,
    match_count: jax.Array,
    n: jax.Array,
    L: int,
    T: int,
    halo: int,
    cap: int,
    use_classes: bool,
    mesh: Mesh,
    axis: str,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    n_dev = mesh.devices.size
    fn = jax.shard_map(
        partial(
            _shard_scan_fn,
            L=L,
            T=T,
            halo=halo,
            cap=cap,
            use_classes=use_classes,
            axis=axis,
            n_dev=n_dev,
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P()),
        out_specs=(P(), P(), P()),
        # outputs are replicated BY CONSTRUCTION (each is an all_gather
        # over the mesh axis); this jax's vma inference cannot prove
        # that, so the check is disabled rather than worked around
        check_vma=False,
    )
    return fn(table, classes, flat_u8, match_count, n)


def _shard_teddy_fn(
    tabs: jax.Array,
    vtable: jax.Array,
    classes: jax.Array,
    flat_u8: jax.Array,
    n: jax.Array,
    *,
    axis: str,
    n_dev: int,
    rows: int,
    m: int,
    words: int,
    passes: int,
    W: int,
    Hr: int,
    cap: int,
    cap2: int,
    use_classes: bool,
) -> tuple[jax.Array, ...]:
    """Per-device prefiltered body: fire, coarse compact, verify.

    Identical to the single-chip fused pipeline (``ops/scan_teddy.py``)
    over this shard's bytes, plus ONE collective: verification windows
    starting in the shard's last ``COARSE`` groups extend up to
    ``max_len - 1`` bytes into the right neighbour, so each device sends
    its first ``Hr`` bytes to its left neighbour via ``ppermute``.  A
    match is owned by the shard containing its *start* (every true
    occurrence fires at its start), so boundary-spanning matches are
    verified exactly once and no dedup pass exists.
    """
    from ..ops import scan_teddy as _teddy

    LT = rows * 128
    dev = jax.lax.axis_index(axis).astype(jnp.int32)
    offset = dev * LT
    head = flat_u8[:Hr]
    right = jax.lax.ppermute(
        head, axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
    )
    right = jnp.where(dev == n_dev - 1, jnp.zeros_like(right), right)
    h2 = flat_u8.reshape(rows, 128)
    rows_pp = 2 * m * words
    mask = None
    for p in range(passes):
        sub = jax.lax.slice_in_dim(
            tabs, p * rows_pp, (p + 1) * rows_pp, axis=0
        )
        mp = _teddy.fire_mask(sub, h2, m, words, 1)
        mask = mp if mask is None else (mask & mp)
    mask = mask.reshape(-1)
    G = LT // _teddy.COARSE
    grp = jnp.max(mask.reshape(G, _teddy.COARSE), axis=1)
    gidx = jnp.arange(G, dtype=jnp.int32)
    n_local = n - offset  # shard-local valid byte count (may exceed LT)
    fired = (grp != 0) & (gidx * _teddy.COARSE < n_local)
    fire_grp, ftotal = compact_sparse(fired, cap)
    fire_pos = jnp.where(fire_grp >= 0, fire_grp * _teddy.COARSE, -1)
    hay_pad = jnp.concatenate(
        [flat_u8, right, jnp.zeros((_teddy.VCHUNK,), jnp.uint8)]
    )
    win, step, st, mtotal = _teddy._verify_body(
        vtable, classes, hay_pad, fire_pos, n_local, W, cap2, use_classes
    )
    pos_global = jnp.where(fire_pos >= 0, fire_pos + offset, -1)
    # in-program result gather (see _shard_scan_fn): replicated outputs
    # make the host fetch a local device_get on every process
    return tuple(
        jax.lax.all_gather(x, axis)
        for x in (pos_global, ftotal, win, step, st, mtotal)
    )


@partial(
    jax.jit,
    static_argnames=(
        "rows", "m", "words", "passes", "W", "Hr", "cap", "cap2",
        "use_classes", "mesh", "axis",
    ),
)
def _sharded_teddy(
    tabs: jax.Array,
    vtable: jax.Array,
    classes: jax.Array,
    flat_u8: jax.Array,
    n: jax.Array,
    rows: int,
    m: int,
    words: int,
    passes: int,
    W: int,
    Hr: int,
    cap: int,
    cap2: int,
    use_classes: bool,
    mesh: Mesh,
    axis: str,
) -> tuple[jax.Array, ...]:
    n_dev = mesh.devices.size
    fn = jax.shard_map(
        partial(
            _shard_teddy_fn,
            axis=axis,
            n_dev=n_dev,
            rows=rows,
            m=m,
            words=words,
            passes=passes,
            W=W,
            Hr=Hr,
            cap=cap,
            cap2=cap2,
            use_classes=use_classes,
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P()),
        out_specs=(P(),) * 6,
        # pallas_call outputs carry no varying-mesh-axes metadata; skip the
        # vma check (shardings are fully explicit above)
        check_vma=False,
    )
    return fn(tabs, vtable, classes, flat_u8, n)


def scan_sharded_teddy(
    am: Automaton,
    scanner: "TeddyScanner",
    hay: np.ndarray,
    mesh: Mesh,
    *,
    axis: str | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Prefiltered data-parallel scan over ``mesh``.

    Returns the complete (pids, starts, ends) occurrence set in canonical
    order — identical to ``TeddyScanner.occurrences`` — or None when the
    observed fire rate says the dense sharded scan should take over.
    ``scanner`` is the matcher's :class:`~..ops.scan_teddy.TeddyScanner``
    (tables + sticky capacities are shared with the single-chip path).
    """
    from ..ops import scan_teddy as _teddy

    n = len(hay)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z.astype(np.int32), z, z
    if axis is None:
        axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    W = am.max_len + _teddy.COARSE - 1
    Hr = _teddy.VCHUNK * (-(-W // _teddy.VCHUNK))
    # Each shard must hold at least the right-halo length: the halo comes
    # from ONE ppermute hop, so verification windows may reach at most one
    # shard to the right.  LT >= Hr guarantees a window starting anywhere
    # in a shard ends within (shard + halo) — without this floor a pattern
    # longer than n/n_dev bytes would be silently unfindable across
    # boundaries (same role as the dense path's `T = _bucket(max(...,
    # halo, 16))`).
    rows = _bucket(
        max(-(-n // (n_dev * 128)), -(-Hr // 128), 8), lo=8
    )
    LT = rows * 128
    buf = np.zeros(n_dev * LT, dtype=np.uint8)
    buf[:n] = hay
    flat_dev = _put_sharded(buf, mesh, P(axis))
    cap, cap2 = scanner.fire_cap, scanner.match_cap
    too_many = max(1 << 16, n // 2)
    while True:
        pos, ftot, win, step, st, mtot = _fetch(
            _sharded_teddy(
                scanner.tables,
                scanner.vtable,
                scanner.classes,
                flat_dev,
                jnp.int32(n),
                rows,
                scanner.m,
                scanner.words,
                scanner.passes,
                W,
                Hr,
                cap,
                cap2,
                scanner.use_classes,
                mesh,
                axis,
            )
        )
        ftotal = int(ftot.max()) if ftot.size else 0
        if ftotal > cap:
            if int(ftot.sum()) * max(W, 1) > too_many:
                scanner.fire_cap = max(
                    scanner.fire_cap, _teddy._bucket(ftotal)
                )
                scanner.worthwhile = False
                return None
            cap = _teddy._bucket(ftotal)
            continue
        mtotal = int(mtot.max()) if mtot.size else 0
        if mtotal > cap2:
            cap2 = _teddy._bucket(mtotal)
            continue
        break
    scanner.fire_cap = max(1 << 14, _teddy._bucket(max(ftotal, 1)))
    scanner.match_cap = max(1 << 12, _teddy._bucket(max(mtotal, 1)))
    # same threshold as the in-loop overflow abandon above — the backend
    # choice must depend on the corpus, not on incidental cap history
    if int(ftot.sum()) * max(W, 1) > too_many:
        scanner.worthwhile = False
        return None
    all_p: list[np.ndarray] = []
    all_s: list[np.ndarray] = []
    all_e: list[np.ndarray] = []
    for d in range(n_dev):
        mt = int(mtot[d])
        if not mt:
            continue
        ws = pos[d].astype(np.int64)[win[d, :mt].astype(np.int64)]
        p_, s_, e_ = _teddy.expand_verified(
            am, ws, step[d, :mt].astype(np.int64),
            st[d, :mt].astype(np.int64),
        )
        all_p.append(p_)
        all_s.append(s_)
        all_e.append(e_)
    if not all_p:
        z = np.zeros(0, dtype=np.int64)
        return z.astype(np.int32), z, z
    pids = np.concatenate(all_p)
    starts = np.concatenate(all_s)
    ends = np.concatenate(all_e)
    order = np.lexsort((pids, starts, ends))
    return pids[order], starts[order], ends[order]


def _shard_batch_fn(
    table: jax.Array,
    classes: jax.Array,
    hay2d: jax.Array,
    lens: jax.Array,
    match_count: jax.Array,
    *,
    cap: int,
    use_classes: bool,
    axis: str,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-device batched scan body: my rows, no halo, local compaction.

    Each document starts at the root, so sharding the ``[B, T]`` batch
    layout on ``B`` needs NO halo exchange at all — the only collective in
    the batched sharded pipeline is the result gather.  Positions are
    globalized to the flat ``row * T + t`` coordinate space the batch
    resolve consumes.
    """
    B, T = hay2d.shape  # per-shard row block
    dev = jax.lax.axis_index(axis).astype(jnp.int32)
    col = jnp.arange(T, dtype=jnp.int32)[None, :]
    ext = jnp.where(col < lens[:, None], hay2d.astype(jnp.int32), PAD_BYTE)
    if use_classes:
        ext = classes[ext]

    def body(
        states: jax.Array, c: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        states = table[states, c]
        return states, states

    # zeros_like(ext[:, 0]) keeps the carry varying over the mesh axis
    # (shard_map vma rule: the carry must match the sharded scan stream)
    _, out = jax.lax.scan(body, jnp.zeros_like(ext[:, 0]), ext.T)
    flat_s = out.T.reshape(-1)
    valid = (col < lens[:, None]).reshape(-1)
    matched = (match_count[flat_s] > 0) & valid
    local_pos, total = compact_sparse(matched, cap)
    states_at = jnp.where(
        local_pos >= 0, flat_s[jnp.maximum(local_pos, 0)], -1
    )
    positions = jnp.where(local_pos >= 0, local_pos + dev * (B * T), -1)
    # in-program result gather (see _shard_scan_fn)
    return (
        jax.lax.all_gather(positions, axis),
        jax.lax.all_gather(states_at, axis),
        jax.lax.all_gather(total, axis),
    )


@partial(
    jax.jit,
    static_argnames=("cap", "use_classes", "mesh", "axis"),
)
def _sharded_batch(
    table: jax.Array,
    classes: jax.Array,
    hay2d: jax.Array,
    lens: jax.Array,
    match_count: jax.Array,
    cap: int,
    use_classes: bool,
    mesh: Mesh,
    axis: str,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    fn = jax.shard_map(
        partial(
            _shard_batch_fn,
            cap=cap,
            use_classes=use_classes,
            axis=axis,
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis), P()),
        out_specs=(P(), P(), P()),
        # replicated-by-construction all_gather outputs (see above)
        check_vma=False,
    )
    return fn(table, classes, hay2d, lens, match_count)


def scan_sharded_batch(
    am: Automaton,
    docs: list[np.ndarray],
    tables: DeviceTables,
    mesh: Mesh,
    *,
    axis: str | None = None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Batched many-document scan with rows sharded across ``mesh``.

    The device-batch counterpart of :func:`scan_sharded`: documents are
    staged into the same zero-padded ``[B, T]`` layout as
    ``ops.scan_jax.scan_device_batch`` (whose contract this matches
    exactly — flat ascending ``(positions, states, T)``), with ``B``
    padded up to a multiple of the mesh size so every device owns an
    equal row block.  Padding rows have length 0 and can never match.
    """
    from ..ops.scan_jax import MIN_LANES

    B = len(docs)
    if B == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), 1
    if axis is None:
        axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    Tmax = max((len(d) for d in docs), default=1)
    T = _bucket(max(Tmax, 16), lo=16)
    Bb = _bucket(max(B, MIN_LANES, n_dev), lo=MIN_LANES)
    if Bb % n_dev:  # mesh sizes are not always powers of two
        Bb = -(-Bb // n_dev) * n_dev
    buf = np.zeros((Bb, T), dtype=np.uint8)
    lens = np.zeros(Bb, dtype=np.int32)
    for i, d in enumerate(docs):
        buf[i, : len(d)] = d
        lens[i] = len(d)
    hay_dev = _put_sharded(buf, mesh, P(axis, None))
    lens_dev = _put_sharded(lens, mesh, P(axis))
    cap = tables.last_cap
    while True:
        pos, st, totals = _sharded_batch(
            tables.table,
            tables.classes,
            hay_dev,
            lens_dev,
            tables.match_count,
            cap,
            tables.use_classes,
            mesh,
            axis,
        )
        pos, st, totals_np = _fetch((pos, st, totals))
        worst = int(totals_np.max()) if totals_np.size else 0
        if worst <= cap:
            break
        if worst > max(DENSE_BAILOUT_MIN, (Bb // n_dev) * T // 8):
            # density bailout (see scan_sharded): the host resolve
            # paths own the match-dense regime (api._find_batch)
            raise MatchDenseError(
                f"{worst} matched positions in a {Bb // n_dev}x{T} "
                "batch shard"
            )
        cap = _bucket(worst, lo=4096)
    tables.last_cap = max(4096, _bucket(max(worst, 1), lo=4096))
    out_pos: list[np.ndarray] = []
    out_st: list[np.ndarray] = []
    for d in range(n_dev):
        k = int(totals_np[d])
        out_pos.append(pos[d, :k].astype(np.int64))
        out_st.append(st[d, :k].astype(np.int64))
    return np.concatenate(out_pos), np.concatenate(out_st), T


def scan_sharded(
    am: Automaton,
    hay: np.ndarray,
    tables: DeviceTables,
    mesh: Mesh,
    *,
    lanes_per_device: int = 512,
    axis: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Scan ``hay`` sharded across ``mesh``; returns (positions, states).

    Layout: ``n_dev * lanes_per_device`` lanes of ``T`` bytes; device ``d``
    owns global byte range ``[d*L*T, (d+1)*L*T)``.
    """
    n = len(hay)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    if axis is None:
        axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    halo = am.max_len - 1
    L = lanes_per_device
    G = n_dev * L
    T = _bucket(max(-(-n // G), halo, 16))
    buf = np.zeros(G * T, dtype=np.uint8)
    buf[:n] = hay
    flat_dev = _put_sharded(buf, mesh, P(axis))
    # sticky compaction capacity shared with the single-chip path: a
    # match-dense corpus must not re-pay the overflow retry (a full
    # re-scan) on every sharded call
    cap = tables.last_cap
    while True:
        pos, st, totals = _sharded_scan(
            tables.table,
            tables.classes,
            flat_dev,
            tables.match_count,
            jnp.int32(n),
            L,
            T,
            halo,
            cap,
            tables.use_classes,
            mesh,
            axis,
        )
        pos, st, totals_np = _fetch((pos, st, totals))
        worst = int(totals_np.max()) if totals_np.size else 0
        if worst <= cap:
            break
        if worst > max(DENSE_BAILOUT_MIN, (L * T) // 8):
            # density bailout, same contract as scan_device: the host
            # resolve paths own the match-dense regime (api._find)
            raise MatchDenseError(
                f"{worst} matched positions in a {L * T}-byte shard"
            )
        cap = _bucket(worst, lo=4096)
    tables.last_cap = max(4096, _bucket(max(worst, 1), lo=4096))
    # pos/st are host [n_dev, cap] arrays from the single fetch above
    out_pos: list[np.ndarray] = []
    out_st: list[np.ndarray] = []
    for d in range(n_dev):
        k = int(totals_np[d])
        out_pos.append(pos[d, :k].astype(np.int64))
        out_st.append(st[d, :k].astype(np.int64))
    return np.concatenate(out_pos), np.concatenate(out_st)
