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

from ..models.automaton import Automaton, PAD_BYTE
from ..ops.scan_jax import DeviceTables, _bucket, compact_sparse


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    """A 1-D mesh over the first ``num_devices`` (default: all) devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def _shard_scan_fn(table, classes, flat_u8, match_count, n, *, L, T, halo,
                   cap, use_classes, axis, n_dev):
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

    def body(states, col):
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
    return positions[None], states_at[None], total[None]


@partial(
    jax.jit,
    static_argnames=("L", "T", "halo", "cap", "use_classes", "mesh", "axis"),
)
def _sharded_scan(table, classes, flat_u8, match_count, n, L, T, halo, cap,
                  use_classes, mesh, axis):
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
        out_specs=(P(axis), P(axis), P(axis)),
    )
    return fn(table, classes, flat_u8, match_count, n)


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
    sharding = NamedSharding(mesh, P(axis))
    flat_dev = jax.device_put(buf, sharding)
    cap = 4096
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
        pos, st, totals_np = jax.device_get((pos, st, totals))
        worst = int(totals_np.max()) if totals_np.size else 0
        if worst <= cap:
            break
        cap = _bucket(worst, lo=4096)
    # pos/st are host [n_dev, cap] arrays from the single fetch above
    out_pos: list[np.ndarray] = []
    out_st: list[np.ndarray] = []
    for d in range(n_dev):
        k = int(totals_np[d])
        out_pos.append(pos[d, :k].astype(np.int64))
        out_st.append(st[d, :k].astype(np.int64))
    return np.concatenate(out_pos), np.concatenate(out_st)
