"""Data-parallel sharded haystack scan over a JAX device mesh.

The reference is strictly single-process (SURVEY.md §2.3); this module is the
scale-out layer the TPU design adds: the transition table is replicated to
every chip, the haystack's lane axis is sharded data-parallel across a 1-D
mesh, and each shard's matches are compacted locally then ``all_gather``\\ ed.
Because each lane already carries its own ``max_len - 1`` halo of left
context (see ``ops/scan_host.py``), shard boundaries need no extra stitching
pass — boundary-spanning matches are caught by the halo and never
double-reported (a match is attributed to the lane that owns its end
position).

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
from ..ops.scan_host import make_lanes
from ..ops.scan_jax import DeviceTables, _bucket


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    """A 1-D mesh over the first ``num_devices`` (default: all) devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def _shard_scan_fn(table, classes, ext, match_count, n, cap, halo,
                   use_classes, lanes_per_dev, axis):
    """Per-device body: scan local lanes, compact local matches."""
    if use_classes:
        ext = classes[ext]

    def body(states, col):
        states = table[states, col]
        return states, states

    L, HT = ext.shape
    T = HT - halo
    # zeros_like keeps the carry varying over the mesh axis (shard_map vma)
    init = jnp.zeros_like(ext[:, 0])
    if halo:
        states, _ = jax.lax.scan(body, init, ext[:, :halo].T)
    else:
        states = init
    _, out = jax.lax.scan(body, states, ext[:, halo:].T)
    flat = out.T.reshape(-1)
    # global position of local flat index i: dev*(L*T) + i
    dev = jax.lax.axis_index(axis)
    offset = dev.astype(jnp.int32) * (L * T)
    idx = jnp.arange(L * T, dtype=jnp.int32) + offset
    matched = (match_count[flat] > 0) & (idx < n)
    total = jnp.sum(matched, dtype=jnp.int32)
    local_pos = jnp.nonzero(matched, size=cap, fill_value=-1)[0].astype(
        jnp.int32
    )
    states_at = jnp.where(
        local_pos >= 0, flat[jnp.maximum(local_pos, 0)], -1
    )
    positions = jnp.where(local_pos >= 0, local_pos + offset, -1)
    # gather every shard's buffers; axis 0 of the outputs is the mesh axis
    return (
        positions[None],
        states_at[None],
        total[None],
    )


@partial(
    jax.jit,
    static_argnames=("cap", "halo", "use_classes", "lanes_per_dev", "mesh",
                     "axis"),
)
def _sharded_scan(table, classes, ext, match_count, n, cap, halo,
                  use_classes, lanes_per_dev, mesh, axis):
    fn = jax.shard_map(
        partial(
            _shard_scan_fn,
            cap=cap,
            halo=halo,
            use_classes=use_classes,
            lanes_per_dev=lanes_per_dev,
            axis=axis,
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    return fn(table, classes, ext, match_count, n)


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

    The lane layout is ``[n_dev * lanes_per_device, halo + T]`` with the lane
    axis sharded over the mesh; device ``d`` owns global byte range
    ``[d*L*T, (d+1)*L*T)``.
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
    T = _bucket(-(-n // G))
    padded = np.full(G * T, PAD_BYTE, dtype=np.int32)
    padded[:n] = np.asarray(hay, dtype=np.int32)
    ext, _ = make_lanes(padded, G, halo)
    sharding = NamedSharding(mesh, P(axis))
    ext_d = jax.device_put(ext, sharding)
    cap = 4096
    while True:
        pos, st, totals = _sharded_scan(
            tables.table,
            tables.classes,
            ext_d,
            tables.match_count,
            jnp.int32(n),
            cap,
            halo,
            tables.use_classes,
            L,
            mesh,
            axis,
        )
        totals_np = np.asarray(totals)
        worst = int(totals_np.max()) if totals_np.size else 0
        if worst <= cap:
            break
        cap = _bucket(worst, lo=4096)
    pos = np.asarray(pos)  # [n_dev, cap]
    st = np.asarray(st)
    out_pos: list[np.ndarray] = []
    out_st: list[np.ndarray] = []
    for d in range(n_dev):
        k = int(totals_np[d])
        out_pos.append(pos[d, :k].astype(np.int64))
        out_st.append(st[d, :k].astype(np.int64))
    return np.concatenate(out_pos), np.concatenate(out_st)
