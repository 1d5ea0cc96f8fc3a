"""Multi-host (multi-process) execution of the sharded scan.

The reference is strictly single-process (SURVEY.md §2.3); this module adds
the ``jax.distributed`` glue that turns the single-controller sharded scan
(``parallel/sharded.py``) into a multi-host one.  The design needs nothing
else: ``scan_sharded`` is written against a ``Mesh`` and XLA routes its
``ppermute`` halo exchange over ICI within a host and DCN (gloo on CPU)
across hosts automatically once the mesh spans processes; the only
multihost-specific code path is the result fetch
(``sharded._fetch`` -> ``multihost_utils.process_allgather``), because a
plain ``device_get`` cannot see remote shards.

Runner recipe (one command per host; on one machine use
``tools/multihost_run.py`` which spawns these as subprocesses)::

    # host 0 (also the coordinator)
    python -m ahocorasick_rs_tpu.parallel.multihost \
        --coordinator 10.0.0.1:8476 --num-processes 2 --process-id 0
    # host 1
    python -m ahocorasick_rs_tpu.parallel.multihost \
        --coordinator 10.0.0.1:8476 --num-processes 2 --process-id 1

Every process builds the same automaton (construction is deterministic) and
calls the same jitted scan; the haystack is sharded over the global mesh so
each process's devices own a contiguous byte range.  Failures during
initialization are re-raised immediately — a partially-initialized
distributed runtime must never fall back silently to single-host behavior
(SURVEY.md §5: fail fast).

Executed evidence: ``tests/test_multihost.py`` runs the 2-process CPU form
of this worker on localhost and asserts the multi-process match stream is
bit-exact with the single-process one; ``tools/multihost_run.py`` records
the result in ``SCALING_r*.json``.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import time
from typing import TYPE_CHECKING, Optional

import numpy as np

if TYPE_CHECKING:  # jax imports stay lazy at runtime (fail-fast on use)
    from jax.sharding import Mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs: object,
) -> None:
    """Initialize the JAX distributed runtime (idempotent, fail-fast).

    Thin wrapper over ``jax.distributed.initialize`` with the arguments in
    the order users expect from the JAX docs.  On managed platforms (Cloud
    TPU pods) all three arguments may be None and are auto-detected.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise


def global_mesh(axis: str = "data") -> "Mesh":
    """A 1-D mesh over every device of every initialized process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def demo_corpus(
    nbytes: int, seed: int = 42, npatterns: int = 200
) -> tuple[list[str], str]:
    """Deterministic (patterns, haystack) every process can rebuild.

    Lowercase 6-char patterns over a random lowercase haystack with a few
    planted occurrences, including some spanning the byte ranges where
    shard boundaries fall for small power-of-two meshes.
    """
    rng = np.random.default_rng(seed)
    letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)
    pats = sorted(
        {
            bytes(letters[rng.integers(0, 26, 6)]).decode()
            for _ in range(npatterns)
        }
    )
    hay = bytearray(bytes(letters[rng.integers(0, 26, nbytes)]))
    # plant matches, including at likely shard boundaries (n/2, n/4, ...)
    spots = [int(x) for x in rng.integers(0, max(nbytes - 8, 1), 64)]
    spots += [nbytes // 2 - 3, nbytes // 4 - 3, (3 * nbytes) // 4 - 3]
    for i, s in enumerate(spots):
        if 0 <= s <= nbytes - 6:
            hay[s : s + 6] = pats[i % len(pats)].encode()
    return pats, hay.decode()


def _match_digest(matches: list[tuple[int, int, int]]) -> str:
    h = hashlib.sha256()
    for t in matches:
        h.update(repr(t).encode())
    return h.hexdigest()


def run_worker(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    *,
    nbytes: int = 4 << 20,
    repeats: int = 3,
    platform: Optional[str] = None,
    out_path: Optional[str] = None,
) -> dict:
    """Init distributed, scan the demo corpus over the global mesh, and
    return (and optionally write) a result record.

    All four public semantics run through the public API with
    ``backend="sharded"``; the record carries per-semantics match counts +
    digests (every process must produce identical digests — the
    correctness claim multi-process execution has to prove) and the
    best-of-``repeats`` scan seconds for the throughput record.
    """
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    init_distributed(coordinator_address, num_processes, process_id)
    from ..api import AhoCorasick
    from ..models.engine import MatchKind

    mesh = global_mesh()
    pats, hay = demo_corpus(nbytes)
    record: dict = {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "nbytes": nbytes,
        "semantics": {},
    }
    for kind, overlapping in [
        (MatchKind.Standard, False),
        (MatchKind.Standard, True),
        (MatchKind.LeftmostFirst, False),
        (MatchKind.LeftmostLongest, False),
    ]:
        ac = AhoCorasick(
            pats, matchkind=kind, backend="sharded", mesh=mesh
        )
        matches = ac.find_matches_as_indexes(hay, overlapping=overlapping)
        name = kind.name + ("_overlapping" if overlapping else "")
        record["semantics"][name] = {
            "matches": len(matches),
            "digest": _match_digest(matches),
        }
    # throughput: repeat the Standard scan, keep the best wall time.  A
    # barrier before each timed call keeps one process's host-side
    # resolve tail from counting against the other's scan (standard
    # distributed-benchmark practice).
    ac = AhoCorasick(pats, backend="sharded", mesh=mesh)
    ac.find_matches_as_indexes(hay)  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("scan-bench")
        t0 = time.perf_counter()
        ac.find_matches_as_indexes(hay)
        best = min(best, time.perf_counter() - t0)
    record["scan_seconds_best"] = best
    record["scan_gbps"] = nbytes / best / 1e9
    if out_path:
        with open(out_path, "w") as f:
            json.dump(record, f)
    return record


def main(argv: Optional[list[str]] = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--nbytes", type=int, default=4 << 20)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument(
        "--platform",
        default=None,
        help="force a jax platform (e.g. cpu) before distributed init",
    )
    p.add_argument("--out", default=None, help="write the result JSON here")
    args = p.parse_args(argv)
    record = run_worker(
        args.coordinator,
        args.num_processes,
        args.process_id,
        nbytes=args.nbytes,
        repeats=args.repeats,
        platform=args.platform,
        out_path=args.out,
    )
    print(json.dumps(record), flush=True)


def main_demo(
    coordinator_address: str, num_processes: int, process_id: int
) -> None:
    """Minimal multi-host smoke run: init, build, scan, report."""
    init_distributed(coordinator_address, num_processes, process_id)
    import jax

    from ..api import AhoCorasick

    mesh = global_mesh()
    ac = AhoCorasick(
        ["hello", "world"], backend="sharded", mesh=mesh
    )
    hay = "hello there, worldly world! " * 200_000
    matches = ac.find_matches_as_indexes(hay)
    if jax.process_index() == 0:
        print(
            f"processes={num_processes} devices={len(jax.devices())} "
            f"matches={len(matches)}"
        )


if __name__ == "__main__":
    main()
