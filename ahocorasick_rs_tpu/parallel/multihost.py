"""Multi-host (multi-process) scaffolding for the sharded scan.

The reference is strictly single-process (SURVEY.md §2.3); this module adds
the ``jax.distributed`` glue that turns the single-controller sharded scan
(``parallel/sharded.py``) into a multi-host one.  The design needs nothing
else: ``scan_sharded`` is written against a ``Mesh`` and XLA routes its
``ppermute`` halo exchange over ICI within a host and DCN across hosts
automatically once the mesh spans processes.

Runner recipe (one command per host)::

    # host 0 (also the coordinator)
    python -c "from ahocorasick_rs_tpu.parallel.multihost import main_demo;\
 main_demo('10.0.0.1:8476', 2, 0)"
    # host 1
    python -c "from ahocorasick_rs_tpu.parallel.multihost import main_demo;\
 main_demo('10.0.0.1:8476', 2, 1)"

Every process must build the same automaton (compilation is deterministic)
and call the same jitted scan; each host feeds its local shard of the
haystack.  Failures during initialization are re-raised immediately — a
partially-initialized distributed runtime must never fall back silently to
single-host behavior (SURVEY.md §5: fail fast).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
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


def global_mesh(axis: str = "data"):
    """A 1-D mesh over every device of every initialized process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


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
