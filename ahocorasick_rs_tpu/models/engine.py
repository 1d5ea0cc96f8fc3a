"""Match-kind and engine enums plus the auto-selection heuristic.

Mirrors the reference's enum bridges (/root/reference/src/lib.rs:92-128) and
its heuristic engine selection (``implementation=None``,
/root/reference/src/lib.rs:135,187; README.md:173-177).  On TPU the three
engines are three table layouts for the same automaton:

* ``DFA``            — dense ``int32 [S, 257]`` transition table, fastest scan.
* ``ContiguousNFA``  — byte-class-compressed ``int32 [S, C]`` table + byte→class
                       map; near-DFA speed at a fraction of the memory.
* ``NoncontiguousNFA`` — sparse CSR goto + failure links; fastest build and
                       smallest memory, slowest scan (failure-chain walking).
"""

from __future__ import annotations

import enum

from .automaton import Automaton


class MatchKind(enum.Enum):
    """Which of several overlapping candidate matches is reported.

    Semantics per /root/reference/README.md:84-162.
    """

    Standard = "standard"
    LeftmostFirst = "leftmost_first"
    LeftmostLongest = "leftmost_longest"


class Implementation(enum.Enum):
    """Automaton table layout (reference: src/lib.rs:110-128)."""

    NoncontiguousNFA = "noncontiguous_nfa"
    ContiguousNFA = "contiguous_nfa"
    DFA = "dfa"


#: fallback budgets when no device memory stats are available (e.g. the
#: virtual CPU test mesh): dense table / byte-classed table byte caps.
_FALLBACK_DENSE_BUDGET = 64 << 20
_FALLBACK_CLASSED_BUDGET = 256 << 20

_cached_budgets: tuple[int, int] | None = None


def auto_budgets() -> tuple[int, int]:
    """(dense, classed) byte budgets derived from the device's memory.

    The dense table is the fastest layout but the scan also needs HBM for
    lane buffers, the stride-2 packed table and compaction scratch, so the
    dense budget is 1/16 of device memory and the classed budget 1/4.
    Falls back to fixed budgets when the backend reports no memory stats.
    """
    global _cached_budgets
    if _cached_budgets is None:
        limit = 0
        try:
            import jax

            dev = jax.devices()[0]
            stats = dev.memory_stats()
            if stats:
                limit = int(
                    stats.get("bytes_limit")
                    or stats.get("bytes_reservable_limit")
                    or 0
                )
            if limit == 0:
                # some backends report no stats; fall back to the known
                # HBM of the device generation
                kind = (getattr(dev, "device_kind", "") or "").lower()
                for key, hbm in (
                    ("v5 lite", 16 << 30),
                    ("v5e", 16 << 30),
                    ("v5p", 95 << 30),
                    ("v6 lite", 32 << 30),
                    ("v6e", 32 << 30),
                    ("v4", 32 << 30),
                    ("v3", 16 << 30),
                    ("v2", 8 << 30),
                ):
                    if key in kind:
                        limit = hbm
                        break
        except Exception:
            limit = 0
        if limit > 0:
            _cached_budgets = (limit // 16, limit // 4)
        else:
            _cached_budgets = (
                _FALLBACK_DENSE_BUDGET,
                _FALLBACK_CLASSED_BUDGET,
            )
    return _cached_budgets


#: hard cap on the auto-selected dense table, independent of HBM: above
#: this the byte-classed layout scans just as fast on device (the class
#: map is a 257-entry lookup) while building ~10x faster and fitting host
#: caches during the upload-amortization window.  Mirrors the reference
#: crate's economy: it never auto-picks the DFA for large sets
#: (/root/reference/README.md:173-177 — "exorbitant" memory).
_DENSE_AUTO_CAP = 128 << 20


def select_engine(am: Automaton) -> Implementation:
    """Pick a table layout balancing build time, memory and scan speed.

    The reference delegates this to the crate's heuristic; ours is sized to
    the attached device's memory (``auto_budgets``): dense if it comfortably
    fits, byte-classed next, sparse CSR for pattern sets whose tables would
    blow the budget.
    """
    dense_budget, classed_budget = auto_budgets()
    if am.num_states * 257 * 4 <= min(dense_budget, _DENSE_AUTO_CAP):
        return Implementation.DFA
    if am.num_states * am.num_classes * 4 <= classed_budget:
        return Implementation.ContiguousNFA
    return Implementation.NoncontiguousNFA
