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


#: HBM/host budget for an auto-selected dense table.
_AUTO_DENSE_BUDGET = 64 << 20
#: budget for an auto-selected byte-classed table.
_AUTO_CLASSED_BUDGET = 256 << 20


def select_engine(am: Automaton) -> Implementation:
    """Pick a table layout balancing build time, memory and scan speed.

    The reference delegates this to the crate's heuristic; ours is sized to
    TPU memory: dense if it comfortably fits, byte-classed next, sparse CSR
    for pattern sets whose tables would blow the budget.
    """
    if am.num_states * 257 * 4 <= _AUTO_DENSE_BUDGET:
        return Implementation.DFA
    if am.num_states * am.num_classes * 4 <= _AUTO_CLASSED_BUDGET:
        return Implementation.ContiguousNFA
    return Implementation.NoncontiguousNFA
