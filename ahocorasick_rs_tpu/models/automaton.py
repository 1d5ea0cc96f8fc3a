"""Host-side Aho-Corasick automaton compiler.

This is the TPU-native replacement for the reference's algorithm core (the
external ``aho-corasick`` Rust crate, reached through
``/root/reference/src/lib.rs:186-215``).  Instead of building a pointer-based
NFA that a sequential CPU loop walks, we compile the pattern set host-side
into flat NumPy tables that device kernels consume:

* a dense ``int32 [S, 257]`` transition table (the DFA engine; column 256 is a
  virtual "padding byte" that always returns to the root so device lanes can
  be padded without affecting results),
* a byte-class-compressed ``int32 [S, C+1]`` table plus a ``[257]`` byte→class
  map (the ContiguousNFA engine analogue: same answers, much less memory),
* a sparse CSR goto table + failure links (the NoncontiguousNFA engine
  analogue: fastest build, smallest memory, slowest search),
* a match CSR: for every state, the ordered list of pattern ids whose
  patterns are suffixes of that state's string.  Order within a state is
  (pattern length descending, pattern id ascending), which is exactly the
  order the reference emits same-end-position overlapping matches in
  (/root/reference/tests/test_ac.py:276-288).

Because any Aho-Corasick state's string is at most ``max_len`` bytes long, a
scan started from the root at position ``p - max_len`` is guaranteed to be in
the true state at every position ``>= p``.  All device scans exploit this:
haystack chunks are scanned fully in parallel with a ``max_len - 1`` halo of
left context, with no sequential dependency and no cross-chunk fixup.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np

#: Virtual byte value used to pad device lanes.  ``delta[:, PAD_BYTE]`` is the
#: root state for every state, so padding never creates or destroys matches at
#: non-padding positions.
PAD_BYTE = 256


@dataclass
class Automaton:
    """A fully compiled pattern automaton (host representation).

    All arrays are NumPy; device paths convert (and cache) jnp views lazily.
    """

    # --- core trie/automaton ---
    num_states: int
    #: per-state goto edges as python dicts (byte -> state); kept for the
    #: tiny-haystack host walk tier and for lazy dense-table builds.
    goto: list
    fail: np.ndarray  # int32 [S]
    depth: np.ndarray  # int32 [S]

    # --- match CSR (ordered: length desc, pattern id asc within a state) ---
    match_offsets: np.ndarray  # int64 [S+1]
    match_pids: np.ndarray  # int32 [M]
    match_lens: np.ndarray  # int32 [M]
    match_count: np.ndarray  # int32 [S]

    # --- pattern metadata ---
    num_patterns: int
    pattern_lens: np.ndarray  # int32 [P] (byte lengths)
    max_len: int  # longest pattern in bytes (halo size driver)

    # --- lazily built engine tables ---
    _delta: Optional[np.ndarray] = field(default=None, repr=False)  # int32 [S,257]
    _byte_classes: Optional[np.ndarray] = field(default=None, repr=False)  # i32 [257]
    _delta_classed: Optional[np.ndarray] = field(default=None, repr=False)
    _sparse: Optional[tuple] = field(default=None, repr=False)

    # ------------------------------------------------------------------
    # Dense DFA table (Implementation.DFA analogue)
    # ------------------------------------------------------------------
    @property
    def delta(self) -> np.ndarray:
        """Dense ``int32 [S, 257]`` next-state table.

        ``delta[s, b]`` is the failure-resolved transition, i.e. the longest
        suffix of (string(s) + byte b) that is a trie node.  Column
        ``PAD_BYTE`` is all-root.
        """
        if self._delta is None:
            S = self.num_states
            delta = np.zeros((S, 257), dtype=np.int32)
            # Root row: default root, then its own edges.
            for b, v in self.goto[0].items():
                delta[0, b] = v
            # BFS order == increasing depth, so fail[u] is always finished.
            order = np.argsort(self.depth, kind="stable")
            for u in order[1:]:
                row = delta[self.fail[u]].copy()
                g = self.goto[u]
                if g:
                    row[list(g.keys())] = list(g.values())
                row[PAD_BYTE] = 0
                delta[u] = row
            self._delta = delta
        return self._delta

    # ------------------------------------------------------------------
    # Byte-class compressed table (Implementation.ContiguousNFA analogue)
    # ------------------------------------------------------------------
    @property
    def byte_classes(self) -> np.ndarray:
        """``int32 [257]`` map byte -> equivalence class.

        Two bytes are equivalent iff they label identical goto-edge sets, in
        which case their dense-table columns are identical as well (the
        failure closure is a function of the edge set alone).  The padding
        byte always gets its own dedicated final class.
        """
        if self._byte_classes is None:
            per_byte: dict[int, list] = {}
            for u, g in enumerate(self.goto):
                for b, v in g.items():
                    per_byte.setdefault(b, []).append((u, v))
            sig_to_class: dict[tuple, int] = {(): 0}
            classes = np.zeros(257, dtype=np.int32)
            for b in range(256):
                sig = tuple(per_byte.get(b, ()))
                cid = sig_to_class.setdefault(sig, len(sig_to_class))
                classes[b] = cid
            classes[PAD_BYTE] = len(sig_to_class)
            self._byte_classes = classes
        return self._byte_classes

    @property
    def num_classes(self) -> int:
        """Number of byte classes including the padding class."""
        return int(self.byte_classes.max()) + 1

    @property
    def delta_classed(self) -> np.ndarray:
        """Dense ``int32 [S, num_classes]`` table over byte classes."""
        if self._delta_classed is None:
            classes = self.byte_classes
            # One representative byte per class (padding class maps to the
            # all-root PAD_BYTE column).
            reps = np.zeros(self.num_classes, dtype=np.int64)
            reps[classes] = np.arange(257)
            self._delta_classed = np.ascontiguousarray(self.delta[:, reps])
        return self._delta_classed

    # ------------------------------------------------------------------
    # Sparse CSR representation (Implementation.NoncontiguousNFA analogue)
    # ------------------------------------------------------------------
    @property
    def sparse(self) -> tuple:
        """``(keys_int64_sorted, targets_int32, fail_int32)``.

        ``keys = state * 257 + byte`` sorted ascending; lookup by binary
        search, with failure-link walking done by the scan kernels.  This is
        the fast-build / low-memory / slow-search engine: the dense table is
        never materialised.
        """
        if self._sparse is None:
            n_edges = sum(len(g) for g in self.goto)
            keys = np.empty(n_edges, dtype=np.int64)
            targets = np.empty(n_edges, dtype=np.int32)
            i = 0
            for u, g in enumerate(self.goto):
                for b, v in g.items():
                    keys[i] = u * 257 + b
                    targets[i] = v
                    i += 1
            order = np.argsort(keys)
            self._sparse = (keys[order], targets[order], self.fail)
        return self._sparse

    # ------------------------------------------------------------------
    def stats(self) -> dict:
        """Compile-time observability counters (SURVEY.md §5: metrics)."""
        return {
            "num_states": self.num_states,
            "num_patterns": self.num_patterns,
            "max_pattern_len": self.max_len,
            "match_entries": int(self.match_offsets[-1]),
            "dense_table_bytes": self.num_states * 257 * 4,
            "classed_table_bytes": self.num_states * self.num_classes * 4,
            "num_byte_classes": self.num_classes,
        }


def build_automaton(patterns: Sequence[bytes]) -> Automaton:
    """Compile byte patterns into an :class:`Automaton`.

    Replaces the reference's trie-insert + BFS-failure-link construction
    (crate internals reached via /root/reference/src/lib.rs:186-215) with a
    host-side build that produces flat tables.  Patterns must be non-empty;
    the API layer enforces the reference's exact error messages.
    """
    goto: list[dict[int, int]] = [{}]
    depth_l: list[int] = [0]
    out: list[list[int]] = [[]]  # per-node pattern ids ending exactly here

    for pid, pat in enumerate(patterns):
        node = 0
        for b in pat:
            nxt = goto[node].get(b)
            if nxt is None:
                nxt = len(goto)
                goto[node][b] = nxt
                goto.append({})
                depth_l.append(depth_l[node] + 1)
                out.append([])
            node = nxt
        out[node].append(pid)

    S = len(goto)
    fail = np.zeros(S, dtype=np.int32)
    depth = np.asarray(depth_l, dtype=np.int32)

    # BFS failure links.
    queue: deque[int] = deque()
    for b, v in goto[0].items():
        fail[v] = 0
        queue.append(v)
    while queue:
        u = queue.popleft()
        fu = int(fail[u])
        for b, v in goto[u].items():
            queue.append(v)
            f = fu
            while True:
                nxt = goto[f].get(b)
                if nxt is not None and nxt != v:
                    fail[v] = nxt
                    break
                if f == 0:
                    fail[v] = 0 if nxt is None or nxt == v else nxt
                    break
                f = int(fail[f])

    # Match CSR: matches(v) = own pids (ascending) ++ matches(fail(v)).
    # Own pids all have length == depth[v] > depth[fail[v]] >= inherited
    # lengths, so the concatenation is (length desc, pid asc) ordered — the
    # same-end-position emission order of the reference
    # (/root/reference/tests/test_ac.py:276-288).
    pattern_lens = np.asarray([len(p) for p in patterns], dtype=np.int32)
    matches: list[tuple[int, ...]] = [()] * S
    order = np.argsort(depth, kind="stable")
    for u in order:
        own = tuple(out[u])
        inherited = matches[int(fail[u])] if u != 0 else ()
        matches[u] = own + inherited if own else inherited

    counts = np.asarray([len(m) for m in matches], dtype=np.int32)
    offsets = np.zeros(S + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    match_pids = np.asarray(
        [pid for m in matches for pid in m], dtype=np.int32
    )
    match_lens = pattern_lens[match_pids] if len(match_pids) else np.zeros(
        0, dtype=np.int32
    )

    return Automaton(
        num_states=S,
        goto=goto,
        fail=fail,
        depth=depth,
        match_offsets=offsets,
        match_pids=match_pids,
        match_lens=match_lens,
        match_count=counts,
        num_patterns=len(patterns),
        pattern_lens=pattern_lens,
        max_len=int(pattern_lens.max()) if len(pattern_lens) else 1,
    )
