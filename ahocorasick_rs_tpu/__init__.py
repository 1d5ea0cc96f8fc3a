"""ahocorasick_rs_tpu — TPU-native multi-pattern string matching.

A from-scratch JAX/XLA/Pallas re-design with the full capability set of the
reference ``ahocorasick_rs`` package (public surface:
/root/reference/pysrc/ahocorasick_rs/__init__.py:1-23): the automaton is
compiled host-side into dense tables, and haystacks are scanned by parallel
halo'd lane kernels on TPU, with data-parallel sharding across device meshes
for large corpora (``ahocorasick_rs_tpu.parallel``).
"""

from .api import AhoCorasick, BytesAhoCorasick
from .models.engine import Implementation, MatchKind
from .utils.serialization import load_matcher, save_matcher

# Backwards compatibility aliases, mirroring the reference
# (/root/reference/pysrc/ahocorasick_rs/__init__.py:9-12).
MATCHKIND_STANDARD = MatchKind.Standard
MATCHKIND_LEFTMOST_FIRST = MatchKind.LeftmostFirst
MATCHKIND_LEFTMOST_LONGEST = MatchKind.LeftmostLongest

__all__ = [
    "AhoCorasick",
    "BytesAhoCorasick",
    "MatchKind",
    "Implementation",
    # TPU extras (no reference counterpart):
    "save_matcher",
    "load_matcher",
    # Deprecated:
    "MATCHKIND_STANDARD",
    "MATCHKIND_LEFTMOST_FIRST",
    "MATCHKIND_LEFTMOST_LONGEST",
]

__version__ = "0.1.0"
