"""SIMD-prefilter compiler (the TPU analogue of the crate's Teddy).

The reference's speed comes largely from SIMD prefilters buried in the
``aho-corasick`` crate (SURVEY.md §2.2 X10: memchr/Teddy).  On TPU, the
bottleneck of the dense-DFA scan is the per-byte table *gather* — slow on
the VPU — while bitwise ops and in-register 128-lane shuffles are cheap.
This module compiles the pattern set into Teddy-style nibble tables the
Pallas fire kernel (``ops/scan_teddy.py``) consumes:

* patterns are grouped into 32 buckets (bit per bucket in an int32 mask) by
  sorted first-``m``-byte prefix, so co-bucketed patterns share fingerprints;
* for each fingerprint position ``k < m`` there are two 16-entry nibble
  tables (low/high); a byte is "allowed" for a bucket at ``k`` iff some
  member pattern has that nibble pair at ``k`` (or is shorter than ``k+1``,
  which makes the position unconstrained for that bucket);
* a position *fires* when ``AND_k tables_k[haystack[i+k]]`` is non-zero.

Soundness: if pattern ``p`` occurs at position ``i``, every fingerprint
position matches exactly, so ``p``'s bucket bit survives all ANDs — no
false negatives.  False positives are discarded by exact windowed
verification.  ``est_fire_rate`` estimates selectivity so the scan layer
can skip the prefilter for pattern sets where it cannot pay off.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

#: fingerprint length (bytes of each pattern's prefix used by the filter)
FINGERPRINT_LEN = 3
#: bucket count — one bit each in an int32 lane
NUM_BUCKETS = 32


@dataclass
class Prefilter:
    m: int
    #: int32 [8, 128]; row 2k = low-nibble table for position k, row 2k+1 =
    #: high-nibble table; only lanes 0..15 are meaningful, rest are zero.
    tables: np.ndarray
    bucket_of: np.ndarray  # int32 [P]
    est_fire_rate: float

    def byte_allowed(self) -> np.ndarray:
        """bool [m, 256, 32]: is byte allowed for (position, bucket)?"""
        t = self.tables.view(np.uint32)
        bytes_ = np.arange(256)
        out = np.zeros((self.m, 256, NUM_BUCKETS), dtype=bool)
        for k in range(self.m):
            mask = t[2 * k, bytes_ & 15] & t[2 * k + 1, bytes_ >> 4]
            out[k] = (mask[:, None] >> np.arange(NUM_BUCKETS)) & 1
        return out


def build_prefilter(patterns: Sequence[bytes]) -> Optional[Prefilter]:
    """Compile nibble tables; returns None for degenerate inputs."""
    P = len(patterns)
    if P == 0:
        return None
    m = FINGERPRINT_LEN

    # Bucket by sorted prefix so similar fingerprints share bucket bits.
    order = sorted(range(P), key=lambda i: patterns[i][:m])
    bucket_of = np.zeros(P, dtype=np.int32)
    per_bucket = -(-P // NUM_BUCKETS)
    for rank, pid in enumerate(order):
        bucket_of[pid] = min(rank // per_bucket, NUM_BUCKETS - 1)

    tables = np.zeros((8, 128), dtype=np.uint32)
    for pid, p in enumerate(patterns):
        bit = np.uint32(1) << np.uint32(bucket_of[pid])
        for k in range(m):
            if k < len(p):
                tables[2 * k, p[k] & 15] |= bit
                tables[2 * k + 1, p[k] >> 4] |= bit
            else:
                tables[2 * k, 0:16] |= bit
                tables[2 * k + 1, 0:16] |= bit

    pf = Prefilter(
        m=m,
        tables=tables.view(np.int32),
        bucket_of=bucket_of,
        est_fire_rate=0.0,
    )
    # Uniform-byte selectivity estimate: P(fire) ≈ Σ_β Π_k frac_allowed.
    allowed = pf.byte_allowed()  # [m, 256, 32]
    frac = allowed.mean(axis=1)  # [m, 32]
    pf.est_fire_rate = float(np.minimum(frac.prod(axis=0).sum(), 1.0))
    return pf
