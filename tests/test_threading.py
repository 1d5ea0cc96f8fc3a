"""Thread-safety of shared matchers (reference C11: GIL management).

The reference documents free-threaded use (gil_used = false,
/root/reference/src/lib.rs:438) with immutable automata.  Here the compiled
tables are NumPy/JAX arrays that are never mutated after construction, and
native scans drop the GIL for their whole duration (ctypes).  These tests
pin correctness under concurrent use — results must be identical to the
single-threaded ones from every thread.
"""

from __future__ import annotations

import threading

from ahocorasick_rs_tpu import AhoCorasick, BytesAhoCorasick


def _run_concurrently(n_threads, fn):
    errors = []
    barrier = threading.Barrier(n_threads)

    def worker():
        try:
            barrier.wait()
            fn()
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_concurrent_scans_shared_matcher():
    ac = AhoCorasick(["hello", "world", "lo wo"])
    hay = "hello world " * 2000
    want = ac.find_matches_as_indexes(hay)

    def scan():
        for _ in range(20):
            assert ac.find_matches_as_indexes(hay) == want

    _run_concurrently(8, scan)


def test_concurrent_scans_bytes_native_tier():
    pats = [b"abc", b"bcd", b"cde\x00f"]
    ac = BytesAhoCorasick(pats, backend="native")
    hay = b"xabcdex" * 5000 + b"cde\x00f"
    want = ac.find_matches_as_indexes(hay)

    def scan():
        for _ in range(10):
            assert ac.find_matches_as_indexes(hay) == want

    _run_concurrently(6, scan)


def test_concurrent_construction():
    results = {}

    def build(i):
        ac = AhoCorasick([f"pat{j}" for j in range(2000)])
        results[i] = ac.find_matches_as_indexes("xx pat7 yy pat1999")

    _run_concurrently(
        4,
        lambda: build(threading.get_ident()),
    )
    want = AhoCorasick(
        [f"pat{j}" for j in range(2000)]
    ).find_matches_as_indexes("xx pat7 yy pat1999")
    assert len(results) == 4
    assert all(v == want for v in results.values())
