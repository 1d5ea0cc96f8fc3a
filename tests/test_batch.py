"""Batched many-small-haystack API (TPU extra; no reference counterpart).

The reference's primary benchmark workload is 10k-100k short haystacks
(/root/reference/benchmarks/test_comparison.py:16-53); the batch API scans
them in one device dispatch.  The contract under test: batched output is
exactly the per-haystack loop's output, for every matchkind, both classes,
and both the dense-batch and prefiltered device paths.
"""

from __future__ import annotations

import numpy as np
import pytest

from ahocorasick_rs_tpu import (
    AhoCorasick,
    BytesAhoCorasick,
    MatchKind,
)

DOCS = [
    "the winter of my discontent",
    "",
    "no hits here at all",
    "disco disco disco",
    "made glorious summer by this sun of york",
    "content discontent disc",
    "x" * 200,
    "winter winter",
]
PATTERNS = ["content", "disco", "disc", "discontent", "winter", "summer"]


@pytest.mark.parametrize(
    "kind",
    [MatchKind.Standard, MatchKind.LeftmostFirst, MatchKind.LeftmostLongest],
)
@pytest.mark.parametrize("backend", ["auto", "device"])
def test_batch_indexes_equals_loop_str(kind, backend):
    ac = AhoCorasick(PATTERNS, matchkind=kind, backend=backend)
    want = [ac.find_matches_as_indexes(d) for d in DOCS]
    got = ac.find_matches_as_indexes_batch(DOCS)
    assert got == want


def test_batch_overlapping_str():
    ac = AhoCorasick(PATTERNS, backend="device")
    want = [ac.find_matches_as_indexes(d, overlapping=True) for d in DOCS]
    got = ac.find_matches_as_indexes_batch(DOCS, overlapping=True)
    assert got == want


def test_batch_overlapping_rejected_for_leftmost():
    ac = AhoCorasick(PATTERNS, matchkind=MatchKind.LeftmostFirst)
    with pytest.raises(ValueError):
        ac.find_matches_as_indexes_batch(DOCS, overlapping=True)


def test_batch_strings_str():
    ac = AhoCorasick(PATTERNS, backend="device")
    want = [ac.find_matches_as_strings(d) for d in DOCS]
    assert ac.find_matches_as_strings_batch(DOCS) == want


def test_batch_unicode_codepoint_indexes():
    docs = ["héllo wörld", "ffi wörld", "plain ascii world", "wörldwörld"]
    ac = AhoCorasick(["wörld", "world"], backend="device")
    want = [ac.find_matches_as_indexes(d) for d in docs]
    assert ac.find_matches_as_indexes_batch(docs) == want


def test_batch_bytes_equals_loop():
    pats = [b"\x00\x01", b"abc", b"c\xffd"]
    docs = [b"xx\x00\x01yy", b"", b"abcabc", b"c\xffd\x00\x01", b"zzz"]
    ac = BytesAhoCorasick(pats, backend="device")
    want = [ac.find_matches_as_indexes(d) for d in docs]
    assert ac.find_matches_as_indexes_batch(docs) == want


def test_batch_type_error():
    ac = AhoCorasick(PATTERNS)
    with pytest.raises(TypeError):
        ac.find_matches_as_indexes_batch(["ok", b"not a str"])


def test_batch_teddy_path_matches_dense():
    """Force the prefiltered batch pipeline and compare with the loop."""
    rng = np.random.default_rng(7)
    pats = [
        "".join(chr(rng.integers(97, 123)) for _ in range(5))
        for _ in range(40)
    ]
    docs = []
    for i in range(50):
        body = "".join(chr(rng.integers(97, 123)) for _ in range(70))
        if i % 3 == 0:
            p = pats[int(rng.integers(0, len(pats)))]
            k = int(rng.integers(0, 60))
            body = body[:k] + p + body[k:]
        docs.append(body)
    ac = AhoCorasick(pats, backend="device")
    ac._teddy_state = "force"
    got = ac.find_matches_as_indexes_batch(docs)
    ac2 = AhoCorasick(pats, backend="python")
    want = [ac2.find_matches_as_indexes(d) for d in docs]
    assert got == want


def test_batch_many_docs_wide_lengths():
    """Length spread across bucket boundaries; per-doc split correctness."""
    rng = np.random.default_rng(11)
    pats = ["needle", "pin", "haystackneedle"]
    docs = []
    for i in range(300):
        n = int(rng.integers(0, 500))
        body = "".join(chr(rng.integers(97, 123)) for _ in range(n))
        if i % 5 == 0:
            body = body + "needle" + body[: max(0, 20 - n)]
        if i % 7 == 0:
            body = "pin" + body
        docs.append(body)
    ac = AhoCorasick(pats, backend="device")
    want = [ac.find_matches_as_indexes(d) for d in docs]
    assert ac.find_matches_as_indexes_batch(docs) == want


@pytest.mark.parametrize(
    "kind",
    [MatchKind.Standard, MatchKind.LeftmostFirst, MatchKind.LeftmostLongest],
)
def test_native_batch_equals_loop(kind):
    """Sub-device-tier batches take ONE native call; output == loop."""
    from ahocorasick_rs_tpu.models import native

    if not native.available():
        pytest.skip("no native toolchain")
    ac = AhoCorasick(PATTERNS, matchkind=kind)  # auto routes native_batch
    want = [ac.find_matches_as_indexes(d) for d in DOCS]
    got = ac.find_matches_as_indexes_batch(DOCS)
    assert got == want
    assert ac.stats()["last_backend"] == "native_batch"


def test_native_batch_overlapping():
    from ahocorasick_rs_tpu.models import native

    if not native.available():
        pytest.skip("no native toolchain")
    ac = AhoCorasick(PATTERNS)
    want = [ac.find_matches_as_indexes(d, overlapping=True) for d in DOCS]
    got = ac.find_matches_as_indexes_batch(DOCS, overlapping=True)
    assert got == want
    assert ac.stats()["last_backend"] == "native_batch"


def test_native_batch_classed_engine():
    from ahocorasick_rs_tpu.models import native
    from ahocorasick_rs_tpu import Implementation

    if not native.available():
        pytest.skip("no native toolchain")
    ac = AhoCorasick(
        PATTERNS, implementation=Implementation.ContiguousNFA
    )
    want = [ac.find_matches_as_indexes(d) for d in DOCS]
    assert ac.find_matches_as_indexes_batch(DOCS) == want


def test_batch_teddy_doc_edges():
    """Tight COARSE-aligned staging: patterns at exact doc ends, doc
    lengths on/off 16-byte boundaries, and no cross-padding matches."""
    pats = ["endx", "xxendx", "aaaa"]
    docs = [
        "a" * 12 + "endx",        # len 16, match ends exactly at doc end
        "b" * 16,                  # exact multiple of 16, no match
        "endx",                    # the whole doc is the pattern
        "c" * 29 + "end",          # 'endx' would only match into padding
        "x" * 3 + "endx" + "y" * 25,
        "aaaa" * 10,               # overlapping repeats across groups
    ]
    ac = AhoCorasick(pats, backend="device")
    ac._teddy_state = "force"
    got = ac.find_matches_as_indexes_batch(docs)
    ref = AhoCorasick(pats, backend="python")
    want = [ref.find_matches_as_indexes(d) for d in docs]
    assert got == want
    got_o = ac.find_matches_as_indexes_batch(docs, overlapping=True)
    want_o = [ref.find_matches_as_indexes(d, overlapping=True) for d in docs]
    assert got_o == want_o


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:

    @settings(max_examples=60, deadline=None)
    @given(
        docs=st.lists(
            st.text(alphabet="abc ", min_size=0, max_size=60),
            min_size=0,
            max_size=20,
        ),
        kind=st.sampled_from(
            [
                MatchKind.Standard,
                MatchKind.LeftmostFirst,
                MatchKind.LeftmostLongest,
            ]
        ),
        backend=st.sampled_from(["auto", "device"]),
        stage_budget=st.sampled_from([None, 64, 256]),
    )
    def test_batch_equals_loop_property(docs, kind, backend, stage_budget):
        """The global-resolve batch pipeline == the per-doc loop, for any
        document mix (empty docs, boundary-adjacent matches, repeats) —
        including under tiny staging budgets that force the grouped
        multi-dispatch path."""
        from ahocorasick_rs_tpu import api

        pats = ["a", "ab", "abc", "ca b", "bb"]
        orig = api.BATCH_STAGE_BYTES
        if stage_budget is not None:
            api.BATCH_STAGE_BYTES = stage_budget
        try:
            _run_batch_property(docs, kind, backend, pats)
        finally:
            api.BATCH_STAGE_BYTES = orig

    def _run_batch_property(docs, kind, backend, pats):
        ac = AhoCorasick(pats, matchkind=kind, backend=backend)
        want = [ac.find_matches_as_indexes(d) for d in docs]
        assert ac.find_matches_as_indexes_batch(docs) == want
        if kind is MatchKind.Standard:
            want_o = [
                ac.find_matches_as_indexes(d, overlapping=True)
                for d in docs
            ]
            got_o = ac.find_matches_as_indexes_batch(
                docs, overlapping=True
            )
            assert got_o == want_o


def test_plan_batch_groups_budget_and_waste():
    """Grouping invariants: every group stages <= the budget, no document
    is padded past _BATCH_WASTE x its own length, indices partition."""
    from ahocorasick_rs_tpu import api

    rng = np.random.default_rng(3)
    lens = (
        [60_000]
        + [int(x) for x in rng.integers(20, 200, 500)]
        + [0, 1, 15, 16, 17]
    )
    budget = 1 << 16
    orig = api.BATCH_STAGE_BYTES
    api.BATCH_STAGE_BYTES = budget
    try:
        groups = api._plan_batch_groups(lens)
    finally:
        api.BATCH_STAGE_BYTES = orig
    seen = sorted(i for g in groups for i in g)
    assert seen == list(range(len(lens)))
    for g in groups:
        Tp = 1 << (max(max(lens[i] for i in g), 16) - 1).bit_length()
        rows = 1 << max(len(g) - 1, 7).bit_length()  # pow2 row padding
        if len(g) > 1:  # singletons route via the streaming path
            assert rows * Tp <= budget
        for k, i in enumerate(g):
            # waste vs the doc's *achievable* pow2 staging, not raw
            # length — enforced only once the group stages >= the
            # waste-rule floor (below it an extra dispatch costs more)
            tmin = 1 << (max(lens[i], 16) - 1).bit_length()
            assert (
                tmin * api._BATCH_WASTE >= Tp
                or (k + 1) * Tp < api._WASTE_MIN_BYTES
            )
    # uniform small batches come back as ONE group (the fast path)
    assert len(api._plan_batch_groups([70] * 1000)) == 1
    # tiny docs must not fragment (code-review r4 finding: the old waste
    # check compared raw length against the 16-byte T floor)
    assert len(api._plan_batch_groups([3] * 1000)) == 1
    assert len(api._plan_batch_groups([17] + [3] * 100)) <= 2
    # sub-MB mixed batches stay in ONE group (an extra dispatch costs
    # more than the padding) — the dryrun_multichip batch shape
    assert len(api._plan_batch_groups([679, 582, 97, 0, 291, 45])) == 1
    # ...but a huge-T group still sheds tiny docs once it stages >= 1MB
    skew = api._plan_batch_groups([60_000] + [100] * 40_000)
    assert len(skew) > 1
    assert max(len(g) for g in skew) > 1000  # tinies grouped, not shards


def test_plan_batch_groups_accounts_mesh_row_roundup():
    """On a non-power-of-two mesh the staged row count rounds up to a
    multiple of the mesh size (scan_sharded_batch's equal-row-block
    padding); the budget check must account for that padding, not just
    the pow2 rows (advisor r4 finding)."""
    from ahocorasick_rs_tpu import api

    budget = 1 << 16
    orig = api.BATCH_STAGE_BYTES
    api.BATCH_STAGE_BYTES = budget
    try:
        # 1024-byte docs: pow2 T = 1024.  64 rows * 1024 = 64KB = budget,
        # but a 7-device mesh pads 64 rows -> 70 rows = 70KB > budget, so
        # the mesh-aware plan must close groups earlier.
        lens = [1024] * 64
        flat = api._plan_batch_groups(lens, n_dev=1)
        meshy = api._plan_batch_groups(lens, n_dev=7)
        assert len(flat) == 1
        for g in meshy:
            rows = 1 << max(len(g) - 1, 7).bit_length()
            rows = -(-rows // 7) * 7
            if len(g) > 1:
                assert rows * 1024 <= budget
    finally:
        api.BATCH_STAGE_BYTES = orig


def test_batch_skewed_lengths_grouped(monkeypatch):
    """One long + many short documents with a tiny staging budget: the
    grouped dispatch path must stage within budget and stay bit-exact
    with the per-document loop (VERDICT r3 weak #1)."""
    from ahocorasick_rs_tpu import api

    monkeypatch.setattr(api, "BATCH_STAGE_BYTES", 1 << 14)
    rng = np.random.default_rng(5)
    pats = ["needle", "pin", "abc"]
    docs = ["x" * 1000 + "needle" + "y" * 1000]
    for i in range(150):
        n = int(rng.integers(0, 50))
        body = "".join(chr(rng.integers(97, 123)) for _ in range(n))
        if i % 4 == 0:
            body += "pin"
        docs.append(body)
    plan = api._plan_batch_groups([len(d.encode()) for d in docs])
    assert len(plan) > 1  # the skew actually exercises grouping
    ac = AhoCorasick(pats, backend="device")
    want = [ac.find_matches_as_indexes(d) for d in docs]
    assert ac.find_matches_as_indexes_batch(docs) == want
    # overlapping too (different bounds logic in resolve_batch)
    want_o = [ac.find_matches_as_indexes(d, overlapping=True) for d in docs]
    got_o = ac.find_matches_as_indexes_batch(docs, overlapping=True)
    assert got_o == want_o


def test_batch_over_budget_doc_routes_single(monkeypatch):
    """A single document larger than the staging budget goes through the
    streaming single-doc path; the rest still batch."""
    from ahocorasick_rs_tpu import api

    monkeypatch.setattr(api, "BATCH_STAGE_BYTES", 1 << 12)
    pats = ["needle", "pin"]
    big = "z" * 3000 + "needle" + "z" * 3000
    docs = [big, "pin here", "nothing", "needle at start"]
    ac = AhoCorasick(pats, backend="device")
    want = [ac.find_matches_as_indexes(d) for d in docs]
    assert ac.find_matches_as_indexes_batch(docs) == want


def test_batch_teddy_staged_size_gate():
    """The prefiltered batch path gates on staged B*T, not sum(len):
    with skew the padded buffer can exceed the int32-safe cap while the
    byte total does not (ADVICE r3 medium).  The batch must fall through
    to the dense path and stay exact."""
    # lengths within the 4x waste factor, so grouping keeps ONE group and
    # the staged buffer is ~3.7x the byte total
    pats = ["endx", "aaaa"]
    docs = ["q" * 1996 + "endx"] * 10 + ["aaaa" * 128] * 400
    cap = 400_000
    ac = AhoCorasick(pats, backend="device")
    ac._teddy_state = "force"
    ac._TEDDY_MAX_BYTES = cap
    total = sum(len(d) for d in docs)
    B, longest = len(docs), max(len(d) for d in docs)
    T = -(-longest // 16) * 16
    assert total <= cap < B * T
    from ahocorasick_rs_tpu import api

    assert len(api._plan_batch_groups([len(d) for d in docs])) == 1
    ref = AhoCorasick(pats, backend="python")
    want = [ref.find_matches_as_indexes(d) for d in docs]
    assert ac.find_matches_as_indexes_batch(docs) == want
    assert ac.stats()["last_backend"] == "device_batch"


@pytest.mark.parametrize(
    "kind",
    [MatchKind.Standard, MatchKind.LeftmostFirst, MatchKind.LeftmostLongest],
)
def test_batch_sharded_mesh_equals_loop(kind):
    """mesh-routed batch: rows shard across the 8-device mesh (no halo),
    output equals the per-document loop, last_backend records the tier
    (VERDICT r3 item 6)."""
    ac = AhoCorasick(PATTERNS, matchkind=kind, backend="sharded")
    want = [ac.find_matches_as_indexes(d) for d in DOCS]
    got = ac.find_matches_as_indexes_batch(DOCS)
    assert got == want
    assert ac.stats()["last_backend"] == "sharded_batch"
    if kind is MatchKind.Standard:
        want_o = [
            ac.find_matches_as_indexes(d, overlapping=True) for d in DOCS
        ]
        got_o = ac.find_matches_as_indexes_batch(DOCS, overlapping=True)
        assert got_o == want_o


def test_batch_sharded_teddy_equals_loop():
    """Prefiltered batch over the mesh: force the Teddy pipeline and
    compare with the python-tier loop (staged flat buffer sharded like a
    single haystack; matches filtered to their owning document)."""
    rng = np.random.default_rng(9)
    pats = [
        "".join(chr(rng.integers(97, 123)) for _ in range(5))
        for _ in range(40)
    ]
    docs = []
    for i in range(60):
        body = "".join(chr(rng.integers(97, 123)) for _ in range(90))
        if i % 3 == 0:
            p = pats[int(rng.integers(0, len(pats)))]
            k = int(rng.integers(0, 80))
            body = body[:k] + p + body[k:]
        docs.append(body)
    ac = AhoCorasick(pats, backend="sharded")
    ac._teddy_state = "force"
    got = ac.find_matches_as_indexes_batch(docs)
    assert ac.stats()["last_backend"] == "teddy_sharded_batch"
    ref = AhoCorasick(pats, backend="python")
    want = [ref.find_matches_as_indexes(d) for d in docs]
    assert got == want


def test_batch_sharded_uneven_rows():
    """Row counts not divisible by the mesh size: padding rows are length
    0 and must not contribute matches."""
    pats = ["aa", "b"]
    docs = ["aa", "xbx", "aabaa"]  # 3 docs over an 8-device mesh
    ac = AhoCorasick(pats, backend="sharded")
    want = [ac.find_matches_as_indexes(d) for d in docs]
    assert ac.find_matches_as_indexes_batch(docs) == want


def test_batch_memoryview_inputs():
    pats = [b"ab", b"\x00"]
    docs = [memoryview(b"xxabx"), bytearray(b"\x00ab"), b""]
    ac = BytesAhoCorasick(pats)
    want = [ac.find_matches_as_indexes(d) for d in docs]
    assert ac.find_matches_as_indexes_batch(docs) == want


def test_stats_counters_accumulate():
    """stats() exposes runtime scan counters (SURVEY §5 metrics)."""
    ac = AhoCorasick(PATTERNS)
    s0 = ac.stats()
    assert s0["scan_calls"] == 0 and s0["last_backend"] is None
    ac.find_matches_as_indexes("the winter of my discontent")
    ac.find_matches_as_indexes_batch(DOCS)
    s = ac.stats()
    assert s["scan_calls"] >= 2
    assert s["scan_bytes"] > 0
    assert s["scan_seconds"] > 0
    assert s["scan_bytes_per_second"] > 0
    assert s["last_backend"] is not None
    assert s["implementation"] == "DFA"


def test_auto_routing_amortizes_table_upload():
    """auto keeps big-table matchers on the host until cumulative scanned
    bytes reach the table size, then switches to the device tier."""
    import string

    rng = np.random.default_rng(2)
    letters = np.frombuffer(string.ascii_lowercase.encode(), np.uint8)
    pats = set()
    while len(pats) < 800:
        pats.add(bytes(letters[rng.integers(0, 26, 8)]).decode())
    ac = AhoCorasick(sorted(pats))
    table_bytes = ac.stats()["num_states"] * 257 * 4
    hay = bytes(letters[rng.integers(0, 26, 3 << 20)]).decode()
    want = ac.find_matches_as_indexes(hay)
    seen = len(hay)
    backends = [ac.stats()["last_backend"]]
    for _ in range(6):
        got = ac.find_matches_as_indexes(hay)
        assert got == want
        expect_device = seen + len(hay) >= table_bytes
        seen += len(hay)
        backends.append(ac.stats()["last_backend"])
        if expect_device:
            break
    # host tiers first, device (or its teddy variant) once amortized
    assert backends[0] in ("native", "numpy")
    assert backends[-1] in ("device", "teddy", "teddy_sharded")


def test_plan_batch_groups_row_floor_is_min_lanes():
    """12 x 10MB docs: 8 rows x 16MB stages exactly the 128MB budget, so
    the planner must form an 8-doc group, not twelve singletons (the row
    padding floor is scan_device_batch's MIN_LANES=8)."""
    from ahocorasick_rs_tpu import api

    groups = api._plan_batch_groups([10 * (1 << 20)] * 12)
    assert max(len(g) for g in groups) == 8


def test_single_doc_forced_device_batch_streams(monkeypatch):
    """A 1-document batch over the staging budget streams through the
    single-doc path even when it is the ONLY group (the batch kernel
    would stage MIN_LANES x pow2(T))."""
    from ahocorasick_rs_tpu import api

    monkeypatch.setattr(api, "BATCH_STAGE_BYTES", 1 << 12)
    doc = "z" * 5000 + "needle" + "z" * 2000
    ac = AhoCorasick(["needle"], backend="device")
    want = [ac.find_matches_as_indexes(doc)]
    assert ac.find_matches_as_indexes_batch([doc]) == want


def test_grouped_batch_tier_not_overwritten_by_singleton(monkeypatch):
    """A trailing streamed singleton must not reclassify the batched
    bytes' tier in stats()/the router EMA."""
    from ahocorasick_rs_tpu import api

    monkeypatch.setattr(api, "BATCH_STAGE_BYTES", 1 << 16)
    monkeypatch.setattr(api, "_WASTE_MIN_BYTES", 1 << 10)
    docs = ["a" * 3000 + "needle", "b" * 3000, "pin"]  # [[0,1],[2]] plan
    plan = api._plan_batch_groups([len(d) for d in docs])
    assert [len(g) for g in plan] == [2, 1]
    ac = AhoCorasick(["needle", "pin"], backend="device")
    want = [ac.find_matches_as_indexes(d) for d in docs]
    assert ac.find_matches_as_indexes_batch(docs) == want
    assert ac.stats()["last_backend"] in (
        "device_batch", "teddy_batch", "sharded_batch"
    )
