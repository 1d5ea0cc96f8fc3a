"""The CI differential-conformance harness runs end-to-end (self-test).

The real run (vs the actual ``ahocorasick_rs`` wheel) only exists in CI —
the dev rig has no network — so this pins the harness *logic*: case
generation, the comparison loop, the error-text section, and the exit
protocol, with this package standing in for the reference.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_conformance_harness_self_test() -> None:
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "conformance_vs_reference.py"),
            "--self-test",
            "--min-tuple-checks",
            "2000",
            "--max-seconds",
            "60",
            "--seed",
            "7",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "PASS: zero divergences" in r.stdout
    # the error-text section must have exercised every pinned path
    assert r.stdout.count("error-text OK") == 10, r.stdout


def test_bench_harness_self_test(tmp_path) -> None:
    out = tmp_path / "b.md"
    jout = tmp_path / "b.json"
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "bench_vs_reference.py"),
            "--self-test",
            "--long-haystacks",
            "200",
            "--out",
            str(out),
            "--json-out",
            str(jout),
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "Competitor benchmark" in out.read_text()
