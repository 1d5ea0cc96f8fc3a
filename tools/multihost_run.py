"""Execute the multihost layer for real: an N-process jax.distributed run.

Spawns ``--num-processes`` copies of ``ahocorasick_rs_tpu.parallel.multihost``
on localhost (coordinator ``127.0.0.1:<port>``, CPU backend,
``--devices-per-process`` virtual devices each), verifies every process
produced identical match digests for all four public semantics, checks them
against a single-process ground truth, and writes the scaling artifact
(``SCALING_r04.json`` by default).

This is the executed evidence for SURVEY.md §2.3 (collective match
reduction) and §5 (distributed communication backend): the sharded scan
actually running as multiple OS processes with gloo-backed collectives —
not scaffolding.  On this 2-core rig the throughput numbers are
contention-bound (see the caveat written into the artifact); the
correctness claim (bit-exact multi-process output) is rig-independent.

Usage::

    python tools/multihost_run.py [--nbytes 4194304] [--out SCALING_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def spawn_workers(
    num_processes: int,
    devices_per_process: int,
    nbytes: int,
    timeout: float = 600.0,
    cpu_pins: list[int] | None = None,
    repeats: int = 3,
) -> list[dict]:
    """Run the multihost worker as ``num_processes`` subprocesses.

    ``cpu_pins`` optionally pins process ``i`` to core ``cpu_pins[i]``
    (taskset) so weak-scaling comparisons measure cross-process overhead,
    not core contention.  Returns the per-process result records; raises
    on any nonzero exit.
    """
    port = _free_port()
    tmp = tempfile.mkdtemp(prefix="mh_")
    procs = []
    outs = []
    logs = []
    for pid in range(num_processes):
        out = os.path.join(tmp, f"proc{pid}.json")
        outs.append(out)
        logs.append(os.path.join(tmp, f"proc{pid}.log"))
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={devices_per_process}"
        )
        env["PYTHONPATH"] = (
            env.get("PYTHONPATH", "") + os.pathsep + REPO
        ).lstrip(os.pathsep)
        pin = (
            ["taskset", "-c", str(cpu_pins[pid % len(cpu_pins)])]
            if cpu_pins
            else []
        )
        procs.append(
            subprocess.Popen(
                pin
                + [
                    sys.executable,
                    "-m",
                    "ahocorasick_rs_tpu.parallel.multihost",
                    "--coordinator",
                    f"127.0.0.1:{port}",
                    "--num-processes",
                    str(num_processes),
                    "--process-id",
                    str(pid),
                    "--platform",
                    "cpu",
                    "--nbytes",
                    str(nbytes),
                    "--repeats",
                    str(repeats),
                    "--out",
                    out,
                ],
                env=env,
                cwd=REPO,
                # log files, NOT pipes: a worker that fills a 64KB pipe
                # buffer while the parent waits on a sibling would stall
                # inside a collective and deadlock the whole run
                # (code-review r4 finding)
                stdout=open(logs[pid], "w"),
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    records = []
    failures = []
    for pid, p in enumerate(procs):
        try:
            p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            p.communicate()
            failures.append((pid, "timeout"))
            continue
        if p.returncode != 0:
            failures.append((pid, f"exit {p.returncode}"))
            continue
        with open(outs[pid]) as f:
            records.append(json.load(f))
    if failures:
        parts = []
        for pid, why in failures:
            try:
                with open(logs[pid]) as f:
                    tail = f.read()[-2000:]
            except OSError:
                tail = "<no log>"
            parts.append(f"--- process {pid} ({why}) ---\n{tail}")
        raise RuntimeError(
            "multihost workers failed:\n" + "\n".join(parts)
        )
    return records


def single_process_truth(nbytes: int) -> dict:
    """Ground-truth digests from a plain single-process host scan."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ahocorasick_rs_tpu.api import AhoCorasick
    from ahocorasick_rs_tpu.models.engine import MatchKind
    from ahocorasick_rs_tpu.parallel.multihost import (
        _match_digest,
        demo_corpus,
    )

    pats, hay = demo_corpus(nbytes)
    out = {}
    for kind, overlapping in [
        (MatchKind.Standard, False),
        (MatchKind.Standard, True),
        (MatchKind.LeftmostFirst, False),
        (MatchKind.LeftmostLongest, False),
    ]:
        ac = AhoCorasick(pats, matchkind=kind)
        matches = ac.find_matches_as_indexes(hay, overlapping=overlapping)
        name = kind.name + ("_overlapping" if overlapping else "")
        out[name] = {
            "matches": len(matches),
            "digest": _match_digest(matches),
        }
    return out


def weak_scaling(
    nbytes_per_proc: int, repeats: int = 8, runs: int = 2
) -> dict:
    """Fair weak scaling on a 2-core rig: 1 process x 1 device x 1 pinned
    core vs 2 processes x 1 device x 1 pinned core each, per-process work
    constant.  With one core per process in both configs, the ratio
    isolates the cross-process (gloo collective + fetch) cost — the
    quantity the BASELINE >=85% target is about — instead of core
    contention.
    """
    t1 = min(
        spawn_workers(
            1, 1, nbytes_per_proc, cpu_pins=[0], repeats=repeats,
            timeout=1800.0,
        )[0]["scan_seconds_best"]
        for _ in range(runs)
    )
    t2 = min(
        min(
            r["scan_seconds_best"]
            for r in spawn_workers(
                2, 1, 2 * nbytes_per_proc, cpu_pins=[0, 1],
                repeats=repeats, timeout=1800.0,
            )
        )
        for _ in range(runs)
    )
    return {
        "nbytes_per_process": nbytes_per_proc,
        "seconds_1proc": t1,
        "seconds_2proc": t2,
        "bytes_per_s_1proc": nbytes_per_proc / t1,
        "bytes_per_s_2proc": 2 * nbytes_per_proc / t2,
        "weak_scaling_efficiency": round(t1 / t2, 4),
        "method": (
            "taskset-pinned 1 core per process in both configs; "
            "per-process bytes constant"
        ),
    }


def independent_pair(nbytes: int, repeats: int = 6, runs: int = 2) -> float:
    """Best per-process seconds when TWO UNRELATED 1-process workers run
    simultaneously (separate coordinators, pinned to cores 0 and 1).

    No collectives exist between them, so the ratio solo/pair isolates
    pure memory-system contention of this 2-core VM — the term that must
    be subtracted before reading the 2-process sharded ratio as a
    *communication* efficiency (the quantity the BASELINE >=85% target
    is about; real multi-chip fabrics have per-chip HBM).
    """
    import subprocess
    import tempfile

    best = float("inf")
    for _ in range(runs):
        tmp = tempfile.mkdtemp(prefix="mh_ind_")
        procs = []
        outs = []
        for idx, core in ((0, 0), (1, 1)):
            port = _free_port()
            out = os.path.join(tmp, f"ind{idx}.json")
            outs.append(out)
            env = dict(os.environ)
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=1"
            )
            env["PYTHONPATH"] = (
                env.get("PYTHONPATH", "") + os.pathsep + REPO
            ).lstrip(os.pathsep)
            procs.append(
                subprocess.Popen(
                    [
                        "taskset", "-c", str(core),
                        sys.executable, "-m",
                        "ahocorasick_rs_tpu.parallel.multihost",
                        "--coordinator", f"127.0.0.1:{port}",
                        "--num-processes", "1",
                        "--process-id", "0",
                        "--platform", "cpu",
                        "--nbytes", str(nbytes),
                        "--repeats", str(repeats),
                        "--out", out,
                    ],
                    env=env,
                    cwd=REPO,
                    stdout=open(os.path.join(tmp, f"ind{idx}.log"), "w"),
                    stderr=subprocess.STDOUT,
                )
            )
        for p in procs:
            p.communicate(timeout=1800)
            if p.returncode != 0:
                raise RuntimeError("independent worker failed")
        times = []
        for out in outs:
            with open(out) as f:
                times.append(json.load(f)["scan_seconds_best"])
        best = min(best, max(times))
    return best


def weak_scaling_curve() -> list[dict]:
    """Efficiency vs per-process size (VERDICT r4 weak #1): the fixed
    cross-process cost amortizes as per-process work grows, so the
    efficiency must approach 1 with size — measured, not asserted."""
    points = []
    for nbytes, repeats, runs in (
        (32 << 20, 8, 2),
        (128 << 20, 6, 2),
        (512 << 20, 4, 1),
    ):
        pt = weak_scaling(nbytes, repeats=repeats, runs=runs)
        # decomposition: total = memory-contention x communication
        t_ind = independent_pair(nbytes, repeats=max(4, repeats - 2),
                                 runs=runs)
        pt["seconds_independent_pair"] = t_ind
        pt["memory_contention_efficiency"] = round(
            pt["seconds_1proc"] / t_ind, 4
        )
        pt["communication_efficiency"] = round(
            t_ind / pt["seconds_2proc"], 4
        )
        points.append(pt)
        print(
            f"curve point {nbytes >> 20}MB/proc: "
            f"eff={pt['weak_scaling_efficiency']} "
            f"(mem {pt['memory_contention_efficiency']} x "
            f"comm {pt['communication_efficiency']})",
            flush=True,
        )
    return points


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--nbytes", type=int, default=4 << 20)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r05.json"))
    ap.add_argument(
        "--curve",
        action="store_true",
        help="measure the efficiency-vs-size curve (32/128/512MB per "
        "process) instead of a single weak-scaling point",
    )
    args = ap.parse_args()

    records = spawn_workers(
        args.num_processes, args.devices_per_process, args.nbytes
    )
    truth = single_process_truth(args.nbytes)
    sem_names = sorted(truth)
    agree = all(
        r["semantics"][s]["digest"] == truth[s]["digest"]
        for r in records
        for s in sem_names
    )
    artifact = {
        "round": 5,
        "fetch_path": (
            "in-program jax.lax.all_gather (replicated outputs, local "
            "device_get) — replaces the per-call process_allgather of r4"
        ),
        "what": (
            f"{args.num_processes}-process jax.distributed CPU run on "
            "localhost (gloo collectives), public-API sharded scan over a "
            "global mesh"
        ),
        "num_processes": args.num_processes,
        "devices_per_process": args.devices_per_process,
        "total_devices": records[0]["devices"],
        "nbytes": args.nbytes,
        "bit_exact_vs_single_process": agree,
        "semantics_verified": sem_names,
        "per_semantics_matches": {
            s: truth[s]["matches"] for s in sem_names
        },
        "scan_seconds_best": min(
            r["scan_seconds_best"] for r in records
        ),
        "scan_gbps": max(r["scan_gbps"] for r in records),
        "caveat": (
            f"{args.num_processes} processes x "
            f"{args.devices_per_process} virtual devices share 2 physical "
            "cores, so the throughput is contention-bound; the executed "
            "claim is multi-process bit-exactness + working gloo "
            "collectives.  The weak-scaling measurements pin 1 core per "
            "process in both configs; with --curve each point is "
            "decomposed into memory-contention (independent-pair "
            "control) x communication efficiency — the latter is the "
            "BASELINE >=85% quantity.  ICI numbers still require real "
            "multi-chip hardware."
        ),
        "weak_scaling": (
            None if args.curve else weak_scaling(args.nbytes)
        ),
        "weak_scaling_curve": (
            weak_scaling_curve() if args.curve else None
        ),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))
    if not agree:
        raise SystemExit("DIGEST MISMATCH: multi-process != single-process")


if __name__ == "__main__":
    main()
