# Developer workflow (reference parity: /root/reference/justfile).
# Run `just --list` for an overview.

# Run the full test suite (CPU, 8 virtual devices via tests/conftest.py).
test:
    python -m pytest tests/ -q

# Lint gate (same checks CI runs; works without flake8 installed).
lint:
    python tools/lint.py
    python tools/typecheck_lite.py

# 2-process jax.distributed run on localhost (gloo collectives); verifies
# multi-process bit-exactness and writes SCALING_r05.json.
multihost:
    python tools/multihost_run.py

# Benchmark on the attached TPU chip; prints one JSON line.
# First compiles go through the persistent compilation cache — warm runs
# are representative, cold ones include multi-minute compiles.
benchmark:
    python bench.py

# Multi-chip dry run on an 8-device virtual CPU mesh.
dryrun:
    python -c "import jax; jax.config.update('jax_platforms', 'cpu'); \
import os; os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'; \
import __graft_entry__; __graft_entry__.dryrun_multichip(8); print('dryrun ok')"

# Teddy pipeline breakdown probe (where do the milliseconds go).
probe:
    python tools/probe_teddy_breakdown.py

# Sharded-scan scaling measurement (virtual mesh; writes SCALING_r03.json).
scaling:
    python tools/scaling_bench.py

# Device-path conformance on the real TPU (tests force CPU; this runs the
# dense/classed/Teddy device kernels against the host oracle on hardware).
tpu-conformance:
    python tools/tpu_conformance.py

# Differential conformance harness in self-test mode (the real run is the
# CI job `reference-conformance`, which installs the actual
# ahocorasick_rs wheel and compares tuple-for-tuple + error texts).
conformance-selftest:
    python tools/conformance_vs_reference.py --self-test \
        --min-tuple-checks 50000 --max-seconds 120

# Competitor benchmark harness in self-test mode (CI runs the real one
# against pyahocorasick + ahocorasick_rs).
bench-vs-reference-selftest:
    python tools/bench_vs_reference.py --self-test --long-haystacks 3000 \
        --out /tmp/bvr.md --json-out /tmp/bvr.json

# Bulk differential fuzzer: all host tiers/engines/semantics vs the
# brute-force oracle, incl. >=1MB match-dense cases.  Arg = seconds.
fuzz seconds="300":
    python tools/fuzz_differential.py {{seconds}}

# Fire-kernel halo A/B + streamed-staging measurement on the real TPU.
probe-fire-halo:
    python tools/probe_fire_halo.py

# Weak-scaling efficiency-vs-size curve with the memory/communication
# decomposition (writes SCALING_r05.json).
scaling-curve:
    python tools/multihost_run.py --curve
