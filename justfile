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
# multi-process bit-exactness and writes SCALING_r04.json.
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
