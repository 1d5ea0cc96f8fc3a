"""Test configuration: force the CPU backend with 8 virtual devices.

Unit tests must not depend on TPU hardware; sharding tests use an 8-device
virtual CPU mesh.  ``jax`` is preloaded in this environment, so the platform
is forced via ``jax.config`` (env vars alone are too late).
"""

import os

import jax

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
jax.config.update("jax_platforms", "cpu")

from hypothesis import HealthCheck, settings
from hypothesis.database import (
    DirectoryBasedExampleDatabase,
    MultiplexedDatabase,
    ReadOnlyDatabase,
)

# Replay the reference's checked-in Hypothesis regression corpus (SURVEY.md
# §4: .hypothesis/examples is a deterministic edge-case database) alongside
# our own local database.  The reference copy is strictly read-only.
_REF_DB = "/root/reference/.hypothesis/examples"
_db = DirectoryBasedExampleDatabase(".hypothesis/examples")
if os.path.isdir(_REF_DB):
    _db = MultiplexedDatabase(
        _db, ReadOnlyDatabase(DirectoryBasedExampleDatabase(_REF_DB))
    )

settings.register_profile(
    "conformance",
    database=_db,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
settings.load_profile("conformance")
