"""Persistent XLA compilation cache helper.

First compiles of the fused scan kernels cost minutes on the tunneled TPU
(remote Mosaic compile); the persistent cache makes every later process
start warm.  Opt-in because it writes to disk: call once before the first
device dispatch.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    ".jax_cache",
)


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (idempotent).

    Returns the cache directory in use.
    """
    import jax

    path = path or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
