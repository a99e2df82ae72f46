"""Shared default for the persistent XLA compile-cache directory.

One definition used by the CLI, bench.py and the probe scripts, so every
process on one machine shares warm compiles.  Lives at package root (not
``utils/``) so importing it never pulls jax — callers must be able to set
``JAX_COMPILATION_CACHE_DIR`` before the first jax import.  Per-user suffix: a shared
world-writable ``/tmp/jax_compile_cache`` can collide across users
(files written by user A are unreadable/undeletable by user B) — advisor
finding, round 4.  Backward compatibility: if the legacy shared path
already holds a warm cache owned by this user, keep using it rather than
abandoning multi-minute TPU compiles.
"""

from __future__ import annotations

import os
import tempfile

__all__ = ["default_compile_cache_dir"]

_LEGACY = os.path.join(tempfile.gettempdir(), "jax_compile_cache")


def default_compile_cache_dir() -> str:
    try:
        if os.path.isdir(_LEGACY) and os.stat(_LEGACY).st_uid == os.getuid():
            return _LEGACY
    except OSError:
        pass
    try:
        user = os.getlogin()
    except OSError:
        user = os.environ.get("USER") or str(os.getuid())
    return os.path.join(tempfile.gettempdir(), f"jax_compile_cache_{user}")
