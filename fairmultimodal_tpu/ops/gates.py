"""Process-level kernel-path gate shared by every Pallas op.

Two ways to force the XLA layer path instead of the Pallas kernels:

- ``FMTPU_KERNELS=0`` in the environment (user-facing A/B knob), or
- :func:`force_xla_path`, called by the trainers when a configuration is
  KNOWN to be incompatible with Mosaic custom calls — today that is the
  mixed data×model (TP) mesh on real TPU, where GSPMD cannot partition the
  kernels (jax's tpu_custom_call refuses with "wrap the call in a
  shard_map").  Before round 4 users had to know to export FMTPU_KERNELS=0
  themselves; now the trainer flips this process-level switch and warns.

DECISION (round 4, recorded): the megakernels are NOT carried through
mixed meshes via ``jax.experimental.custom_partitioning``.  Rationale:
(a) the epilogue-folded kernels fuse the post-projection LayerNorm, which
is invalid across a row-parallel psum boundary — TP would require
un-folding the LN (forfeiting the measured +22% single-chip win) plus a
per-block psum inside the custom-partitioned call; (b) at this model scale
(~110M trainable params) pure data parallelism is the arithmetic-intensity
sweet spot on a v5e pod slice, and the pure-DP shard_map mode already
carries the kernels multi-chip; (c) this environment exposes ONE real TPU
chip — a TP custom-partitioning path could only ever be validated in
interpret mode on a CPU mesh, which CLAUDE.md documents as NOT evidence of
TPU compilability (Mosaic's 128-lane rule bit exactly this way before).
Mixed meshes therefore remain supported on the XLA layer path only, with
automatic fallback + warning instead of a silent footgun.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["kernels_enabled", "force_xla_path", "forced_xla_reason",
           "clear_forced_xla_path"]

_FORCE_XLA_REASON: Optional[str] = None


def force_xla_path(reason: str) -> None:
    """Disable the Pallas kernels for the remainder of the process.

    Process-global on purpose: the gate is consulted at TRACE time deep
    inside the ops, and jit traces happen lazily on first step — a scoped
    context could silently expire before the trace runs.
    """
    global _FORCE_XLA_REASON
    _FORCE_XLA_REASON = reason


def forced_xla_reason() -> Optional[str]:
    return _FORCE_XLA_REASON


def clear_forced_xla_path() -> None:
    """Re-enable the Pallas kernels after a :func:`force_xla_path`.

    For long-lived processes/notebooks that built a mixed-mesh trainer (which
    forces the XLA path) and later build a pure-DP or single-chip trainer that
    could use the kernels again (advisor finding, round 4).  Caveat: already-
    jitted step functions keep whatever path they TRACED with — call this
    before building the new trainer, not to mutate an existing one.  The
    ``FMTPU_KERNELS=0`` environment override is unaffected.
    """
    global _FORCE_XLA_REASON
    _FORCE_XLA_REASON = None


def kernels_enabled() -> bool:
    """True when the Pallas kernel path may be used (per-op shape/backend
    checks still apply on top)."""
    if os.environ.get("FMTPU_KERNELS", "1") == "0":
        return False
    return _FORCE_XLA_REASON is None
