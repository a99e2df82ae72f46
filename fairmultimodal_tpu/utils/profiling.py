"""Tracing / profiling harness (SURVEY §5: absent in the reference — tqdm
bars only; this is the TPU-native replacement).

- :func:`trace` — context manager wrapping ``jax.profiler.TraceAnnotation``
  so featurize/train/eval phases show up named in TensorBoard/perfetto traces.
- :func:`profile_to` — capture a full device trace around a block.
- :func:`hlo_self_times` — parse a captured trace's xplane into per-category
  and per-op DEVICE self-times.  On the axon tunnel host-side async timing
  lies (CLAUDE.md), but device-side self-times are measured on-chip and are
  the one trustworthy decomposition of a step; this is how the round-3
  speed-of-light audit of the megakernels was produced (docs/ROADMAP.md).
- :class:`Timer` / :func:`throughput` — ``block_until_ready`` wall-clock
  timing for the patients/sec/chip benchmark metric (BASELINE.json north
  star), with compile-excluded warmup.
"""

from __future__ import annotations

import contextlib
import glob
import os
import time
from typing import Callable, Dict, Optional, Tuple

import jax

__all__ = ["trace", "profile_to", "hlo_self_times", "Timer", "throughput"]


@contextlib.contextmanager
def trace(name: str):
    """Named trace annotation visible in captured device profiles."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that blocks on device work before stopping."""

    def __init__(self):
        self.elapsed = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False

    def stop(self, *arrays):
        """Block on the given arrays, then record elapsed."""
        for a in arrays:
            jax.block_until_ready(a)
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed


def throughput(step_fn: Callable, *args, iters: int = 20, warmup: int = 3,
               items_per_call: int = 1) -> Dict[str, float]:
    """Measure a jitted step's steady-state throughput.

    Runs ``warmup`` calls (absorbing compile), then ``iters`` timed calls with
    a single trailing ``block_until_ready``.  Returns wall seconds, calls/sec
    and items/sec (and per-chip rates).
    """
    out = None
    for _ in range(warmup):
        out = step_fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step_fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    n_chips = jax.device_count()
    return {
        "seconds": dt,
        "calls_per_sec": iters / dt,
        "items_per_sec": iters * items_per_call / dt,
        "items_per_sec_per_chip": iters * items_per_call / dt / n_chips,
        "n_chips": float(n_chips),
    }


def hlo_self_times(logdir: str) -> Tuple[Dict[str, float], Dict[str, float]]:
    """Per-category and per-op device self-times (us) from a captured trace.

    ``logdir`` is the directory passed to :func:`profile_to` /
    ``jax.profiler.trace``.  Uses xprof's ``hlo_stats`` converter on the
    newest ``*.xplane.pb`` under it.  Times are summed over every traced
    step — divide by the step count for per-step numbers.
    """
    import json

    from xprof.convert import raw_to_tool_data as _r2t

    planes = sorted(glob.glob(
        os.path.join(logdir, "plugins", "profile", "*", "*.xplane.pb")),
        key=os.path.getmtime)
    if not planes:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    data, _ = _r2t.xspace_to_tool_data([planes[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode(errors="replace")
    table = json.loads(data)
    idx = {c["id"]: k for k, c in enumerate(table["cols"])}
    by_category: Dict[str, float] = {}
    by_op: Dict[str, float] = {}
    for row in table["rows"]:
        vals = [c["v"] for c in row["c"]]
        t = float(vals[idx["total_self_time"]] or 0.0)
        cat = vals[idx["category"]]
        op = vals[idx["tf_op_name"]] or vals[idx["hlo_op_name"]]
        by_category[cat] = by_category.get(cat, 0.0) + t
        by_op[op] = by_op.get(op, 0.0) + t
    return by_category, by_op
