"""Tracing / profiling harness (SURVEY §5: absent in the reference — tqdm
bars only; this is the TPU-native replacement).

- :func:`trace` — context manager wrapping ``jax.profiler.TraceAnnotation``
  so featurize/train/eval phases show up named in TensorBoard/perfetto traces.
- :func:`profile_to` — capture a full device trace around a block.
- :class:`Timer` / :func:`throughput` — ``block_until_ready`` wall-clock
  timing for the patients/sec/chip benchmark metric (BASELINE.json north
  star), with compile-excluded warmup.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax

__all__ = ["trace", "profile_to", "Timer", "throughput"]


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
