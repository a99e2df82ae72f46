"""Probe the host<->TPU tunnel: dispatch round-trip latency + bandwidth.

The axon tunnel's characteristics move between sessions (CLAUDE.md records
a 4x swing on identical warm workloads), and the epoch loop is
dispatch-bound once compute is fast — so apparent "regressions" in epoch
time must be checked against THIS probe before blaming code.  Prints one
JSON line:

    {"rtt_ms": median dispatch+fetch round trip of a trivial kernel,
     "d2h_MBps": device->host pull bandwidth (64 MB array),
     "h2d_MBps": host->device push bandwidth (64 MB array),
     "device": jax device kind}

Usage: python scripts/probe_tunnel.py   (takes ~15 s; needs the chip free —
two processes cannot share it).
"""

from __future__ import annotations

import json
import os
import statistics
import time

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from fairmultimodal_tpu.cachedir import default_compile_cache_dir  # jax-free

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", default_compile_cache_dir())

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    dev = jax.devices()[0]

    @jax.jit
    def tick(x):
        return x + 1.0

    x = jnp.zeros((8,), jnp.float32)
    float(jnp.sum(tick(x)))  # compile + warm

    rtts = []
    for _ in range(30):
        t0 = time.perf_counter()
        # VALUE FETCH terminates the chain — the only trustworthy sync on
        # this platform (see CLAUDE.md "Async timing lies").
        float(jnp.sum(tick(x)))
        rtts.append((time.perf_counter() - t0) * 1e3)

    big_host = np.zeros((16, 1024, 1024), np.float32)  # 64 MB
    t0 = time.perf_counter()
    big_dev = jax.device_put(big_host, dev)
    big_dev.block_until_ready()
    h2d = big_host.nbytes / (time.perf_counter() - t0) / 1e6

    t0 = time.perf_counter()
    np.asarray(big_dev)
    d2h = big_host.nbytes / (time.perf_counter() - t0) / 1e6

    print(json.dumps({
        "rtt_ms": round(statistics.median(rtts), 2),
        "rtt_p90_ms": round(sorted(rtts)[int(len(rtts) * 0.9)], 2),
        "d2h_MBps": round(d2h, 1),
        "h2d_MBps": round(h2d, 1),
        "device": dev.device_kind,
    }))


if __name__ == "__main__":
    main()
