"""PRNG selection.

JAX's default threefry PRNG is counter-based and *expensive on TPU VPUs*:
per-step dropout over the lab encoder's [B, 640, 2048] FFN activations makes
key generation a measurable fraction of the train step.  Switching the
global default impl to ``unsafe_rbg`` (the TPU hardware random-bit
generator) measured 1679 vs 1225 patients/sec/chip on the FAME train step
(v5e, batch 256, bf16).  Curiously, *typed* urbg keys
(``jax.random.key(seed, impl="unsafe_rbg")``) did NOT reproduce the win —
only flipping ``jax_default_prng_impl`` so raw keys and every in-graph
``fold_in``/``bits`` lower through the RBG path does; hence the global
config update here.

unsafe_rbg is statistically weaker than threefry but far beyond adequate for
dropout masks.  Parameter *initialization* stays on an explicit typed
threefry key (see the trainers' ``init_params``) so init draws are identical
under either choice.
"""

from __future__ import annotations

import jax

__all__ = ["make_rng", "threefry_key"]


def threefry_key(seed: int):
    """Typed threefry key — deterministic regardless of the global default."""
    try:
        return jax.random.key(seed, impl="threefry2x32")
    except Exception:
        return jax.random.PRNGKey(seed)


def make_rng(seed: int, impl: str = "unsafe_rbg"):
    """Training-stream PRNG key with the requested implementation.

    ``unsafe_rbg`` flips the process-global default impl (the measured fast
    path, see module docstring) and returns a raw key; ``threefry``/None
    returns a typed threefry key unaffected by any earlier flip.
    """
    if impl in (None, "default", "threefry"):
        return threefry_key(seed)
    try:
        jax.config.update("jax_default_prng_impl", impl)
        return jax.random.PRNGKey(seed)
    except Exception:
        return threefry_key(seed)
