"""Optimizer transforms with torch-exact semantics.

The reference clips with ``torch.nn.utils.clip_grad_norm_(params, max_norm)``
(10_FAME.py:446, Code/EDDI.py:346), which scales every gradient by

    min(max_norm / (global_norm + 1e-6), 1.0)

``optax.clip_by_global_norm`` omits the ``+1e-6`` in the denominator — a
~4e-7 relative difference per clipped step that the float64 end-to-end
trajectory oracle (tests/test_e2e_torch_parity.py) resolves clearly.  Both
trainers use this transform instead so multi-step trajectories match torch
to f64 precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = ["clip_by_global_norm_torch"]


def clip_by_global_norm_torch(max_norm: float) -> optax.GradientTransformation:
    """``torch.nn.utils.clip_grad_norm_`` as an optax transform.

    torch computes the norm-of-per-param-norms (mathematically the global
    L2 norm; only the reduction grouping differs, which is sub-ulp here)
    and ALWAYS multiplies by the clamped coefficient — so do we, keeping
    the graph branch-free.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        factor = jnp.minimum(max_norm / (norm + 1e-6), 1.0)
        return jax.tree_util.tree_map(lambda g: g * factor, updates), state

    return optax.GradientTransformation(init_fn, update_fn)
