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

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["clip_by_global_norm_torch", "fused_clip_adamw_apply"]


def fused_clip_adamw_apply(
    grads,
    opt_state,
    params,
    *,
    max_norm: float,
    frozen_fn: Callable[[Tuple], bool] | None = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple:
    """One-pass clip + AdamW + freeze-mask + apply, bit-identical to the chain

        clip_by_global_norm_torch(max_norm)
        -> inject_hyperparams(adamw)(lr, wd)       [tx.update]
        -> zero updates where frozen_fn(path)      [loss-free heads]
        -> optax.apply_updates

    used by the trainers (train/loop.py::train_step, FMTPU_FUSED_OPT=1).
    Motivation: the device profile (CLAUDE.md) showed the optimizer
    elementwise chain at ~2.4 ms/step, HBM-bound over the param tree;
    expressing the whole update as ONE tree_map producing ``(mu, nu,
    param)`` per leaf gives XLA a single fusion site per leaf.
    MEASURED OUTCOME (round 4): no win — same-session bench A/B 2578
    (chain) vs 2568 (fused) p/s, i.e. XLA already fuses the optax chain
    into the minimal per-leaf HBM passes inside the step jit.  Kept as an
    opt-in probe + the bitwise-equality test harness.

    Bit-exactness: every elementwise expression below replicates optax
    0.2.6's op order exactly (``(1-b)*g + b*m`` moment EMAs,
    ``1 - b**count_inc`` bias corrections divided in the leaf dtype,
    ``eps`` OUTSIDE the sqrt with ``eps_root=0``, decoupled ``+ wd*p``
    then ``* (-lr)``), so UNDER JIT — the production context; train_step
    is always jitted — the two paths are bitwise identical and no golden
    transcript or f64 oracle can tell them apart
    (tests/test_optim_fused.py).  Eager-vs-eager differs by ~1 ulp at
    count>=3: optax's tree_bias_correction is a mini-jit and XLA's f32
    pow rounds differently inside vs outside a fused region.

    ``opt_state`` must be the 2-tuple produced by that exact chain; the
    returned state has the identical structure (ScaleByAdamState counts
    and moments advanced, InjectStatefulHyperparamsState count advanced,
    hyperparams dict passed through the same dtype conversion optax
    applies), so checkpoints and ``set_lr`` are interchangeable between
    paths.

    Returns ``(new_params, new_opt_state)``.
    """
    clip_state, inj = opt_state
    inner = inj.inner_state
    adam = inner[0]

    # Hyperparams ride the inject state (set_lr mutates them); optax
    # converts them to the updates dtype at every update — replicate.
    # CRITICAL bit-exactness detail: inject_hyperparams captures EVERY
    # numeric arg of adamw as an f32-array hyperparam — including b1, b2,
    # eps, eps_root — so the inner chain computes ``1 - b1`` etc. in ARRAY
    # arithmetic on the f32-rounded constants, not in python f64.  Using
    # python floats here diverges by ~1 ulp per step (measured 7e-10 on
    # the first moment), which the bitwise tests catch.  Read them from
    # the state; the kwargs are only a fallback for states produced by a
    # bare (non-inject) adamw.
    leaf_dtype = jax.tree_util.tree_leaves(grads)[0].dtype
    hparams = {k: jnp.asarray(v).astype(leaf_dtype)
               for k, v in inj.hyperparams.items()}
    lr = hparams["learning_rate"]
    wd = hparams["weight_decay"]
    b1 = hparams.get("b1", jnp.asarray(b1, leaf_dtype))
    b2 = hparams.get("b2", jnp.asarray(b2, leaf_dtype))
    eps = hparams.get("eps", jnp.asarray(eps, leaf_dtype))
    eps_root = hparams.get("eps_root", jnp.asarray(0.0, leaf_dtype))

    # torch clip factor (always multiplied, branch-free — see above).
    norm = optax.global_norm(grads)
    factor = jnp.minimum(max_norm / (norm + 1e-6), 1.0)

    count_inc = optax.safe_increment(adam.count)
    bc1 = 1 - b1**count_inc
    bc2 = 1 - b2**count_inc

    def leaf(path, g, mu, nu, p):
        g = g * factor
        mu2 = (1 - b1) * g + b1 * mu
        nu2 = (1 - b2) * (g**2) + b2 * nu
        mu_hat = mu2 / bc1.astype(mu2.dtype)
        nu_hat = nu2 / bc2.astype(nu2.dtype)
        u = mu_hat / (jnp.sqrt(nu_hat + eps_root) + eps)
        u = (u + wd * p) * (-lr)
        if frozen_fn is not None and frozen_fn(path):
            u = jnp.zeros_like(u)
        return mu2, nu2, (p + u).astype(jnp.asarray(p).dtype)

    fused = jax.tree_util.tree_map_with_path(leaf, grads, adam.mu, adam.nu, params)
    new_mu = jax.tree_util.tree_map(lambda t: t[0], fused,
                                    is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree_util.tree_map(lambda t: t[1], fused,
                                    is_leaf=lambda x: isinstance(x, tuple))
    new_params = jax.tree_util.tree_map(lambda t: t[2], fused,
                                        is_leaf=lambda x: isinstance(x, tuple))

    new_adam = adam._replace(count=count_inc, mu=new_mu, nu=new_nu)
    new_inj = inj._replace(count=optax.safe_increment(inj.count),
                           hyperparams=hparams,
                           inner_state=(new_adam,) + tuple(inner[1:]))
    return new_params, (clip_state, new_inj)


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
