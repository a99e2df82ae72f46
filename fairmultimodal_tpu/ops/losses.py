"""Fused elementwise losses (XLA fuses these into surrounding matmuls).

Numerics match the torch reference:

- ``bce_with_logits``: log-sum-exp stable BCE with optional per-task
  ``pos_weight`` (torch ``BCEWithLogitsLoss``; used by 01/10).
- ``focal_loss``: ``(1 - exp(-BCE))^gamma * BCE`` exactly as the reference
  writes it (``02_BioClinicalBERT.py:18-39`` — note it derives p_t from the
  *weighted* BCE when pos_weight is set; reproduced).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["bce_with_logits", "focal_loss", "sigmoid"]

sigmoid = jax.nn.sigmoid


def bce_with_logits(
    logits: jax.Array,
    labels: jax.Array,
    pos_weight: Optional[jax.Array] = None,
    weight: Optional[jax.Array] = None,
    reduction: str = "mean",
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Stable binary cross-entropy with logits.

    torch formula: ``l = -[pw * y * log σ(x) + (1-y) * log(1-σ(x))]`` with
    ``log σ(x) = -softplus(-x)`` and ``log(1-σ(x)) = -x - softplus(-x)``.

    Args:
      logits/labels: broadcastable arrays.
      pos_weight: per-element (usually per-task, broadcast over batch) weight
        on the positive term.
      weight: optional per-sample validity mask ([B] or [B,1]); masked-mean
        reduction uses its sum as denominator so padded rows are exact no-ops.
      axis_name: optional mapped axis (``shard_map`` data parallelism) —
        mean reductions psum both numerator and denominator, so the result
        is the GLOBAL masked mean on every shard and its gradient composes
        with a per-shard ``psum(grads)`` into the exact global gradient.
    """
    # Upcast to AT LEAST f32 (bf16 compute -> f32 loss; f64 stays f64 so the
    # float64 trajectory oracle keeps full precision end-to-end).
    acc = jnp.promote_types(logits.dtype, jnp.float32)
    logits = logits.astype(acc)
    labels = labels.astype(acc)
    log_p = -jax.nn.softplus(-logits)
    log_not_p = -logits - jax.nn.softplus(-logits)
    pos = labels * log_p
    if pos_weight is not None:
        pos = pos_weight * pos
    loss = -(pos + (1.0 - labels) * log_not_p)

    def _psum(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    if weight is not None:
        w = weight.reshape(weight.shape + (1,) * (loss.ndim - weight.ndim))
        loss = loss * w
        if reduction == "mean":
            denom = jnp.maximum(_psum(jnp.sum(w)) * (loss.size / w.size), 1.0)
            return _psum(jnp.sum(loss)) / denom
    if reduction == "mean":
        return _psum(jnp.sum(loss)) / _psum(jnp.asarray(loss.size, jnp.float32))
    if reduction == "sum":
        return _psum(jnp.sum(loss))
    return loss


def focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    gamma: float = 2.0,
    alpha: Optional[float] = None,
    pos_weight: Optional[jax.Array] = None,
    weight: Optional[jax.Array] = None,
    reduction: str = "mean",
) -> jax.Array:
    """Reference FocalLoss (02:18-39): ``((1 - e^{-BCE})^γ) · BCE``."""
    bce = bce_with_logits(logits, labels, pos_weight=pos_weight, reduction="none")
    pt = jnp.exp(-bce)
    loss = ((1.0 - pt) ** gamma) * bce
    if alpha is not None:
        loss = alpha * loss
    if weight is not None:
        w = weight.reshape(weight.shape + (1,) * (loss.ndim - weight.ndim))
        loss = loss * w
        if reduction == "mean":
            denom = jnp.maximum(jnp.sum(w) * (loss.size / w.size), 1.0)
            return jnp.sum(loss) / denom
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss
