"""Differentiable L_EDDI loss, on-device.

Reference semantics (``10_FAME.py:423-442``): for every task ``i`` and every
sensitive attribute, with soft error ``|p - y|``::

    overall_err  = mean_b |p_b - y_b|
    for each subgroup g PRESENT in the batch:
        diff_g = (mean_{b in g} |p_b - y_b| - overall_err)^2
    rmse = sqrt(mean_g diff_g + 1e-8)

and the loss is the mean of the 3 tasks x 3 attributes rmse values.

The reference runs a Python loop over ``torch.unique`` groups — a host sync
per batch that cannot be traced.  Here the subgroup reduction is a one-hot
segment sum over the *static* code space with a presence mask, which is a
single [B, G] contraction (MXU-friendly) and fully jit/pjit-compatible: under
data parallelism the per-group sums and counts are ``psum``-reduced before
the normalization so the loss is identical to the single-device value.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["subgroup_soft_errors", "eddi_loss"]


def subgroup_soft_errors(probs, labels, group_ids, num_groups: int,
                         axis_name: Optional[str] = None, weight=None):
    """Per-subgroup mean soft error with presence mask.

    Args:
      probs: [B] probabilities for one task.
      labels: [B] binary ground truth.
      group_ids: [B] int codes in [0, num_groups).
      num_groups: static code-space size.
      axis_name: optional mapped axis to psum over (data parallelism).
      weight: optional [B] validity mask (1 real / 0 padded row); padded rows
        drop out of every count and sum, so fixed-shape padded batches give
        bit-identical losses to ragged ones.

    Returns:
      (sub_err [G], present [G] bool, overall_err scalar)
    """
    err = jnp.abs(probs - labels)
    onehot = (group_ids[:, None] == jnp.arange(num_groups)[None, :]).astype(probs.dtype)
    if weight is not None:
        w = weight.astype(probs.dtype)
        onehot = onehot * w[:, None]
        err = err * w
        total_n = jnp.sum(w)
    else:
        total_n = jnp.asarray(err.shape[0], probs.dtype)
    counts = jnp.sum(onehot, axis=0)
    sums = err @ onehot
    total_err = jnp.sum(err)
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
        sums = jax.lax.psum(sums, axis_name)
        total_err = jax.lax.psum(total_err, axis_name)
        total_n = jax.lax.psum(total_n, axis_name)
    present = counts > 0
    sub_err = sums / jnp.maximum(counts, 1.0)
    overall = total_err / total_n
    return sub_err, present, overall


def eddi_loss(
    probs,
    labels,
    sensitive: Sequence,
    group_sizes: Sequence[int],
    axis_name: Optional[str] = None,
    weight=None,
):
    """L_EDDI = mean over (task, attribute) of subgroup soft-error RMSE.

    Args:
      probs: [B, T] sigmoid probabilities.
      labels: [B, T] binary labels.
      sensitive: list of [B] int arrays, one per sensitive attribute
        (reference order: age, ethnicity, insurance — ``10_FAME.py:431``).
      group_sizes: static code-space size per attribute.
      axis_name: optional data-parallel axis for global reductions.

    Returns scalar loss matching ``10_FAME.py:423-442`` (including the 1e-8
    inside the sqrt and the mean over *present* groups only).
    """
    num_tasks = probs.shape[1]
    rmses = []
    for i in range(num_tasks):
        p_i = probs[:, i]
        y_i = labels[:, i]
        for sens, g in zip(sensitive, group_sizes):
            sub_err, present, overall = subgroup_soft_errors(
                p_i, y_i, sens, g, axis_name=axis_name, weight=weight
            )
            diffs = jnp.where(present, (sub_err - overall) ** 2, 0.0)
            n_present = jnp.maximum(jnp.sum(present.astype(probs.dtype)), 1.0)
            rmse = jnp.sqrt(jnp.sum(diffs) / n_present + 1e-8)
            rmses.append(rmse)
    return jnp.mean(jnp.stack(rmses))
