"""EDDI (Error-Distribution Disparity Index).

EDDI measures, per sensitive subgroup ``s`` of an attribute, the normalized
deviation of the subgroup error rate from the overall error rate::

    d_s   = (err_s - err) / max(err, 1 - err)
    EDDI  = sqrt(sum_s d_s^2) / n_groups

The reference implements this in several slightly different ways across
scripts; parity requires reproducing each quirk.  Reference variants:

- ``10_FAME.py:54-82``  ("fame"):  optional ``complete_groups`` code space,
  groups with zero samples are *skipped*, and the divisor is the number of
  *valid* (non-empty) groups.
- ``01_BEHRT.py:85-99`` ("behrt"): groups come from ``np.unique`` of the data,
  empty groups contribute NaN (ignored via nansum), and the divisor is
  ``len(unique_groups)`` (total, not valid).
- ``06_FairEHR-CLP.py:81-95`` / ``08:45`` / ``09:77-90``: same normalizer
  written as ``max(err, 1-err)`` directly; 09 consumes hard predictions.

All variants share the same denominator semantics: when the overall error is
exactly 0 or 1 the normalizer is 1.0, which equals ``max(err, 1-err)``, so a
single formula covers every script.

Device-side: :func:`subgroup_error_stats` computes per-group (count, errors)
with one-hot segment sums — a [B, G] one-hot matmul that maps onto the MXU and
reduces with ``psum`` under data parallelism — and :func:`eddi_from_stats`
turns those sufficient statistics into the same EDDI values on the host.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "compute_eddi",
    "combined_eddi",
    "subgroup_error_stats",
    "eddi_from_stats",
]


def _normalizer(overall_error: float) -> float:
    """Shared EDDI normalizer: max(err, 1-err); 1.0 at the 0/1 endpoints."""
    return max(overall_error, 1.0 - overall_error) if overall_error not in (0.0, 1.0) else 1.0


def compute_eddi(
    y_true: np.ndarray,
    y_pred: np.ndarray,
    sensitive_labels: np.ndarray,
    threshold: float = 0.5,
    complete_groups: Optional[Sequence] = None,
    divisor: str = "valid",
    empty_group_value: Optional[float] = None,
    prebinarized: bool = False,
) -> Tuple[float, Dict]:
    """EDDI for one sensitive attribute.

    Args:
      y_true: [N] binary ground truth.
      y_pred: [N] probabilities (or hard predictions when ``prebinarized``).
      sensitive_labels: [N] subgroup codes (ints or strings).
      threshold: binarization threshold (reference uses ``>``, strict).
      complete_groups: full code space to iterate (fame variant); ``None``
        uses ``np.unique(sensitive_labels)``.
      divisor: "valid" divides by the number of non-empty groups
        (``10_FAME.py:77-78``); "total" divides by the number of iterated
        groups (``01_BEHRT.py:98``).
      empty_group_value: value recorded for empty groups ("behrt" uses NaN,
        "fame" skips them — ``None`` skips).
      prebinarized: y_pred already holds hard 0/1 predictions (09 variant).

    Returns:
      (overall_eddi, {group: disparity}) matching the reference outputs.
    """
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    sensitive_labels = np.asarray(sensitive_labels)
    y_bin = y_pred.astype(int) if prebinarized else (y_pred > threshold).astype(int)

    groups = np.array(complete_groups) if complete_groups is not None else np.unique(sensitive_labels)

    overall_error = float(np.mean(y_bin != y_true))
    denom = _normalizer(overall_error)

    subgroup: Dict = {}
    valid = 0
    for group in groups:
        mask = sensitive_labels == group
        if not np.any(mask):
            if empty_group_value is not None:
                subgroup[group] = empty_group_value
            continue
        valid += 1
        er_group = float(np.mean(y_bin[mask] != y_true[mask]))
        subgroup[group] = (er_group - overall_error) / denom

    n = valid if divisor == "valid" else len(groups)
    if n > 0:
        overall = float(np.sqrt(np.nansum(np.square(list(subgroup.values())))) / n)
    else:
        overall = 0.0
    return overall, subgroup


def combined_eddi(*attribute_eddis: float) -> float:
    """Combined EDDI over sensitive attributes: sqrt(sum e_a^2)/n_attrs.

    Reference: ``10_FAME.py:363,901`` and ``01_BEHRT.py:101-102`` (both use
    exactly three attributes: age, ethnicity, insurance).
    """
    arr = np.asarray(attribute_eddis, dtype=np.float64)
    return float(np.sqrt(np.sum(arr**2)) / len(arr))


# ---------------------------------------------------------------------------
# Device-side sufficient statistics (JAX).
# ---------------------------------------------------------------------------

def subgroup_error_stats(y_true, y_bin, group_ids, num_groups: int):
    """Per-group (count, error-count) via a one-hot segment sum. Jit-safe.

    Replaces the host loop at ``10_FAME.py:335-351`` (the per-epoch dynamic
    weight update moved every logit to CPU numpy).  The one-hot contraction
    is a [B, G] matmul that XLA tiles onto the MXU, and the outputs are tiny
    [G] vectors that reduce with ``psum`` across data-parallel shards.

    Args:
      y_true: [B] float/int ground truth (0/1).
      y_bin:  [B] hard predictions (0/1).
      group_ids: [B] int32 subgroup codes in [0, num_groups).
      num_groups: static size of the code space.

    Returns:
      (counts [G], errors [G]) float32 arrays.
    """
    import jax.numpy as jnp

    onehot = (group_ids[:, None] == jnp.arange(num_groups)[None, :]).astype(jnp.float32)
    err = (y_bin != y_true).astype(jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    errors = err @ onehot
    return counts, errors


def eddi_from_stats(
    counts: np.ndarray,
    errors: np.ndarray,
    divisor: str = "valid",
) -> float:
    """Overall EDDI from per-group (count, error) sufficient statistics.

    Exactly reproduces ``compute_eddi`` with ``complete_groups=range(G)``:
    groups with zero samples are skipped and (by default) the divisor is the
    number of non-empty groups (``10_FAME.py:67-78``).
    """
    counts = np.asarray(counts, dtype=np.float64)
    errors = np.asarray(errors, dtype=np.float64)
    total = counts.sum()
    if total == 0:
        return 0.0
    overall_error = float(errors.sum() / total)
    denom = _normalizer(overall_error)
    present = counts > 0
    er_group = np.zeros_like(counts)
    er_group[present] = errors[present] / counts[present]
    d = (er_group[present] - overall_error) / denom
    n = int(present.sum()) if divisor == "valid" else len(counts)
    if n == 0:
        return 0.0
    return float(np.sqrt(np.sum(d**2)) / n)
