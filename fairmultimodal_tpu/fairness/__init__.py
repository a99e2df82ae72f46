"""Fairness engine: EDDI and Equalized-Odds metrics plus the L_EDDI loss.

Host (numpy) implementations reproduce every variant found in the reference
scripts bit-for-bit (the denominators, divisors and NaN conventions differ
per script — see ``eddi.compute_eddi``).  Device (JAX) implementations do the
same subgroup reductions with one-hot segment sums so they stay inside jitted
programs and shard cleanly over a data mesh.
"""

from fairmultimodal_tpu.fairness.eddi import (
    compute_eddi,
    combined_eddi,
    subgroup_error_stats,
    eddi_from_stats,
)
from fairmultimodal_tpu.fairness.eo import (
    tpr_fpr,
    equalized_odds,
    equalized_odds_pairwise,
)
from fairmultimodal_tpu.fairness.loss import eddi_loss, subgroup_soft_errors

__all__ = [
    "compute_eddi",
    "combined_eddi",
    "subgroup_error_stats",
    "eddi_from_stats",
    "tpr_fpr",
    "equalized_odds",
    "equalized_odds_pairwise",
    "eddi_loss",
    "subgroup_soft_errors",
]
