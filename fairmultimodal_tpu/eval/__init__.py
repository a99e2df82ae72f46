"""Evaluation and reporting: task metrics, fairness blocks, reference-format
printed reports and CSV/npz artifacts.
"""

from fairmultimodal_tpu.eval.report import (
    task_metrics,
    evaluate_multitask,
    eddi_report,
)

__all__ = ["task_metrics", "evaluate_multitask", "eddi_report"]
