"""01_BEHRT: structured-only baseline pipeline (01_BEHRT.py:365-498).

Lab-branch-only BEHRT (the reference deliberately leaves the demo branch
unused, 01_BEHRT.py:181,414) trained with per-task BCE(pos_weight=neg/pos),
grad-clip 1.0, plateau LR, early stopping; evaluated with AUROC/AUPRC
(PR-curve integration variant)/F1/TPR/FPR + per-attribute EDDI with the
"behrt" divisor quirks + pairwise EO with the n^2 aggregation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import pandas as pd

from fairmultimodal_tpu import TASKS
from fairmultimodal_tpu.eval.report import eddi_report, evaluate_multitask
from fairmultimodal_tpu.models.baselines import BEHRTLabOnlyModel
from fairmultimodal_tpu.pipelines.common import (
    TASK_SHORT,
    prepare_experiment,
    resolve_task,
)
from fairmultimodal_tpu.train.simple import MultitaskTrainer, SimpleTrainConfig

__all__ = ["BEHRTPipelineConfig", "run_behrt_experiment"]

_KEYS = ("lab_features", "age_ids", "ethnicity_ids", "insurance_ids")


@dataclasses.dataclass
class BEHRTPipelineConfig:
    train: SimpleTrainConfig = dataclasses.field(default_factory=lambda: SimpleTrainConfig(
        lr=2e-5, num_epochs=50, batch_size=16, loss="bce", optimizer="adamw",
        grad_clip=1.0))
    test_size: float = 0.20
    val_size: float = 0.05
    split_seed: int = 42
    hidden_size: int = 768
    dtype: str = "float32"
    # None = the standard 3-task regime; a task name trains a single-label
    # model like the Mechanical_Ventilation generation
    # (FinalCode/Mechanical_Ventilation/02_BEHRT.py).
    task: Optional[str] = None


def run_behrt_experiment(
    structured: pd.DataFrame,
    unstructured: Optional[pd.DataFrame] = None,
    config: Optional[BEHRTPipelineConfig] = None,
    verbose: bool = True,
) -> Dict:
    """Train + evaluate the structured-only baseline.

    ``unstructured`` is optional — 01 does not use notes; when provided it is
    only used for the common-cohort merge.
    """
    import jax.numpy as jnp

    cfg = config or BEHRTPipelineConfig()
    task_names, task_index = resolve_task(cfg.task)
    if unstructured is None:
        unstructured = structured[["subject_id"]].copy()
        unstructured["hadm_id"] = structured["hadm_id"]
    prep = prepare_experiment(
        structured, unstructured, model_keys=_KEYS,
        batch_size=cfg.train.batch_size, need_text=False, require_notes=False,
        test_size=cfg.test_size, val_size=cfg.val_size,
        split_seed=cfg.split_seed, split_method="iterstrat",
        pos_weight_mode="neg_over_pos", seed=cfg.train.seed,
        task_index=task_index, verbose=verbose)

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = BEHRTLabOnlyModel(lab_token_count=prep.bundle.num_lab_features,
                              hidden_size=cfg.hidden_size, dtype=dtype,
                              tasks=tuple(TASK_SHORT[t] for t in task_names))
    trainer = MultitaskTrainer(model, cfg.train, pos_weight=prep.pos_weight)
    example = next(iter(prep.loaders["train"]))
    params = trainer.init_params(example)
    best_params, history = trainer.fit(params, prep.loaders["train"],
                                       prep.loaders["val"], verbose=verbose)

    test = trainer.predict(best_params, prep.loaders["test"],
                           extra_keys=("age_ids", "ethnicity_ids",
                                       "insurance_ids"))
    sensitive = {"age": test["age_ids"], "ethnicity": test["ethnicity_ids"],
                 "insurance": test["insurance_ids"]}
    metrics, fairness = evaluate_multitask(
        test["logits"], test["labels"], sensitive, 0.5, verbose=verbose,
        task_names=task_names, auprc_mode="pr_curve")
    eddi = eddi_report(test["logits"], test["labels"], sensitive, 0.5,
                       task_names=task_names, verbose=verbose)
    return {"metrics": metrics, "fairness": fairness, "eddi": eddi,
            "history": history, "best_params": best_params,
            "trainer": trainer, "prep": prep}
