"""02_BioClinicalBERT: text-only baseline pipeline (02_BioClinicalBERT.py:401-635).

Frozen BioClinicalBERT note embeddings (batched chunk encoding replaces the
reference's per-note loop) -> 768->256->3 MLP head trained with
FocalLoss(gamma=2, pos_weight=n/(2*n_pos) over the TRAIN split — 02 defines
clip-10 ``get_pos_weight`` but never calls it; the live criteria use
``compute_class_weights(df_train).iloc[1]``, 02:488-497), AdamW lr 2e-5.
Reference subsamples with ``.head(1000)`` (02:405); expose via ``head``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import pandas as pd

from fairmultimodal_tpu.eval.report import eddi_report, evaluate_multitask
from fairmultimodal_tpu.models.baselines import TextOnlyClassifier
from fairmultimodal_tpu.models.text import TextEncoder
from fairmultimodal_tpu.pipelines.common import (
    prepare_experiment,
    resolve_task,
    task_label_columns,
)
from fairmultimodal_tpu.train.simple import MultitaskTrainer, SimpleTrainConfig

__all__ = ["TextOnlyPipelineConfig", "run_text_only_experiment"]

_KEYS = ("text_embedding", "age_ids", "ethnicity_ids", "insurance_ids")


@dataclasses.dataclass
class TextOnlyPipelineConfig:
    train: SimpleTrainConfig = dataclasses.field(default_factory=lambda: SimpleTrainConfig(
        lr=2e-5, num_epochs=10, batch_size=16, loss="focal", gamma=2.0,
        optimizer="adamw"))
    text_model: str = "emilyalsentzer/Bio_ClinicalBERT"
    text_max_length: int = 512
    text_batch_size: int = 32
    head: Optional[int] = None          # 02:405 uses .head(1000)
    test_size: float = 0.20
    val_size: float = 0.05
    split_seed: int = 42
    # Single-task regime (FinalCode/Mechanical_Ventilation/04_BioclinicalBERT)
    task: Optional[str] = None


def run_text_only_experiment(
    structured: pd.DataFrame,
    unstructured: pd.DataFrame,
    config: Optional[TextOnlyPipelineConfig] = None,
    text_encoder: Optional[TextEncoder] = None,
    verbose: bool = True,
) -> Dict:
    cfg = config or TextOnlyPipelineConfig()
    # allow_extra: this pipeline also carries the Uni_label_run
    # readmission-only regime (Readmit_Biobert_2(1).py) — the label then
    # comes from readmission_within_30d instead of the three-task columns.
    task_names, task_index = resolve_task(cfg.task, allow_extra=True)
    prep = prepare_experiment(
        structured, unstructured, model_keys=_KEYS,
        batch_size=cfg.train.batch_size, text_encoder=text_encoder,
        text_model=cfg.text_model, text_max_length=cfg.text_max_length,
        text_batch_size=cfg.text_batch_size, head=cfg.head,
        test_size=cfg.test_size, val_size=cfg.val_size,
        split_seed=cfg.split_seed, split_method="skmultilearn",
        pos_weight_mode="balanced", seed=cfg.train.seed,
        task_index=task_index, label_columns=task_label_columns(cfg.task),
        verbose=verbose)

    model = TextOnlyClassifier(num_tasks=len(task_names))
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
    metrics, fairness = evaluate_multitask(test["logits"], test["labels"],
                                           sensitive, 0.5, verbose=verbose,
                                           task_names=task_names)
    eddi = eddi_report(test["logits"], test["labels"], sensitive, 0.5,
                       task_names=task_names, verbose=verbose)
    return {"metrics": metrics, "fairness": fairness, "eddi": eddi,
            "history": history, "best_params": best_params,
            "trainer": trainer, "prep": prep}
