"""09_multimodal_sigmoid_fusion: gate-only fusion pipeline
(09_multimodal_sigmoid_fusion.py:512-748).

Demo-BERT + lab encoder + text with three learnable 256-d sigmoid gates, no
fairness term in training (FocalLoss gamma=1 with whole-cohort clip-10
pos_weight, summed over tasks — 09:663-670).
Splits use a plain sklearn stratified split on mortality only (09:592-593).

Reference bug NOT replicated (documented at 09:605): the original realigns
precomputed embeddings with ``argsort`` of subject ids against split rows,
silently misaligning patients.  Our arrays are indexed consistently; there
is nothing to misalign.  ``reference_compat`` covers the reproducible 09
quirk instead: its age mapper's 70-90 last bucket (09:57-67).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import pandas as pd

from fairmultimodal_tpu.eval.report import eddi_report, evaluate_multitask
from fairmultimodal_tpu.models.baselines import SigmoidFusionFull
from fairmultimodal_tpu.models.text import TextEncoder
from fairmultimodal_tpu.pipelines.common import prepare_experiment, resolve_task
from fairmultimodal_tpu.train.simple import MultitaskTrainer, SimpleTrainConfig

__all__ = ["SigmoidFusionPipelineConfig", "run_sigmoid_fusion_experiment"]

_KEYS = ("demo_dummy_ids", "demo_attn_mask", "age_ids", "gender_ids",
         "ethnicity_ids", "insurance_ids", "lab_features", "text_embedding")


@dataclasses.dataclass
class SigmoidFusionPipelineConfig:
    train: SimpleTrainConfig = dataclasses.field(default_factory=lambda: SimpleTrainConfig(
        lr=1e-4, num_epochs=20, batch_size=16, loss="focal", gamma=1.0,
        optimizer="adam"))
    text_model: str = "emilyalsentzer/Bio_ClinicalBERT"
    text_max_length: int = 128      # 09:285 (like 03/04/06/07/08)
    text_batch_size: int = 32
    test_size: float = 0.20
    val_size: float = 0.05
    split_seed: int = 42
    hidden_size: int = 768
    demo_layers: int = 12
    demo_heads: int = 12
    lab_layers: int = 2
    lab_heads: int = 8
    dtype: str = "float32"
    # 09's own age mapper uses a 70-90 last bucket (09:57-67) instead of the
    # canonical 70-89; True reproduces it (age-90 patients bucket vs "Other").
    reference_compat: bool = False
    # Single-task regime (FinalCode/Mechanical_Ventilation/
    # 06_Multimodal_Sigmoid_Fusion.py)
    task: Optional[str] = None


def run_sigmoid_fusion_experiment(
    structured: pd.DataFrame,
    unstructured: pd.DataFrame,
    config: Optional[SigmoidFusionPipelineConfig] = None,
    text_encoder: Optional[TextEncoder] = None,
    verbose: bool = True,
) -> Dict:
    import jax.numpy as jnp

    cfg = config or SigmoidFusionPipelineConfig()
    task_names, task_index = resolve_task(cfg.task)
    prep = prepare_experiment(
        structured, unstructured, model_keys=_KEYS,
        batch_size=cfg.train.batch_size, text_encoder=text_encoder,
        text_model=cfg.text_model, text_max_length=cfg.text_max_length,
        text_batch_size=cfg.text_batch_size, test_size=cfg.test_size,
        val_size=cfg.val_size, split_seed=cfg.split_seed,
        split_method="sklearn", pos_weight_mode="neg_over_pos_clip10_all",
        seed=cfg.train.seed,
        age_bucket_upper=90 if cfg.reference_compat else 89,
        task_index=task_index, verbose=verbose)

    n_ages, n_gen, n_eth, n_ins = prep.vocab_sizes()
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = SigmoidFusionFull(
        num_ages=n_ages, num_genders=n_gen, num_ethnicities=n_eth,
        num_insurances=n_ins, lab_token_count=prep.bundle.num_lab_features,
        hidden_size=cfg.hidden_size, demo_layers=cfg.demo_layers,
        demo_heads=cfg.demo_heads, lab_layers=cfg.lab_layers,
        lab_heads=cfg.lab_heads, num_tasks=len(task_names), dtype=dtype)
    # FocalLoss(gamma=1, pos_weight=whole-cohort clip-10 neg/pos)
    # (09:663-670).
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
