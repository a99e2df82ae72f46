"""07_multimodal_average_fusion: plain concat fusion pipeline
(07_multimodal_average_fusion.py:531-790).

Full-demographics BEHRT + text -> two 256-d projectors -> concat -> MLP.
FocalLoss gamma=1, Adam 1e-4, 20 epochs.  Keeps the pre-ReLU fused embedding
and saves it as ``extracted_embeddings.npz`` (07:496-528,781-785); evaluation
adds the mean-pairwise-gap EO aggregation (07:293-304,462-479).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import numpy as np
import pandas as pd

from fairmultimodal_tpu.eval.report import eddi_report, evaluate_multitask
from fairmultimodal_tpu.models.baselines import StructTextModel
from fairmultimodal_tpu.models.text import TextEncoder
from fairmultimodal_tpu.pipelines.common import prepare_experiment, resolve_task
from fairmultimodal_tpu.train.simple import MultitaskTrainer, SimpleTrainConfig

__all__ = ["AverageFusionPipelineConfig", "run_average_fusion_experiment"]

_KEYS = ("demo_dummy_ids", "demo_attn_mask", "age_ids", "segment_ids",
         "adm_loc_ids", "disch_loc_ids", "gender_ids", "ethnicity_ids",
         "insurance_ids", "text_embedding")


@dataclasses.dataclass
class AverageFusionPipelineConfig:
    train: SimpleTrainConfig = dataclasses.field(default_factory=lambda: SimpleTrainConfig(
        lr=1e-4, num_epochs=20, batch_size=16, loss="focal", gamma=1.0,
        optimizer="adam"))
    text_model: str = "emilyalsentzer/Bio_ClinicalBERT"
    text_max_length: int = 128
    text_batch_size: int = 32
    test_size: float = 0.20
    val_size: float = 0.05
    split_seed: int = 42
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    dtype: str = "float32"
    out_dir: str = "."
    save_artifacts: bool = True
    # Single-task regime (FinalCode/Mechanical_Ventilation/05_Multimodal-
    # Average-Fusion.py)
    task: Optional[str] = None


def run_average_fusion_experiment(
    structured: pd.DataFrame,
    unstructured: pd.DataFrame,
    config: Optional[AverageFusionPipelineConfig] = None,
    text_encoder: Optional[TextEncoder] = None,
    verbose: bool = True,
) -> Dict:
    import jax
    import jax.numpy as jnp

    cfg = config or AverageFusionPipelineConfig()
    task_names, task_index = resolve_task(cfg.task)
    prep = prepare_experiment(
        structured, unstructured, model_keys=_KEYS,
        batch_size=cfg.train.batch_size, text_encoder=text_encoder,
        text_model=cfg.text_model, text_max_length=cfg.text_max_length,
        text_batch_size=cfg.text_batch_size, test_size=cfg.test_size,
        val_size=cfg.val_size, split_seed=cfg.split_seed,
        split_method="iterstrat", pos_weight_mode="neg_over_pos_clip10_all",
        seed=cfg.train.seed, task_index=task_index, verbose=verbose)

    n_ages, _, n_eth, n_ins = prep.vocab_sizes()
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = StructTextModel(
        num_ages=n_ages, num_ethnicities=n_eth, num_insurances=n_ins,
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_tasks=len(task_names), dtype=dtype)
    # FocalLoss(gamma=1, pos_weight=whole-cohort clip-10 neg/pos) (07:643-647).
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

    artifacts = {}
    if cfg.save_artifacts:
        # Extract pre-ReLU fused embeddings over the full cohort (07:496-528).
        @jax.jit
        def embed(p, mi):
            return model.apply({"params": p}, mi,
                               deterministic=True)["fused_embedding"]

        embs, labels = [], []
        for split in ("train", "val", "test"):
            for batch in prep.loaders[split]:
                keep = batch["weight"] > 0
                e = np.asarray(embed(best_params, jax.tree_util.tree_map(
                    jnp.asarray, batch["model_inputs"])))
                embs.append(e[keep])
                labels.append(batch["labels"][keep])
        os.makedirs(cfg.out_dir, exist_ok=True)
        path = os.path.join(cfg.out_dir, "extracted_embeddings.npz")
        np.savez(path, embeddings=np.concatenate(embs),
                 labels=np.concatenate(labels))
        artifacts["extracted_embeddings"] = path
        if verbose:
            print("Saved fused embeddings to", path)

    return {"metrics": metrics, "fairness": fairness, "eddi": eddi,
            "history": history, "best_params": best_params,
            "trainer": trainer, "prep": prep, "artifacts": artifacts}
