"""03_DfC: demographics-free classification pipeline (03_DfC.py:555-781).

The model never sees age/gender/ethnicity/insurance — a dummy-token BERT plus
segment/ward embeddings fuses with text (03_DfC.py:156-220); sensitive
attributes ride along for evaluation only.  FocalLoss gamma=1, Adam 1e-4,
note max_length 128 (03:138).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import pandas as pd

from fairmultimodal_tpu.eval.report import eddi_report, evaluate_multitask
from fairmultimodal_tpu.models.fusion import DfCModel
from fairmultimodal_tpu.models.text import TextEncoder
from fairmultimodal_tpu.pipelines.common import prepare_experiment
from fairmultimodal_tpu.train.simple import MultitaskTrainer, SimpleTrainConfig

__all__ = ["DfCPipelineConfig", "run_dfc_experiment"]

_KEYS = ("demo_dummy_ids", "demo_attn_mask", "segment_ids", "adm_loc_ids",
         "disch_loc_ids", "text_embedding",
         "age_ids", "ethnicity_ids", "insurance_ids")


@dataclasses.dataclass
class DfCPipelineConfig:
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


def run_dfc_experiment(
    structured: pd.DataFrame,
    unstructured: pd.DataFrame,
    config: Optional[DfCPipelineConfig] = None,
    text_encoder: Optional[TextEncoder] = None,
    verbose: bool = True,
) -> Dict:
    import jax.numpy as jnp
    from flax import linen as nn

    cfg = config or DfCPipelineConfig()
    prep = prepare_experiment(
        structured, unstructured, model_keys=_KEYS,
        batch_size=cfg.train.batch_size, text_encoder=text_encoder,
        text_model=cfg.text_model, text_max_length=cfg.text_max_length,
        text_batch_size=cfg.text_batch_size, test_size=cfg.test_size,
        val_size=cfg.val_size, split_seed=cfg.split_seed,
        split_method="skmultilearn", pos_weight_mode="neg_over_pos_clip10_all",
        seed=cfg.train.seed, verbose=verbose)

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    class DfCBatchModel(nn.Module):
        """Adapter: common batch-key names -> DfCModel's signature."""

        dtype_: object = dtype

        @nn.compact
        def __call__(self, batch, deterministic: bool = True):
            return DfCModel(hidden_size=cfg.hidden_size,
                            num_hidden_layers=cfg.num_hidden_layers,
                            num_attention_heads=cfg.num_attention_heads,
                            dtype=self.dtype_, name="dfc")(
                {"dummy_ids": batch["demo_dummy_ids"],
                 "attn_mask": batch["demo_attn_mask"],
                 "segment_ids": batch["segment_ids"],
                 "admission_loc_ids": batch["adm_loc_ids"],
                 "discharge_loc_ids": batch["disch_loc_ids"],
                 "text_embedding": batch["text_embedding"]},
                deterministic)

    # FocalLoss(gamma=1, pos_weight=whole-cohort clip-10 neg/pos)
    # (03_DfC.py:648-653).
    trainer = MultitaskTrainer(DfCBatchModel(), cfg.train,
                               pos_weight=prep.pos_weight)
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
                                           sensitive, 0.5, verbose=verbose)
    eddi = eddi_report(test["logits"], test["labels"], sensitive, 0.5,
                       verbose=verbose)
    return {"metrics": metrics, "fairness": fairness, "eddi": eddi,
            "history": history, "best_params": best_params,
            "trainer": trainer, "prep": prep}
