"""06_FairEHR-CLP pipeline (06_FairEHR-CLP.py:790-829).

Reference behavior (default): despite defining the full FairEHR-CLP stack,
``train_pipeline`` trains the plain two-branch average-fusion model — we
reproduce exactly that.  ``contrastive=True`` additionally trains the actual
:class:`~fairmultimodal_tpu.models.fairehr.FairEHRCLP` model with the
InfoNCE + variance-regularizer contrastive objective over real/synthetic
views — the mode the reference defines but never invokes, made to work.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import pandas as pd

from fairmultimodal_tpu.eval.report import eddi_report, evaluate_multitask
from fairmultimodal_tpu.models.baselines import StructTextModel
from fairmultimodal_tpu.models.fairehr import FairEHRCLP, contrastive_loss
from fairmultimodal_tpu.models.text import TextEncoder
from fairmultimodal_tpu.pipelines.common import prepare_experiment
from fairmultimodal_tpu.train.simple import MultitaskTrainer, SimpleTrainConfig

__all__ = ["FairEHRCLPPipelineConfig", "run_fairehr_clp_experiment"]

_KEYS_REF = ("demo_dummy_ids", "demo_attn_mask", "age_ids", "segment_ids",
             "adm_loc_ids", "disch_loc_ids", "gender_ids", "ethnicity_ids",
             "insurance_ids", "text_embedding")
_KEYS_CLP = ("demo_features", "lab_features", "text_embedding",
             "age_ids", "ethnicity_ids", "insurance_ids")


@dataclasses.dataclass
class FairEHRCLPPipelineConfig:
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
    contrastive: bool = False          # False = reference behavior
    contrastive_weight: float = 0.1
    tau: float = 0.5
    syn_noise_demo: float = 0.05       # 06:227-233
    syn_noise_long: float = 0.01


def run_fairehr_clp_experiment(
    structured: pd.DataFrame,
    unstructured: pd.DataFrame,
    config: Optional[FairEHRCLPPipelineConfig] = None,
    text_encoder: Optional[TextEncoder] = None,
    verbose: bool = True,
) -> Dict:
    import jax.numpy as jnp

    cfg = config or FairEHRCLPPipelineConfig()
    keys = _KEYS_CLP if cfg.contrastive else _KEYS_REF
    prep = prepare_experiment(
        structured, unstructured, model_keys=keys,
        batch_size=cfg.train.batch_size, text_encoder=text_encoder,
        text_model=cfg.text_model, text_max_length=cfg.text_max_length,
        text_batch_size=cfg.text_batch_size, test_size=cfg.test_size,
        val_size=cfg.val_size, split_seed=cfg.split_seed,
        split_method="iterstrat", pos_weight_mode="neg_over_pos_clip10_all",
        seed=cfg.train.seed, verbose=verbose)

    n_ages, _, n_eth, n_ins = prep.vocab_sizes()
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    if cfg.contrastive:
        model = FairEHRCLP(dtype=dtype)
        # Deterministic synthetic views are baked into the batch arrays once
        # per run (Gaussian perturbations, 06:221-233), so the jitted loss
        # stays a pure function of the batch.
        rng = np.random.default_rng(cfg.train.seed)
        for split, loader in prep.loaders.items():
            dfeat = prep.arrays["demo_features"][prep.idx[split]]
            lfeat = prep.arrays["lab_features"][prep.idx[split]]
            syn = {
                "demo_features_syn": dfeat + cfg.syn_noise_demo
                * rng.standard_normal(dfeat.shape).astype(np.float32),
                "lab_features_syn": lfeat + cfg.syn_noise_long
                * rng.standard_normal(lfeat.shape).astype(np.float32),
            }
            if hasattr(loader, "add_arrays"):       # device-resident loader
                loader.add_arrays(syn)
            else:                                   # host BatchIterator path
                loader.it.arrays.update(syn)
                loader.keys = tuple(loader.keys) + ("demo_features_syn",
                                                    "lab_features_syn")

        def extras(params, out, batch):
            return cfg.contrastive_weight * contrastive_loss(
                out["e_adj"], out["e_adj_syn"], tau=cfg.tau,
                weight=batch["weight"])

        # FocalLoss(gamma=1, pos_weight=whole-cohort clip-10 neg/pos)
        # (06_FairEHR-CLP.py:722-727).
        trainer = MultitaskTrainer(model, cfg.train, loss_extras=extras,
                                   pos_weight=prep.pos_weight)
    else:
        model = StructTextModel(
            num_ages=n_ages, num_ethnicities=n_eth, num_insurances=n_ins,
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads, dtype=dtype)
        trainer = MultitaskTrainer(model, cfg.train,
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
