"""04_AdvDebias: two-stage adversarial debiasing pipeline (04_AdvDebias.py).

Stage 1 (04:817-1046): full-demographics BEHRT + text two-branch fusion
trained with FocalLoss gamma=1 — the same engine as 07 with the
full-demographics structured encoder.

Stage 2 (04:559-789): adversarial min-max over a hyperparameter grid, with
1:20 case/control matching and SMOTEENN resampling.  Defaults follow the
reference protocol exactly (round-5 fix): X = RAW lab feature columns only,
fillna(0), no scaling (04:888-891); sensitive attribute = ethnicity codes
binarized as ``z > 0`` inside the engine (04:893,675); grid = the full 2^6
``REFERENCE_GRID`` (04:1081-1088).  Pass ``stage2_features`` /
``stage2_sensitive`` / ``stage2_grid`` to deviate.  Artifacts mirror the
reference's ``model``/``adv``/``metrics`` layout (04:752-772,1089-1091):
per-grid-point + final predictor/adversary npz, metrics.csv,
loss_metrics.png.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from fairmultimodal_tpu.eval.report import eddi_report, evaluate_multitask
from fairmultimodal_tpu.models.baselines import StructTextModel
from fairmultimodal_tpu.models.text import TextEncoder
from fairmultimodal_tpu.pipelines.common import prepare_experiment
from fairmultimodal_tpu.train.adversarial import adv_grid_search
from fairmultimodal_tpu.train.simple import MultitaskTrainer, SimpleTrainConfig

__all__ = ["AdvDebiasPipelineConfig", "run_adv_debias_experiment"]

_KEYS = ("demo_dummy_ids", "demo_attn_mask", "age_ids", "segment_ids",
         "adm_loc_ids", "disch_loc_ids", "gender_ids", "ethnicity_ids",
         "insurance_ids", "text_embedding", "lab_features")


@dataclasses.dataclass
class AdvDebiasPipelineConfig:
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
    # Stage 2 (reference defaults: mortality target, ethnicity sensitive
    # attribute binarized z>0, full 2^6 grid — 04:888-893,1081-1088)
    stage2_task: int = 0                   # which label column (mortality)
    stage2_sensitive: str = "ethnicity"    # binarized sensitive attribute
    stage2_grid: Optional[Dict[str, List]] = None   # None -> REFERENCE_GRID
    run_stage2: bool = True
    out_dir: str = "."
    # metrics.csv + loss_metrics.png + model//adv/ npz (04:752-772,1089-1091)
    save_artifacts: bool = True


def run_adv_debias_experiment(
    structured: pd.DataFrame,
    unstructured: pd.DataFrame,
    config: Optional[AdvDebiasPipelineConfig] = None,
    text_encoder: Optional[TextEncoder] = None,
    stage2_features: Optional[np.ndarray] = None,
    verbose: bool = True,
) -> Dict:
    import jax.numpy as jnp

    cfg = config or AdvDebiasPipelineConfig()
    prep = prepare_experiment(
        structured, unstructured, model_keys=_KEYS,
        batch_size=cfg.train.batch_size, text_encoder=text_encoder,
        text_model=cfg.text_model, text_max_length=cfg.text_max_length,
        text_batch_size=cfg.text_batch_size, test_size=cfg.test_size,
        val_size=cfg.val_size, split_seed=cfg.split_seed,
        split_method="iterstrat", pos_weight_mode="neg_over_pos_clip10_all",
        seed=cfg.train.seed, verbose=verbose)

    n_ages, _, n_eth, n_ins = prep.vocab_sizes()
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = StructTextModel(
        num_ages=n_ages, num_ethnicities=n_eth, num_insurances=n_ins,
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads, dtype=dtype)
    # FocalLoss(gamma=1, pos_weight=whole-cohort clip-10 neg/pos)
    # (04_AdvDebias.py:1007-1012).
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
                                           sensitive, 0.5, verbose=verbose)
    eddi = eddi_report(test["logits"], test["labels"], sensitive, 0.5,
                       verbose=verbose)

    stage2 = None
    if cfg.run_stage2:
        X = stage2_features
        if X is None:
            # Reference stage-2 features: the RAW (unscaled, fillna(0)) lab
            # columns only — no demographics, no z-score (04:888-891).
            X = prep.bundle.labs_raw.astype(np.float32)
        y = prep.bundle.labels[:, cfg.stage2_task]
        z = {"gender": prep.bundle.gender_codes,
             "age": prep.bundle.age_codes,
             "ethnicity": prep.bundle.ethnicity_codes,
             "insurance": prep.bundle.insurance_codes}[cfg.stage2_sensitive]
        tr, va = prep.idx["train"], prep.idx["val"]
        stage2 = adv_grid_search(
            X[tr], y[tr], z[tr], X[va], y[va], z[va],
            grid=cfg.stage2_grid, verbose=verbose)
        if verbose:
            for r in stage2:
                print("stage2", r["config"], "->",
                      {k: round(v, 4) for k, v in r["metrics"].items()})
        if cfg.save_artifacts:
            import os

            from fairmultimodal_tpu.train.adversarial import save_adv_artifacts

            os.makedirs(cfg.out_dir, exist_ok=True)
            written = save_adv_artifacts(cfg.out_dir, stage2, X.shape[1])
            if verbose and written:
                print(f"Saved {len(written)} stage-2 model artifacts under",
                      os.path.join(cfg.out_dir, "model"), "and",
                      os.path.join(cfg.out_dir, "adv"))
            rows = [dict(**r["config"], **r["metrics"]) for r in stage2]
            pd.DataFrame(rows).to_csv(
                os.path.join(cfg.out_dir, "metrics.csv"), index=False)
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                plt.figure()
                for r in stage2:
                    plt.plot(r["train_curve"], color="blue", label="Train Loss")
                    plt.plot(r["valid_curve"], color="red", label="Valid Loss")
                    break    # reference plots the last run only; one is enough
                plt.legend()
                plt.savefig(os.path.join(cfg.out_dir, "loss_metrics.png"))
                plt.close()
            except Exception:
                pass
            if verbose:
                print("Evaluation metrics saved to",
                      os.path.join(cfg.out_dir, "metrics.csv"))

    return {"metrics": metrics, "fairness": fairness, "eddi": eddi,
            "history": history, "best_params": best_params,
            "trainer": trainer, "prep": prep, "stage2": stage2}
