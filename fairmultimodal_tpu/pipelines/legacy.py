"""Runnable legacy-generation experiments (SURVEY §2.4).

Two superseded-but-published experiments from the reference's earlier eras,
each with a committed result log and, until round 2, only a model + shape
test here:

- ``run_legacy_behrt_experiment`` — the sequence BEHRT
  (FinalCode/New/02_BEHRT.py): per-patient admission sequences where each
  admission contributes one "disease" token (hadm_id mapped to an index —
  a proxy feature, New/02_BEHRT.py:25-27), seven per-position embedding
  tables summed onto the BERT sequence output, CLS-position heads for the
  three tasks.  Reference quirks reproduced: the 6-hour
  time-to-discharge/death cohort filter (:81-84), per-admission RAW age ints
  fed to an ``nunique+1``-sized embedding and clamped (:96,245), per-patient
  labels = max over admissions (:110-112), segment ids alternating 0/1
  (:98).  Deviations (documented): the reference trains AND evaluates on the
  SAME full DataLoader (:173 — its only loader) and steps
  ``ReduceLROnPlateau(mode='max')`` on the train loss (:285 — "improvement"
  never happens, so LR decays every ``patience+1`` epochs); by default we
  use a proper stratified split + standard val-loss protocol, and
  ``reference_compat=True`` restores train==eval on the full cohort.
- ``run_legacy_eddi_experiment`` — the EDDI-dot fusion era
  (FinalCode/Code/EDDI.py): BEHRT-Demo + BEHRT-Lab + frozen text through
  :class:`~fairmultimodal_tpu.models.legacy.EDDIDotFusion` (each branch's
  256-d projection -> sigmoid x learnable-weight enhancement -> dot product
  scalar; three scalars -> classifier), TWO tasks (mortality +
  readmission-within-30d, EDDI.py:319-322), FocalLoss gamma=2 with clip-10
  neg/pos weights over the whole cohort (EDDI.py:53,536-539),
  ``clip_grad_norm_(1.0)`` (EDDI.py:346), Adam lr 1e-5, 5 epochs, text
  max_length 128 (EDDI.py:109-110).  Same train==eval deviation handling as
  above.

Both experiments are end-to-end torch-oracle-tested
(``tests/test_e2e_torch_parity.py``: forward logits, loss, every gradient,
and — for the EDDI era — the global-norm clip transform leaf-for-leaf).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import pandas as pd

from fairmultimodal_tpu.eval.report import eddi_report, evaluate_multitask
from fairmultimodal_tpu.models.legacy import BEHRTSequence, LegacyEDDIFull
from fairmultimodal_tpu.models.text import TextEncoder
from fairmultimodal_tpu.train.simple import MultitaskTrainer, SimpleTrainConfig

__all__ = [
    "LegacyBEHRTPipelineConfig", "run_legacy_behrt_experiment",
    "LegacyEDDIPipelineConfig", "run_legacy_eddi_experiment",
    "prepare_admission_sequences",
]

_SEQ_KEYS = ("disease_ids", "age_ids", "segment_ids", "adm_loc_ids",
             "disch_loc_ids", "gender_ids", "ethnicity_ids", "insurance_ids")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def prepare_admission_sequences(df: pd.DataFrame, pad_multiple: int = 8):
    """New/02_BEHRT.py:85-172 data prep as arrays.

    Returns (arrays dict of [N, S] int32, labels [N, 3], sensitive dict,
    vocab dict).  Sequences are padded with 0 (the reference's pad id, which
    doubles as the attention mask via ``ids != 0``); S is the max admission
    count rounded up to ``pad_multiple`` (TPU-friendly; padding is masked).
    """
    df = df.copy()
    # hadm_id -> proxy "disease" id, in first-appearance order (:25-27).
    unique = df["hadm_id"].unique()
    mapping = {h: i for i, h in enumerate(unique)}
    df["mapped_disease_id"] = df["hadm_id"].map(mapping)

    # 6-hour filter when the time columns exist (:66-84).
    if {"ADMITTIME", "DISCHTIME"} <= set(df.columns):
        admit = pd.to_datetime(df["ADMITTIME"])
        disch = pd.to_datetime(df["DISCHTIME"])
        death = (pd.to_datetime(df["DEATHTIME"], errors="coerce")
                 if "DEATHTIME" in df.columns else pd.Series(pd.NaT, index=df.index))
        ttd = (disch - admit).dt.total_seconds() / 3600
        ttdeath = (death - admit).dt.total_seconds() / 3600
        mort = df["short_term_mortality"].astype(int)
        df = df[((ttd > 6) & (mort == 0)) | ((ttdeath > 6) & (mort == 1))].copy()

    for col, default in (("FIRST_WARDID", 0), ("LAST_WARDID", 0)):
        if col not in df.columns:
            df[col] = default
    df["GENDER"] = df["GENDER"].astype("category").cat.codes
    df["INSURANCE"] = df["INSURANCE"].astype("category").cat.codes
    if "ETHNICITY" in df.columns:
        from fairmultimodal_tpu.data.featurize import map_ethnicity

        df["eth_code"] = (df["ETHNICITY"].apply(map_ethnicity)
                          .astype("category").cat.codes)
    else:
        df["eth_code"] = 0
    df["age"] = df["age"].fillna(0).astype(int)

    sort_cols = ["subject_id"] + (["ADMITTIME"] if "ADMITTIME" in df.columns else [])
    df = df.sort_values(sort_cols, kind="stable")

    seqs: Dict[str, list] = {k: [] for k in _SEQ_KEYS}
    labels, sens = [], {"age": [], "ethnicity": [], "insurance": []}
    for _, g in df.groupby("subject_id", sort=True):
        n = len(g)
        seqs["disease_ids"].append(g["mapped_disease_id"].tolist())
        seqs["age_ids"].append(g["age"].tolist())
        seqs["segment_ids"].append([i % 2 for i in range(n)])
        seqs["adm_loc_ids"].append(g["FIRST_WARDID"].astype(int).tolist())
        seqs["disch_loc_ids"].append(g["LAST_WARDID"].astype(int).tolist())
        seqs["gender_ids"].append(g["GENDER"].astype(int).tolist())
        seqs["ethnicity_ids"].append(g["eth_code"].astype(int).tolist())
        seqs["insurance_ids"].append(g["INSURANCE"].astype(int).tolist())
        labels.append([int(g["short_term_mortality"].max()),
                       int(g["los_binary"].max()),
                       int(g["mechanical_ventilation"].max())])
        # Per-patient sensitive codes for the fairness report: first
        # admission's values (the model consumes per-position codes).
        sens["age"].append(int(g["age"].iloc[0]))
        sens["ethnicity"].append(int(g["eth_code"].iloc[0]))
        sens["insurance"].append(int(g["INSURANCE"].iloc[0]))

    max_len = max(len(s) for s in seqs["disease_ids"])
    S = max(_round_up(max_len, pad_multiple), pad_multiple)
    arrays = {}
    for k, lists in seqs.items():
        arr = np.zeros((len(lists), S), np.int32)
        for i, s in enumerate(lists):
            arr[i, :len(s)] = s
        arrays[k] = arr
    # Pad id 0 collides with disease id 0 exactly like the reference (its
    # attention mask is ``input_ids != 0``, New/02_BEHRT.py:209 — the first
    # mapped admission is masked out wherever it appears; reproduced).
    vocab = {
        "num_diseases": len(mapping),
        "num_ages": int(df["age"].nunique() + 1),                 # :245
        "num_segments": 2,
        "num_admission_locs": max(int(df["FIRST_WARDID"].nunique()), 1),
        "num_discharge_locs": max(int(df["LAST_WARDID"].nunique()), 1),
        "num_genders": max(int(df["GENDER"].nunique()), 1),
        "num_ethnicities": max(int(df["eth_code"].nunique()), 1),
        "num_insurances": max(int(df["INSURANCE"].nunique()), 1),
    }
    return (arrays, np.asarray(labels, np.float32),
            {k: np.asarray(v, np.int32) for k, v in sens.items()}, vocab)


@dataclasses.dataclass
class LegacyBEHRTPipelineConfig:
    train: SimpleTrainConfig = dataclasses.field(
        default_factory=lambda: SimpleTrainConfig(
            lr=1e-5, num_epochs=10, batch_size=16, loss="bce",
            optimizer="adamw", weight_decay=0.01, patience=10))
    test_size: float = 0.20
    split_seed: int = 42
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    reference_compat: bool = False     # True = train == eval == full cohort
    dtype: str = "float32"


def run_legacy_behrt_experiment(
    structured: pd.DataFrame,
    config: Optional[LegacyBEHRTPipelineConfig] = None,
    verbose: bool = True,
) -> Dict:
    """Sequence-BEHRT experiment (New/02_BEHRT.py end-to-end)."""
    import jax.numpy as jnp

    from fairmultimodal_tpu.data.featurize import compute_pos_weights
    from fairmultimodal_tpu.data.loader import BatchIterator
    from fairmultimodal_tpu.data.split import multilabel_stratified_split
    from fairmultimodal_tpu.pipelines.common import NestedLoader

    cfg = config or LegacyBEHRTPipelineConfig()
    arrays, labels, sens, vocab = prepare_admission_sequences(structured)
    n = len(labels)
    if verbose:
        print(f"Patients: {n}, max sequence length: "
              f"{arrays['disease_ids'].shape[1]}, vocab: {vocab}")

    if cfg.reference_compat:
        idx = {"train": np.arange(n), "val": np.arange(n),
               "test": np.arange(n)}
    else:
        tr, te = multilabel_stratified_split(labels, cfg.test_size,
                                             seed=cfg.split_seed)
        rel_tr, rel_val = multilabel_stratified_split(labels[tr], 0.05,
                                                      seed=cfg.split_seed)
        idx = {"train": tr[rel_tr], "val": tr[rel_val], "test": te}

    loaders = {}
    for split, indices in idx.items():
        flat = {k: v[indices] for k, v in arrays.items()}
        flat["labels"] = labels[indices]
        flat["sens_age"] = sens["age"][indices]
        flat["sens_ethnicity"] = sens["ethnicity"][indices]
        flat["sens_insurance"] = sens["insurance"][indices]
        loaders[split] = NestedLoader(
            BatchIterator(flat, cfg.train.batch_size,
                          shuffle=(split == "train"), seed=cfg.train.seed),
            keys=_SEQ_KEYS + ("sens_age", "sens_ethnicity", "sens_insurance"))

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = BEHRTSequence(
        num_diseases=vocab["num_diseases"], num_ages=vocab["num_ages"],
        num_segments=vocab["num_segments"],
        num_admission_locs=vocab["num_admission_locs"],
        num_discharge_locs=vocab["num_discharge_locs"],
        num_genders=vocab["num_genders"],
        num_ethnicities=vocab["num_ethnicities"],
        num_insurances=vocab["num_insurances"],
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads, dtype=dtype)

    # BCE pos_weight = class_weights[1] = n / (2 * positives), computed over
    # the WHOLE filtered cohort — the reference never splits (:267-287).
    pos_weight = compute_pos_weights(labels)
    trainer = MultitaskTrainer(model, cfg.train, pos_weight=pos_weight)
    params = trainer.init_params(next(iter(loaders["train"])))
    best_params, history = trainer.fit(params, loaders["train"],
                                       loaders["val"], verbose=verbose)

    test = trainer.predict(best_params, loaders["test"],
                           extra_keys=("sens_age", "sens_ethnicity",
                                       "sens_insurance"))
    sensitive = {"age": test["sens_age"], "ethnicity": test["sens_ethnicity"],
                 "insurance": test["sens_insurance"]}
    metrics, fairness = evaluate_multitask(test["logits"], test["labels"],
                                           sensitive, 0.5, verbose=verbose)
    eddi = eddi_report(test["logits"], test["labels"], sensitive, 0.5,
                       verbose=verbose)
    return {"metrics": metrics, "fairness": fairness, "eddi": eddi,
            "history": history, "best_params": best_params, "vocab": vocab,
            "splits": idx}


LEGACY_TASKS = ("short_term_mortality", "readmission_within_30d")


@dataclasses.dataclass
class LegacyEDDIPipelineConfig:
    train: SimpleTrainConfig = dataclasses.field(
        default_factory=lambda: SimpleTrainConfig(
            lr=1e-5, num_epochs=5, batch_size=16, loss="focal", gamma=2.0,
            optimizer="adam", patience=10, grad_clip=1.0))
    text_model: str = "emilyalsentzer/Bio_ClinicalBERT"
    text_max_length: int = 128         # EDDI.py:109-110
    text_batch_size: int = 32
    test_size: float = 0.20
    split_seed: int = 42
    hidden_size: int = 768
    demo_layers: int = 12
    demo_heads: int = 12
    lab_layers: int = 2
    lab_heads: int = 8
    reference_compat: bool = False     # True = train == eval == full cohort
    dtype: str = "float32"


def run_legacy_eddi_experiment(
    structured: pd.DataFrame,
    unstructured: pd.DataFrame,
    config: Optional[LegacyEDDIPipelineConfig] = None,
    text_encoder: Optional[TextEncoder] = None,
    verbose: bool = True,
) -> Dict:
    """EDDI-dot fusion experiment (Code/EDDI.py train_pipeline)."""
    import jax.numpy as jnp

    from fairmultimodal_tpu.data.featurize import assemble_features
    from fairmultimodal_tpu.data.loader import BatchIterator
    from fairmultimodal_tpu.data.split import multilabel_stratified_split
    from fairmultimodal_tpu.models.text import encode_note_chunks
    from fairmultimodal_tpu.pipelines.common import (
        NestedLoader,
        build_arrays,
        pos_weight_neg_over_pos,
    )

    cfg = config or LegacyEDDIPipelineConfig()
    # Accept both spellings of the legacy label column (EDDI.py:415 uses
    # readmission_within_30_days; our ETL emits readmission_within_30d).
    if ("readmission_within_30d" not in structured.columns
            and "readmission_within_30_days" in structured.columns):
        structured = structured.rename(
            columns={"readmission_within_30_days": "readmission_within_30d"})
    label_cols = list(LEGACY_TASKS)
    if "mortality_30d_post_discharge" in structured.columns:
        # This generation's own mortality definition — death within 30 days
        # of discharge (Code/1_preprocessing_structured.py:24-26), emitted
        # by run_etl; frames without the column (older CSVs, synthetic
        # fixtures) fall back to the Final-era DEATHTIME-non-null label.
        label_cols[0] = "mortality_30d_post_discharge"
    bundle = assemble_features(structured, unstructured,
                               label_columns=tuple(label_cols))
    if text_encoder is None:
        text_encoder = TextEncoder.from_pretrained(cfg.text_model)
    bundle.text_embeddings = encode_note_chunks(
        text_encoder, bundle.note_chunks, max_length=cfg.text_max_length,
        batch_size=cfg.text_batch_size)

    n = bundle.num_patients
    if cfg.reference_compat:
        idx = {"train": np.arange(n), "val": np.arange(n),
               "test": np.arange(n)}
    else:
        tr, te = multilabel_stratified_split(bundle.labels, cfg.test_size,
                                             seed=cfg.split_seed)
        rel_tr, rel_val = multilabel_stratified_split(
            bundle.labels[tr], 0.05, seed=cfg.split_seed)
        idx = {"train": tr[rel_tr], "val": tr[rel_val], "test": te}

    arrays = build_arrays(bundle)
    keys = ("demo_dummy_ids", "demo_attn_mask", "age_ids", "gender_ids",
            "ethnicity_ids", "insurance_ids", "lab_features", "text_embedding")
    loaders = {}
    for split, indices in idx.items():
        flat = {k: v[indices] for k, v in arrays.items()}
        flat["labels"] = bundle.labels[indices]
        loaders[split] = NestedLoader(
            BatchIterator(flat, cfg.train.batch_size,
                          shuffle=(split == "train"), seed=cfg.train.seed),
            keys=keys)

    n_ages, n_gen, n_eth, n_ins = bundle.vocab_sizes()
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = LegacyEDDIFull(
        num_ages=n_ages, num_genders=n_gen, num_ethnicities=n_eth,
        num_insurances=n_ins, lab_token_count=bundle.num_lab_features,
        hidden_size=cfg.hidden_size, demo_layers=cfg.demo_layers,
        demo_heads=cfg.demo_heads, lab_layers=cfg.lab_layers,
        lab_heads=cfg.lab_heads, num_tasks=len(LEGACY_TASKS), dtype=dtype)

    # clip-10 neg/pos weights over the WHOLE filtered cohort — the reference
    # computes them from df_filtered before any split (EDDI.py:53,536-539).
    pos_weight = pos_weight_neg_over_pos(bundle.labels, clip=10.0)
    trainer = MultitaskTrainer(model, cfg.train, pos_weight=pos_weight)
    params = trainer.init_params(next(iter(loaders["train"])))
    best_params, history = trainer.fit(params, loaders["train"],
                                       loaders["val"], verbose=verbose)

    test = trainer.predict(best_params, loaders["test"],
                           extra_keys=("age_ids", "ethnicity_ids",
                                       "insurance_ids"))
    sensitive = {"age": test["age_ids"], "ethnicity": test["ethnicity_ids"],
                 "insurance": test["insurance_ids"]}
    metrics, fairness = evaluate_multitask(
        test["logits"], test["labels"], sensitive, 0.5, verbose=verbose,
        task_names=("mortality", "readmission"))
    eddi = eddi_report(test["logits"], test["labels"], sensitive, 0.5,
                       verbose=verbose, task_names=("mortality", "readmission"))
    return {"metrics": metrics, "fairness": fairness, "eddi": eddi,
            "history": history, "best_params": best_params, "splits": idx}
