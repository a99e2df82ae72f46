"""Shared preparation stages for the numbered baseline pipelines.

Every training script in the reference repeats the same L2-L3 preamble
(merge the two common CSVs, filter to noted patients, map demographics,
z-score labs, precompute text embeddings, split, build loaders — e.g.
07_multimodal_average_fusion.py:531-686).  :func:`prepare_experiment` is that
preamble once, parameterized by the per-script deltas: which text max_length,
which split family, whether notes are required, ward/segment columns.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from fairmultimodal_tpu.data.featurize import (
    FeatureBundle,
    assemble_features,
    compute_pos_weights,
)
from fairmultimodal_tpu.data.loader import BatchIterator
from fairmultimodal_tpu.data.split import multilabel_stratified_split
from fairmultimodal_tpu.models.text import TextEncoder, encode_note_chunks

__all__ = ["PreparedExperiment", "prepare_experiment", "NestedLoader",
           "pos_weight_neg_over_pos", "make_split"]

MODEL_KEYS = ("demo_dummy_ids", "demo_attn_mask", "age_ids", "gender_ids",
              "ethnicity_ids", "insurance_ids", "segment_ids", "adm_loc_ids",
              "disch_loc_ids", "lab_features", "text_embedding",
              "demo_features")


class NestedLoader:
    """Flat BatchIterator -> trainer batch schema, keeping only the keys a
    given model consumes (so jit signatures stay minimal)."""

    def __init__(self, it: BatchIterator, keys: Sequence[str]):
        self.it = it
        self.keys = tuple(keys)

    def __len__(self):
        return len(self.it)

    def __iter__(self):
        for flat in self.it:
            yield {
                "model_inputs": {k: flat[k] for k in self.keys if k in flat},
                "labels": flat["labels"],
                "weight": flat["weight"],
            }


#: Short head names used by the reference's per-task classifier layers.
TASK_SHORT = {"mortality": "mort", "los": "los",
              "mechanical_ventilation": "mech"}


#: Single-task labels OUTSIDE the final three-task space: task name ->
#: structured-CSV label column.  "readmission" is the Uni_label_run
#: generation's readmission-only text regime
#: (FinalCode/Uni_label_run/Readmit_Biobert_2(1).py; logged AUROC 0.717 in
#: Results_Unstruct.txt).  These need the label matrix built from a
#: different column, so the caller must thread
#: ``task_label_columns(task)`` into :func:`prepare_experiment`.
EXTRA_TASK_COLUMNS = {"readmission": "readmission_within_30d"}


def task_label_columns(task: Optional[str]):
    """Label-column override for :func:`prepare_experiment` (None for the
    standard three-task label space)."""
    if task in EXTRA_TASK_COLUMNS:
        return (EXTRA_TASK_COLUMNS[task],)
    return None


def resolve_task(task: Optional[str], allow_extra: bool = False):
    """Optional single-task selection -> (task_names, task_index).

    ``task=None`` is the standard three-task regime; a task name selects the
    Mechanical_Ventilation-generation style single-task training (one label
    column, one head) for that task.  ``allow_extra=True`` additionally
    accepts :data:`EXTRA_TASK_COLUMNS` tasks (readmission), whose label
    comes from a different structured column — the pipeline must then pass
    ``label_columns=task_label_columns(task)`` to prepare_experiment, and
    ``task_index`` is None (the bundle is already single-column).
    """
    from fairmultimodal_tpu import TASKS

    if task is None:
        return tuple(TASKS), None
    if allow_extra and task in EXTRA_TASK_COLUMNS:
        return (task,), None
    if task not in TASKS:
        raise ValueError(f"unknown task {task!r}; expected one of {TASKS}")
    return (task,), list(TASKS).index(task)


def pos_weight_neg_over_pos(labels: np.ndarray, clip: Optional[float] = None) -> np.ndarray:
    """Per-task neg/pos positive weight (01_BEHRT.py:204-211); 02 clips at
    10 (02_BioClinicalBERT.py:47-57)."""
    labels = np.asarray(labels)
    out = []
    for i in range(labels.shape[1]):
        pos = labels[:, i].sum()
        neg = len(labels) - pos
        w = (neg / pos) if pos > 0 else 1.0
        if clip is not None:
            w = min(w, clip)
        out.append(w)
    return np.asarray(out, np.float32)


def make_split(labels: np.ndarray, test_size: float, val_size: float,
               seed: int, method: str = "iterstrat",
               stratify_task: int = 0) -> Dict[str, np.ndarray]:
    """Two-stage split. ``method``:

    - "iterstrat": index-exact vendored iterstrat MSSS
      (01/04/05/06/07/08/10 — 10_FAME.py:733-742); ``val_size`` is a
      fraction of train+val, like the reference's second MSSS.
    - "skmultilearn": index-faithful vendored order-2 iterative
      stratification (02/03 — 02:430-455); 02 computes the val fraction as
      ``val_size / (1 - test_size)`` (``val_fraction = 0.05 / 0.8``) so the
      val set is ``val_size`` of the WHOLE cohort.
    - "sklearn": single-task stratified shuffle on ``stratify_task``
      (09_multimodal_sigmoid_fusion.py:592-593).
    """
    n = len(labels)
    if method == "sklearn":
        from sklearn.model_selection import train_test_split

        idx = np.arange(n)
        strat = labels[:, stratify_task]
        train_val, test = train_test_split(idx, test_size=test_size,
                                           random_state=seed, stratify=strat)
        train, val = train_test_split(
            train_val, test_size=val_size, random_state=seed,
            stratify=labels[train_val, stratify_task])
        return {"train": np.sort(train), "val": np.sort(val),
                "test": np.sort(test)}
    if method == "skmultilearn":
        from fairmultimodal_tpu.data.iterstrat_exact import (
            iterative_train_test_split,
        )

        train_val, test = iterative_train_test_split(labels, test_size, seed)
        val_fraction = val_size / (1.0 - test_size)      # 02:446
        rel_train, rel_val = iterative_train_test_split(
            labels[train_val], val_fraction, seed)
        return {"train": train_val[rel_train], "val": train_val[rel_val],
                "test": test}
    train_val, test = multilabel_stratified_split(labels, test_size, seed=seed)
    rel_train, rel_val = multilabel_stratified_split(labels[train_val],
                                                     val_size, seed=seed)
    return {"train": train_val[rel_train], "val": train_val[rel_val],
            "test": test}


@dataclasses.dataclass
class PreparedExperiment:
    bundle: FeatureBundle
    arrays: Dict[str, np.ndarray]
    idx: Dict[str, np.ndarray]
    loaders: Dict[str, NestedLoader]
    pos_weight: np.ndarray
    text_encoder: Optional[TextEncoder]

    def vocab_sizes(self):
        return self.bundle.vocab_sizes()


def build_arrays(bundle: FeatureBundle) -> Dict[str, np.ndarray]:
    """FeatureBundle -> the full flat model-input array dict.

    ``segment/adm_loc/disch_loc`` default to zeros exactly like the reference
    when the ward columns are absent (07:579-589); ``demo_features`` is the
    4-column [age, gender, ethnicity, insurance] code matrix FairEHR-CLP
    consumes (06:439-441).
    """
    n = bundle.num_patients
    arrays = {
        "demo_dummy_ids": np.zeros((n, 1), np.int32),
        "demo_attn_mask": np.ones((n, 1), np.int32),
        "age_ids": bundle.age_codes.astype(np.int32),
        "gender_ids": bundle.gender_codes.astype(np.int32),
        "ethnicity_ids": bundle.ethnicity_codes.astype(np.int32),
        "insurance_ids": bundle.insurance_codes.astype(np.int32),
        "segment_ids": np.zeros(n, np.int32),
        "adm_loc_ids": np.zeros(n, np.int32),
        "disch_loc_ids": np.zeros(n, np.int32),
        "lab_features": bundle.labs.astype(np.float32),
        "demo_features": np.stack([
            bundle.age_codes, bundle.gender_codes, bundle.ethnicity_codes,
            bundle.insurance_codes], axis=1).astype(np.float32),
    }
    if bundle.text_embeddings is not None:
        arrays["text_embedding"] = bundle.text_embeddings.astype(np.float32)
    return arrays


def prepare_experiment(
    structured: pd.DataFrame,
    unstructured: pd.DataFrame,
    *,
    model_keys: Sequence[str],
    batch_size: int,
    text_encoder: Optional[TextEncoder] = None,
    text_model: str = "emilyalsentzer/Bio_ClinicalBERT",
    text_max_length: int = 512,
    text_batch_size: int = 32,
    need_text: bool = True,
    require_notes: bool = True,
    head: Optional[int] = None,
    test_size: float = 0.20,
    val_size: float = 0.05,
    split_seed: int = 42,
    split_method: str = "iterstrat",
    pos_weight_mode: str = "balanced",      # "balanced" | "neg_over_pos" | "neg_over_pos_clip10" | "neg_over_pos_clip10_all" | "none"
    seed: int = 42,
    require_hf_weights: bool = False,
    age_bucket_upper: int = 89,
    device_data: bool = True,
    mesh=None,
    task_index: Optional[int] = None,
    label_columns: Optional[Sequence[str]] = None,
    verbose: bool = True,
) -> PreparedExperiment:
    if head:
        structured = structured.head(head)
        unstructured = unstructured.head(head)
    bundle = assemble_features(structured, unstructured,
                               require_notes=require_notes,
                               age_bucket_upper=age_bucket_upper,
                               label_columns=label_columns)
    if task_index is not None:
        # Single-task regime (the Mechanical_Ventilation generation trains
        # one-label models — FinalCode/Mechanical_Ventilation/*): slice the
        # label matrix before splits/pos-weights/loaders so stratification
        # and class weighting see exactly one task.
        bundle.labels = bundle.labels[:, [task_index]]
    if verbose:
        print(f"After filtering, number of rows: {bundle.num_patients}")

    if need_text:
        if text_encoder is None:
            text_encoder = TextEncoder.from_pretrained(
                text_model, require_weights=require_hf_weights, mesh=mesh)
        bundle.text_embeddings = encode_note_chunks(
            text_encoder, bundle.note_chunks, max_length=text_max_length,
            batch_size=text_batch_size)
        if verbose:
            print("Aggregated text embeddings shape:",
                  bundle.text_embeddings.shape)

    idx = make_split(bundle.labels, test_size, val_size, split_seed,
                     method=split_method)
    if verbose:
        print(f"Train size: {len(idx['train'])}, Validation size: "
              f"{len(idx['val'])}, Test size: {len(idx['test'])}")

    arrays = build_arrays(bundle)
    loaders = {}
    for split, indices in idx.items():
        flat = {k: v[indices] for k, v in arrays.items()}
        if device_data:
            # HBM-parked arrays + on-device batch gather (data/device.py):
            # bit-identical batches to the host path below, without the
            # per-step host assembly/transfer (see the FAME epoch-loop
            # ladder in CLAUDE.md).
            from fairmultimodal_tpu.data.device import DeviceLoader

            loaders[split] = DeviceLoader(
                {k: flat[k] for k in model_keys if k in flat},
                bundle.labels[indices], batch_size,
                shuffle=(split == "train"), seed=seed, mesh=mesh)
        else:
            flat["labels"] = bundle.labels[indices]
            loaders[split] = NestedLoader(
                BatchIterator(flat, batch_size, shuffle=(split == "train"),
                              seed=seed),
                keys=model_keys)

    train_labels = bundle.labels[idx["train"]]
    if pos_weight_mode == "balanced":
        pw = compute_pos_weights(train_labels)
    elif pos_weight_mode == "neg_over_pos":
        pw = pos_weight_neg_over_pos(train_labels)
    elif pos_weight_mode == "neg_over_pos_clip10":
        pw = pos_weight_neg_over_pos(train_labels, clip=10.0)
    elif pos_weight_mode == "neg_over_pos_clip10_all":
        # 03/04/06/07/08/09 compute get_pos_weight over the WHOLE filtered
        # cohort (df_filtered, not the train split): 03_DfC.py:648-653,
        # 04_AdvDebias.py:1007-1012, 06_FairEHR-CLP.py:722-727,
        # 07_multimodal_average_fusion.py:643-647,
        # 08_multimodal_eddi_fusion.py:846-851,
        # 09_multimodal_sigmoid_fusion.py:663-670.
        pw = pos_weight_neg_over_pos(bundle.labels, clip=10.0)
    else:
        pw = np.ones(train_labels.shape[1], np.float32)

    return PreparedExperiment(bundle=bundle, arrays=arrays, idx=idx,
                              loaders=loaders, pos_weight=pw,
                              text_encoder=text_encoder)
