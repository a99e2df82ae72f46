"""Feature assembly: the per-training-script L2 layer.

Reproduces ``10_FAME.py:610-731`` (shared, with small variants, by scripts
02-09): merge the two common CSVs, filter to patients with at least one valid
note chunk, map demographics to category codes, select + z-score lab feature
columns, and stack the three task labels.

Everything here is host-side pandas/numpy (it runs once per training job);
the result is a :class:`FeatureBundle` of dense fixed-dtype arrays that feed
straight into device buffers.  The z-scoring itself is also exposed as a pure
function so it can run inside jit when featurizing streams.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from fairmultimodal_tpu import LABEL_COLUMNS

__all__ = ["FeatureBundle", "assemble_features", "zscore", "compute_pos_weights"]

# Columns never used as lab features (10_FAME.py:700-702).  The legacy-era
# readmission label (emitted by our ETL for SURVEY §2.4 parity; absent from
# the reference's final CSVs) must not leak into the lab feature set.
EXCLUDE_COLS = {
    "subject_id", "ROW_ID", "hadm_id", "ICUSTAY_ID",
    "short_term_mortality", "los_binary", "mechanical_ventilation",
    "readmission_within_30d", "readmission_within_30_days",
    "mortality_30d_post_discharge",
    "age", "GENDER", "GENDERS", "ETHNICITY", "INSURANCE",
}


@dataclasses.dataclass
class FeatureBundle:
    """Dense feature arrays for one cohort, ready for device transfer."""

    subject_id: np.ndarray          # [N] int64
    age_codes: np.ndarray           # [N] int32 (bucket codes)
    gender_codes: np.ndarray        # [N] int32
    ethnicity_codes: np.ndarray     # [N] int32
    insurance_codes: np.ndarray     # [N] int32
    labs: np.ndarray                # [N, L] float32, z-scored
    labels: np.ndarray              # [N, 3] float32
    lab_columns: List[str]
    note_chunks: List[List[str]]    # per-patient list of non-empty chunk texts
    text_embeddings: Optional[np.ndarray] = None  # [N, H] float32, filled later
    # Pre-z-score lab matrix (fillna(0) only): 04's stage-2 adversarial
    # debiasing feeds RAW lab columns (04_AdvDebias.py:888-891 — no scaling).
    labs_raw: Optional[np.ndarray] = None  # [N, L] float32

    @property
    def num_patients(self) -> int:
        return len(self.subject_id)

    @property
    def num_lab_features(self) -> int:
        return self.labs.shape[1]

    def vocab_sizes(self):
        """(num_ages, num_genders, num_ethnicities, num_insurances) as the
        reference computes them: nunique of the observed codes
        (10_FAME.py:762-765)."""
        return (
            int(len(np.unique(self.age_codes))),
            int(len(np.unique(self.gender_codes))),
            int(len(np.unique(self.ethnicity_codes))),
            int(len(np.unique(self.insurance_codes))),
        )


def get_age_bucket(age, upper: int = 89) -> str:
    """10_FAME.py:644-658.  ``upper=90`` reproduces 09's bucket-edge variant
    (09_multimodal_sigmoid_fusion.py:57-67: the last bucket is 70-90, so
    age-90 patients land in it instead of "Other")."""
    try:
        age = float(age)
    except (TypeError, ValueError):
        return "Other"
    if 15 <= age <= 29:
        return "15-29"
    elif 30 <= age <= 49:
        return "30-49"
    elif 50 <= age <= 69:
        return "50-69"
    elif 70 <= age <= upper:
        return f"70-{upper}"
    return "Other"


def map_ethnicity(e) -> str:
    """10_FAME.py:662-670: ints map through a fixed table; strings are
    title-cased and matched exactly (so 'WHITE - RUSSIAN' -> 'Other')."""
    try:
        e = int(e)
        return {0: "White", 1: "Black", 2: "Hispanic", 3: "Asian"}.get(e, "Other")
    except (TypeError, ValueError):
        e = str(e).strip().title()
        return e if e in {"White", "Black", "Asian", "Hispanic"} else "Other"


def map_insurance(i) -> str:
    """10_FAME.py:677-686."""
    try:
        i = int(i)
        return {0: "Government", 1: "Medicare", 2: "Medicaid", 3: "Private",
                4: "Self Pay"}.get(i, "Other")
    except (TypeError, ValueError):
        i = str(i).strip().title()
        return i if i in {"Government", "Medicare", "Medicaid", "Private",
                          "Self Pay"} else "Other"


def zscore(x: np.ndarray, mean=None, std=None, eps: float = 1e-6):
    """Global z-score with the reference's epsilon (10_FAME.py:710-712)."""
    x = np.asarray(x, dtype=np.float32)
    mean = np.mean(x, axis=0) if mean is None else mean
    std = np.std(x, axis=0) if std is None else std
    return (x - mean) / (std + eps), mean, std


def compute_pos_weights(labels: np.ndarray) -> np.ndarray:
    """Per-task positive-class weight n/(2*n_pos) (10_FAME.py:48-52,756-759)."""
    labels = np.asarray(labels)
    n = len(labels)
    out = []
    for i in range(labels.shape[1]):
        pos = labels[:, i].sum()
        out.append(n / (2.0 * pos) if pos > 0 else 1.0)
    return np.asarray(out, dtype=np.float32)


def _has_valid_note(row: pd.Series, note_columns: Sequence[str]) -> bool:
    for col in note_columns:
        v = row[col]
        if pd.notnull(v) and isinstance(v, str) and v.strip():
            return True
    return False


def assemble_features(
    structured: pd.DataFrame,
    unstructured: pd.DataFrame,
    require_notes: bool = True,
    age_bucket_upper: int = 89,
    label_columns: Optional[Sequence[str]] = None,
) -> FeatureBundle:
    """Merge + featurize the two common CSVs (10_FAME.py:610-731).

    Args:
      structured: ``final_structured_common.csv`` contents.
      unstructured: ``final_unstructured_common.csv`` contents.
      require_notes: drop patients without any valid note chunk
        (``10_FAME.py:629-635``; set False for structured-only models).
      age_bucket_upper: last age bucket's upper edge — 89 canonically, 90
        for 09's variant (09:57-67, behind its pipeline's reference_compat).
      label_columns: task label columns to stack (default the three final-era
        tasks; the legacy EDDI pipeline passes
        ``("short_term_mortality", "readmission_within_30d")``).
    """
    label_columns = list(label_columns or LABEL_COLUMNS)
    from fairmultimodal_tpu.data.validate import validate_common_frames

    validate_common_frames(structured, unstructured,
                           label_columns=label_columns)
    unstructured = unstructured.drop(
        columns=["short_term_mortality", "los_binary", "mechanical_ventilation",
                 "age", "GENDER", "ETHNICITY", "INSURANCE"],
        errors="ignore",
    )
    df = pd.merge(structured, unstructured, on=["subject_id", "hadm_id"],
                  how="inner", suffixes=("_struct", "_unstruct"))
    if df.empty:
        raise ValueError("Merged DataFrame is empty. Check your merge keys.")

    for col in label_columns:
        df[col] = df[col].astype(int)

    note_columns = [c for c in df.columns if c.startswith("note_")]
    if require_notes:
        mask = df.apply(lambda r: _has_valid_note(r, note_columns), axis=1)
        df = df[mask].copy()

    if "age" not in df.columns:
        if "Age" in df.columns:
            df = df.rename(columns={"Age": "age"})
        else:
            df["age"] = 0

    # Demographic codes, exactly as the reference derives them: apply the
    # mapper, then pandas category codes over the *observed* sorted values.
    df["age"] = df["age"].apply(
        lambda a: get_age_bucket(a, upper=age_bucket_upper)
    ).astype("category").cat.codes
    if "ETHNICITY" in df.columns:
        df["ETHNICITY"] = df["ETHNICITY"].apply(map_ethnicity).astype("category").cat.codes
    else:
        df["ETHNICITY"] = 0
    if "INSURANCE" in df.columns:
        df["INSURANCE"] = df["INSURANCE"].apply(map_insurance).astype("category").cat.codes
    else:
        df["INSURANCE"] = 0
    if "GENDER" in df.columns:
        df["GENDER"] = df["GENDER"].astype("category").cat.codes
    else:
        df["GENDER"] = 0

    lab_cols = [
        c for c in df.columns
        if c not in EXCLUDE_COLS and not c.startswith("note_")
        and pd.api.types.is_numeric_dtype(df[c])
    ]
    labs_raw = df[lab_cols].fillna(0).to_numpy(dtype=np.float32)
    labs, _, _ = zscore(labs_raw)

    chunks: List[List[str]] = []
    for _, row in df.iterrows():
        patient_chunks = [
            row[c] for c in note_columns
            if pd.notnull(row[c]) and isinstance(row[c], str) and row[c].strip()
        ]
        chunks.append(patient_chunks)

    return FeatureBundle(
        subject_id=df["subject_id"].to_numpy(np.int64),
        age_codes=df["age"].to_numpy(np.int32),
        gender_codes=df["GENDER"].to_numpy(np.int32),
        ethnicity_codes=df["ETHNICITY"].to_numpy(np.int32),
        insurance_codes=df["INSURANCE"].to_numpy(np.int32),
        labs=labs,
        labels=df[label_columns].to_numpy(np.float32),
        lab_columns=lab_cols,
        note_chunks=chunks,
        labs_raw=labs_raw,
    )
