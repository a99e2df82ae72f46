"""Day-1 input validation for real MIMIC-III data (round-5 hardening).

The ETL and pipelines assume reference-shaped CSVs; without validation a
missing column or malformed table fails deep inside pandas with an opaque
traceback, potentially hours into a run.  This module fails FAST and NAMES
the file and column:

- :func:`validate_mimic_dir` — pre-flight for ``run_etl``: every expected
  raw table exists, is readable, and carries the columns the ETL consumes
  (header-only reads, so the check costs milliseconds even on 30-GB tables).
- :func:`validate_common_frames` — pre-flight for the training pipelines:
  the two ``*_common.csv`` tables carry merge keys, labels and (for the
  unstructured side) note chunk columns.

Unexpected demographic category STRINGS are not errors: the categorizers
route them to "Other"/"Government" exactly like the reference
(00_data.py:22-47); :func:`count_unmapped` reports how many rows took that
path so real-data users can see it happening (printed by build_structured).
"""

from __future__ import annotations

import gzip
import os
from typing import Dict, Iterable, List, Optional

import pandas as pd

__all__ = ["MimicInputError", "REQUIRED_RAW_COLUMNS", "validate_mimic_dir",
           "validate_common_frames", "count_unmapped"]


class MimicInputError(ValueError):
    """Raised when an input table is missing, unreadable, or lacks columns
    the pipeline needs.  Message always names the file and the columns."""


# Columns each raw table must carry = exactly what data/etl.py reads
# (usecols and downstream accesses).  Optional tables may be absent entirely
# (the ETL skips them) but when present must have these columns.
REQUIRED_RAW_COLUMNS: Dict[str, Dict] = {
    "ADMISSIONS.csv.gz": {
        "required": True,
        "columns": ["SUBJECT_ID", "HADM_ID", "ADMITTIME", "DISCHTIME",
                    "DEATHTIME", "ETHNICITY", "INSURANCE"],
    },
    "PATIENTS.csv.gz": {
        "required": True,
        "columns": ["SUBJECT_ID", "GENDER", "DOB"],
    },
    "ICUSTAYS.csv.gz": {
        "required": True,
        "columns": ["SUBJECT_ID", "HADM_ID", "ICUSTAY_ID", "INTIME",
                    "OUTTIME"],
    },
    "CHARTEVENTS.csv.gz": {
        "required": True,
        "columns": ["SUBJECT_ID", "HADM_ID", "ICUSTAY_ID", "CHARTTIME",
                    "ITEMID", "VALUE", "ERROR"],
    },
    "LABEVENTS.csv.gz": {
        "required": False,
        "columns": ["SUBJECT_ID", "HADM_ID", "CHARTTIME", "ITEMID",
                    "VALUENUM"],
    },
    "PROCEDUREEVENTS_MV.csv.gz": {
        "required": False,
        "columns": ["ICUSTAY_ID", "STARTTIME", "ITEMID"],
    },
    "NOTEEVENTS.csv.gz": {
        "required": True,
        "columns": ["SUBJECT_ID", "HADM_ID", "TEXT"],
    },
    # Feature-set-C event tables: any subset may be present.
    "inputevents_cv.csv.gz": {"required": False,
                              "columns": ["SUBJECT_ID", "HADM_ID", "ITEMID"]},
    "inputevents_mv.csv.gz": {"required": False,
                              "columns": ["SUBJECT_ID", "HADM_ID", "ITEMID"]},
    "OUTPUTEVENTS.csv.gz": {"required": False,
                            "columns": ["SUBJECT_ID", "HADM_ID", "ITEMID"]},
    "PRESCRIPTIONS.csv.gz": {"required": False,
                             "columns": ["SUBJECT_ID", "HADM_ID"]},
}


def _read_header(path: str) -> List[str]:
    try:
        df = pd.read_csv(path, compression="gzip", nrows=0)
    except (OSError, gzip.BadGzipFile) as e:
        raise MimicInputError(f"{path}: cannot read table header ({e})")
    except Exception as e:
        raise MimicInputError(
            f"{path}: not a parseable gzipped CSV ({type(e).__name__}: {e})")
    return [c.upper() for c in df.columns]


def validate_mimic_dir(mimic_dir: str,
                       tables: Optional[Iterable[str]] = None) -> None:
    """Fail fast (milliseconds) if the raw MIMIC directory cannot feed the
    ETL: missing required files, unreadable files, or missing columns — each
    error names the file and the exact columns."""
    if not os.path.isdir(mimic_dir):
        raise MimicInputError(
            f"{mimic_dir}: not a directory (pass --mimic_dir pointing at the "
            f"raw MIMIC-III csv.gz tables)")
    problems: List[str] = []
    specs = tables or REQUIRED_RAW_COLUMNS
    for name in specs:
        spec = REQUIRED_RAW_COLUMNS[name]
        path = os.path.join(mimic_dir, name)
        if not os.path.exists(path):
            if spec["required"]:
                problems.append(f"{name}: required table is missing")
            continue
        try:
            header = _read_header(path)
        except MimicInputError as e:
            problems.append(str(e))
            continue
        missing = [c for c in spec["columns"] if c.upper() not in header]
        if missing:
            problems.append(f"{name}: missing column(s) "
                            f"{', '.join(missing)} "
                            f"(found: {', '.join(sorted(header)[:12])}...)")
    if problems:
        raise MimicInputError(
            "raw MIMIC input validation failed in "
            f"{mimic_dir}:\n  - " + "\n  - ".join(problems))


def validate_common_frames(structured: pd.DataFrame,
                           unstructured: pd.DataFrame,
                           label_columns: Optional[Iterable[str]] = None,
                           ) -> None:
    """Pre-flight for the training pipelines: the two cohort tables carry
    merge keys, the requested label columns, and note chunks."""
    problems: List[str] = []
    labels = list(label_columns or
                  ("short_term_mortality", "los_binary",
                   "mechanical_ventilation"))
    for key in ("subject_id", "hadm_id"):
        if key not in structured.columns:
            problems.append(f"structured table: missing merge key '{key}'")
        if key not in unstructured.columns:
            problems.append(f"unstructured table: missing merge key '{key}'")
    for col in labels:
        if col not in structured.columns:
            problems.append(f"structured table: missing label column '{col}'")
        elif structured[col].isna().any():
            problems.append(f"structured table: label column '{col}' has "
                            f"{int(structured[col].isna().sum())} NaN rows "
                            f"(labels must be 0/1)")
    if not any(c.startswith("note_") for c in unstructured.columns):
        problems.append("unstructured table: no note_* chunk columns "
                        "(expected note_chunk_1, note_chunk_2, ...)")
    if problems:
        raise MimicInputError(
            "cohort table validation failed:\n  - " + "\n  - ".join(problems))


def count_unmapped(raw: pd.Series, mapped: pd.Series,
                   catch_all: str) -> int:
    """Rows whose raw category string fell through to the catch-all bucket
    without literally being that bucket — real-data observability for the
    reference's silent 'Other' routing (00_data.py:22-47)."""
    fell_through = (mapped == catch_all) & (
        raw.astype(str).str.strip().str.upper() != catch_all.upper())
    return int(fell_through.sum())
