"""MIMIC-III ETL: cohort construction and feature tables.

Faithful reimplementation of the reference pipeline
(``FinalCode/New/Final/00_data.py``) with the same outputs:

- ``final_structured_dataset.csv``                       (base cohort)
- ``final_structured_with_feature_set_C_24h_2h_bins.csv`` (wide features)
- ``unstructured_with_demographics.csv``                 (notes + chunks)
- ``final_structured_common.csv`` / ``final_unstructured_common.csv``

Differences from the reference are performance-only: the per-row
``DataFrame.apply`` over the full CHARTEVENTS scan (``00_data.py:129``, the
ETL's hottest loop) is replaced by vectorized boolean masks, and tables are
read with explicit usecols.  Semantics — itemid whitelists, flag rules,
2-hour binning, aggregation functions, first-stay dedup, note cleaning and
512-whitespace-token chunking — are identical and covered by golden tests
over synthetic raw tables.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

__all__ = ["run_etl", "FEATURE_SET_C", "split_text_to_chunks",
           "clean_note_text", "clean_and_chunk_texts", "chunk_lists_to_frame"]

# --- Constant tables (data, reproduced from 00_data.py:64-78,346-352) -------

VENT_ITEMIDS = [
    720, 223848, 223849, 467,
    445, 448, 449, 450, 1340, 1486, 1600, 224687,
    639, 654, 681, 682, 683, 684, 224685, 224684, 224686,
    218, 436, 535, 444, 224697, 224695, 224696, 224746, 224747,
    221, 1, 1211, 1655, 2000, 226873, 224738, 224419, 224750, 227187,
    543, 5865, 5866, 224707, 224709, 224705, 224706,
    60, 437, 505, 506, 686, 220339, 224700,
    3459,
    501, 502, 503, 224702,
    223, 667, 668, 669, 670, 671, 672,
    224701,
    468, 469, 470, 471, 227287, 226732, 223834,
]

# itemids that imply mechanical ventilation unconditionally (00_data.py:98-106).
_MECHVENT_ALWAYS = {
    445, 448, 449, 450, 1340, 1486, 1600, 224687,
    639, 654, 681, 682, 683, 684, 224685, 224684, 224686,
    218, 436, 535, 444, 224697, 224695, 224696, 224746, 224747,
    221, 1, 1211, 1655, 2000, 226873, 224738, 224419, 224750, 227187,
    543, 5865, 5866, 224707, 224709, 224705, 224706,
    60, 437, 505, 506, 686, 220339, 224700,
    3459, 501, 502, 503, 224702,
    223, 667, 668, 669, 670, 671, 672, 224701,
}

_O2_DEVICES_MV = [
    "Nasal cannula", "Face tent", "Aerosol-cool", "Trach mask ",
    "High flow neb", "Non-rebreather", "Venti mask ", "Medium conc mask ",
    "T-piece", "High flow nasal cannula", "Ultrasonic neb", "Vapomist",
]
_O2_DEVICES_CV = [
    "Cannula", "Nasal Cannula", "Face Tent", "Aerosol-Cool", "Trach Mask",
    "Hi Flow Neb", "Non-Rebreather", "Venti Mask", "Medium Conc Mask",
    "Vapotherm", "T-Piece", "Hood", "Hut", "TranstrachealCat",
    "Heated Neb", "Ultrasonic Neb",
]

FEATURE_SET_C: Dict[str, list] = {
    "chartevents": [220051, 220052, 618, 220210, 224641, 220292, 535, 224695,
                    506, 220339, 448, 224687, 224685, 220293, 444, 224697,
                    220074, 224688, 223834, 50815, 225664, 220059, 683, 224684,
                    220060, 226253, 224161, 642, 225185, 226758, 226757, 226756,
                    220050, 211, 220045, 223761, 223835, 226873, 226871, 8364,
                    8555, 8368, 53, 646, 1529, 50809, 50931, 51478, 224639,
                    763, 224639, 226707],
    "labevents": [51221, 51480, 51265, 50811, 51222, 51249, 51248, 51250,
                  51279, 51277, 50902, 50868, 50912, 50809, 50931, 51478,
                  50960, 50893, 50970, 51237, 51274, 51275, 51375, 51427,
                  51446, 51116, 51244, 51355, 51379, 51120, 51254, 51256,
                  51367, 51387, 51442, 51112, 51146, 51345, 51347, 51368,
                  51419, 51444, 51114, 51200, 51474, 50820, 50831, 51094,
                  51491, 50802, 50804, 50818, 51498, 50813, 50861, 50878,
                  50863, 50862, 490, 1165, 50902, 50819],
    "inputevents": [30008, 220864, 30005, 220970, 221385, 30023, 221456,
                    221668, 221749, 221794, 221828, 221906, 30027, 222011,
                    222056, 223258, 30126, 225154, 30297, 225166, 225168,
                    30144, 225799, 225823, 44367, 225828, 225943, 30065,
                    225944, 226089, 226364, 30056, 226452, 30059, 226453,
                    227522, 227523, 30044, 221289, 30051, 222315, 30043,
                    221662, 30124, 30118, 221744, 30131, 222168],
    "outputevents": [226573, 40054, 40085, 44890, 43703, 226580, 226588,
                     226589, 226599, 226626, 226633, 227510],
    "prescriptions": ["Docusate Sodium", "Aspirin", "Bisacodyl",
                      "Humulin-R Insulin", "Metoprolol",
                      "Pantoprazole Sodium", "Pantoprazole"],
}

INPUT_FILES = {
    "chartevents": "CHARTEVENTS.csv.gz",
    "labevents": "LABEVENTS.csv.gz",
    "inputevents": ["inputevents_cv.csv.gz", "inputevents_mv.csv.gz"],
    "outputevents": "OUTPUTEVENTS.csv.gz",
    "prescriptions": "PRESCRIPTIONS.csv.gz",
}


# --- Demographic categorizers (00_data.py:7-46) ------------------------------

def calculate_age(dob: pd.Timestamp, intime: pd.Timestamp) -> int:
    return intime.year - dob.year - ((intime.month, intime.day) < (dob.month, dob.day))


def categorize_age(age) -> str:
    if 15 <= age <= 29:
        return "15-29"
    elif 30 <= age <= 49:
        return "30-49"
    elif 50 <= age <= 69:
        return "50-69"
    elif 70 <= age <= 89:
        return "70-89"
    return "Other"


def categorize_ethnicity(ethnicity) -> str:
    eth = str(ethnicity).upper()
    if eth in ("WHITE", "WHITE - RUSSIAN", "WHITE - OTHER EUROPEAN",
               "WHITE - BRAZILIAN", "WHITE - EASTERN EUROPEAN"):
        return "White"
    if eth in ("BLACK/AFRICAN AMERICAN", "BLACK/CAPE VERDEAN", "BLACK/HAITIAN",
               "BLACK/AFRICAN", "CARIBBEAN ISLAND"):
        return "Black"
    if eth in ("HISPANIC OR LATINO", "HISPANIC/LATINO - PUERTO RICAN",
               "HISPANIC/LATINO - DOMINICAN", "HISPANIC/LATINO - MEXICAN"):
        return "Hispanic"
    if eth in ("ASIAN", "ASIAN - CHINESE", "ASIAN - INDIAN"):
        return "Asian"
    return "Other"


def categorize_insurance(insurance) -> str:
    ins = str(insurance).upper()
    if "MEDICARE" in ins:
        return "Medicare"
    if "PRIVATE" in ins:
        return "Private"
    if "MEDICAID" in ins:
        return "Medicaid"
    if "SELF PAY" in ins:
        return "Self Pay"
    return "Government"


# --- Note cleaning (00_data.py:395-439) --------------------------------------

def clean_note_text(x: str) -> str:
    """Regex cleanup applied to lowercased note text (00_data.py:395-406)."""
    y = re.sub(r"\[(.*?)\]", "", x)
    y = re.sub(r"[0-9]+\.", "", y)
    y = re.sub(r"dr\.", "doctor", y)
    y = re.sub(r"m\.d\.", "md", y)
    y = re.sub(r"admission date:", "", y)
    y = re.sub(r"discharge date:", "", y)
    y = re.sub(r"--|__|==", "", y)
    return y


def split_text_to_chunks(text: str, chunk_size: int = 512) -> List[str]:
    """Whitespace-token chunking (00_data.py:422-429)."""
    tokens = text.split()
    return [" ".join(tokens[i:i + chunk_size]) for i in range(0, len(tokens), chunk_size)]


# --- Pipeline stages ----------------------------------------------------------

def _read(mimic_dir: str, name: str, **kw) -> pd.DataFrame:
    return pd.read_csv(os.path.join(mimic_dir, name), compression="gzip",
                       low_memory=False, **kw)


def compute_ventilation_flags(mimic_dir: str) -> pd.DataFrame:
    """Per-(subject, hadm) mechanical_ventilation flag (00_data.py:54-170).

    Vectorized: the reference's per-row ``apply`` becomes boolean masks over
    the itemid/value columns, then the same (icustay, charttime) max-reduce
    and (subject, hadm) max-reduce.
    """
    ce = _read(mimic_dir, "CHARTEVENTS.csv.gz",
               usecols=["ICUSTAY_ID", "CHARTTIME", "ITEMID", "VALUE", "ERROR"])
    ce.columns = ce.columns.str.lower()
    ce = ce[ce["value"].notnull()]
    ce = ce[(ce["error"] != 1) | (ce["error"].isnull())]
    ce = ce[ce["itemid"].isin(VENT_ITEMIDS)]

    iv = ce["itemid"]
    val = ce["value"].astype(str)
    mechvent = (
        ((iv == 720) & (val != "Other/Remarks"))
        | ((iv == 223848) & (val != "Other"))
        | (iv == 223849)
        | ((iv == 467) & (val == "Ventilator"))
        | iv.isin(_MECHVENT_ALWAYS)
    )
    oxygen = ((iv == 226732) & val.isin(_O2_DEVICES_MV)) | (
        (iv == 467) & val.isin(_O2_DEVICES_CV)
    )
    # NB: itemid 640 (extubation, 00_data.py:118-121) is not in VENT_ITEMIDS,
    # so after the whitelist filter these flags can never fire from
    # CHARTEVENTS — reproduced deliberately for parity.
    extubated = (iv == 640) & val.isin(["Extubated", "Self Extubation"])
    selfext = (iv == 640) & (val == "Self Extubation")

    ce = ce.assign(
        mechvent=mechvent.astype(int),
        oxygentherapy=oxygen.astype(int),
        extubated=extubated.astype(int),
        selfextubated=selfext.astype(int),
    )
    vent_ce = ce.groupby(["icustay_id", "charttime"], as_index=False)[
        ["mechvent", "oxygentherapy", "extubated", "selfextubated"]
    ].max()

    pe = _read(mimic_dir, "PROCEDUREEVENTS_MV.csv.gz",
               usecols=["ICUSTAY_ID", "STARTTIME", "ITEMID"])
    pe.columns = pe.columns.str.lower()
    pe = pe[pe["itemid"].isin([227194, 225468, 225477])]
    pe = pe.rename(columns={"starttime": "charttime"})
    pe["mechvent"] = 0
    pe["oxygentherapy"] = 0
    pe["extubated"] = 1
    pe["selfextubated"] = (pe["itemid"] == 225468).astype(int)
    vent_pe = pe[["icustay_id", "charttime", "mechvent", "oxygentherapy",
                  "extubated", "selfextubated"]].drop_duplicates()

    flags = pd.concat([vent_ce, vent_pe], ignore_index=True).drop_duplicates(
        subset=["icustay_id", "charttime"])
    stays = _read(mimic_dir, "ICUSTAYS.csv.gz",
                  usecols=["SUBJECT_ID", "HADM_ID", "ICUSTAY_ID"])
    stays.columns = stays.columns.str.lower()
    flags = flags.merge(stays, on="icustay_id", how="left")
    agg = flags.groupby(["subject_id", "hadm_id"], as_index=False)[
        ["mechvent", "oxygentherapy", "extubated", "selfextubated"]
    ].max()
    agg["mechanical_ventilation"] = agg[
        ["mechvent", "oxygentherapy", "extubated", "selfextubated"]
    ].max(axis=1)
    return agg[["subject_id", "hadm_id", "mechanical_ventilation"]]


def aggregate_lab_bins(mimic_dir: str, bin_size: int = 2) -> Optional[pd.DataFrame]:
    """LABEVENTS -> per-(subject, hadm, 2h-bin) mean per itemid, wide
    ``lab_t<itemid>`` columns (00_data.py:173-197)."""
    df = _read(mimic_dir, "LABEVENTS.csv.gz")
    df.columns = df.columns.str.lower()
    if "valuenum" not in df.columns:
        return None
    df = df[df["valuenum"].notnull()]
    stays = _read(mimic_dir, "ICUSTAYS.csv.gz",
                  usecols=["SUBJECT_ID", "HADM_ID", "INTIME"])
    stays.columns = stays.columns.str.lower()
    stays["intime"] = pd.to_datetime(stays["intime"])
    df = df.merge(stays, on=["subject_id", "hadm_id"], how="inner")
    df["charttime"] = pd.to_datetime(df["charttime"], errors="coerce")
    df = df.dropna(subset=["charttime"])
    hours = (df["charttime"] - df["intime"]).dt.total_seconds() / 3600
    df = df[hours.between(0, 24)]
    df["hour_bin"] = (hours[hours.between(0, 24)] // bin_size).astype(int)
    agg = (df.groupby(["subject_id", "hadm_id", "hour_bin", "itemid"])["valuenum"]
             .mean().unstack().reset_index())
    agg = agg.drop(columns=["hour_bin"])
    agg.columns = ["subject_id", "hadm_id"] + [
        f"lab_t{int(c)}" for c in agg.columns if c not in ("subject_id", "hadm_id")
    ]
    return agg


def _native_stay_arrays(icu_stays: pd.DataFrame):
    epoch = pd.Timestamp("1970-01-01")
    subj = icu_stays["subject_id"].to_numpy(np.int64)
    hadm = icu_stays["hadm_id"].to_numpy(np.int64)
    intime = ((pd.to_datetime(icu_stays["intime"]) - epoch)
              .dt.total_seconds().to_numpy(np.float64))
    return subj, hadm, intime


def _aggregate_native(
    mimic_dir: str,
    files,
    table_name: str,
    icu_stays: pd.DataFrame,
    itemids,
    agg_func: str,
) -> Optional[Tuple[pd.DataFrame, int]]:
    """Native streaming path: per-file long-form aggregation via
    ``native/fastetl`` then a cheap pandas pivot.  Only valid when
    cross-file re-aggregation is associative (sum) or single-file (mean).
    Returns (wide frame, rows scanned) or None when unavailable."""
    from fairmultimodal_tpu.data import native

    if not native.available():
        return None
    file_list = files if isinstance(files, list) else [files]
    if agg_func == "mean" and len(file_list) > 1:
        return None      # per-file means don't combine; use pandas
    subj, hadm, intime = _native_stay_arrays(icu_stays)
    items = (np.asarray(sorted(itemids), np.int64)
             if itemids else None)
    frames = []
    rows_scanned = 0
    for f in file_list:
        path = os.path.join(mimic_dir, f)
        if not os.path.exists(path):
            continue
        (o_subj, o_hadm, o_bin, o_item, o_val,
         n_rows) = native.aggregate_events_native(
            path, subj, hadm, intime, items, window_hours=24.0, bin_hours=2.0,
            agg=agg_func)
        rows_scanned += n_rows
        frames.append(pd.DataFrame({
            "subject_id": o_subj, "hadm_id": o_hadm, "hour_bin": o_bin,
            "itemid": o_item, "value": o_val}))
    if not frames:
        return None
    long = pd.concat(frames, ignore_index=True)
    if len(frames) > 1:  # sum across files (reference concatenates first)
        long = (long.groupby(["subject_id", "hadm_id", "hour_bin", "itemid"])
                ["value"].sum().reset_index())
    agg = (long.set_index(["subject_id", "hadm_id", "hour_bin", "itemid"])
           ["value"].unstack().reset_index())
    if "hour_bin" in agg.columns:
        agg = agg.drop(columns=["hour_bin"])
    agg.columns = ["subject_id", "hadm_id"] + [
        f"{table_name}_t{int(c)}" for c in agg.columns[2:]
    ]
    return agg, rows_scanned


def aggregate_feature_table(
    mimic_dir: str,
    table_name: str,
    filtered_subjects: set,
    icu_stays: pd.DataFrame,
    use_native: Optional[bool] = None,
    timing_sink: Optional[List[Dict]] = None,
) -> Optional[pd.DataFrame]:
    """One feature-set-C table -> wide ``<table>_t<itemid>`` columns
    (00_data.py:200-256). sum for input/output events, mean otherwise.

    When the native streaming aggregator is available (``native/fastetl``)
    the multi-hundred-million-row tables are scanned in C++ without
    materializing the frame; pandas is the fallback and the semantics oracle
    (tests/test_native.py).  ``prescriptions`` has no itemid column and
    always uses pandas.  ``use_native``: None = auto (native when it builds
    and the table qualifies), True = require it, False = force pandas.
    ``timing_sink``: list collecting {table, path, rows, seconds} entries
    for the ``--timing`` report.
    """
    import time as _time

    t0 = _time.perf_counter()

    def _record(path_kind: str, rows: int):
        if timing_sink is not None:
            timing_sink.append({"table": table_name, "path": path_kind,
                                "rows": int(rows),
                                "seconds": _time.perf_counter() - t0})

    if table_name != "prescriptions" and use_native is not False:
        stays = icu_stays[icu_stays["subject_id"].isin(filtered_subjects)]
        agg_func = "sum" if table_name in ("inputevents", "outputevents") else "mean"
        try:
            out = _aggregate_native(
                mimic_dir, INPUT_FILES[table_name], table_name, stays,
                FEATURE_SET_C.get(table_name, []), agg_func)
            if out is not None:
                frame, rows_scanned = out
                _record("native", rows_scanned)
                return frame
        except Exception:
            if use_native:
                raise
    files = INPUT_FILES[table_name]
    if isinstance(files, list):
        df = pd.concat([_read(mimic_dir, f) for f in files], ignore_index=True)
    else:
        df = _read(mimic_dir, files)
    df.columns = df.columns.str.lower()
    n_raw = len(df)
    if "subject_id" not in df.columns:
        return None
    df = df[df["subject_id"].isin(filtered_subjects)]

    ts_col = next((c for c in ["charttime", "starttime", "storetime",
                               "eventtime", "endtime"] if c in df.columns), None)
    if ts_col is None:
        return None
    df[ts_col] = pd.to_datetime(df[ts_col], errors="coerce")
    df = df.dropna(subset=[ts_col])

    df = df.merge(icu_stays[["subject_id", "hadm_id", "intime"]],
                  on=["subject_id", "hadm_id"], how="inner")
    hours = (df[ts_col] - df["intime"]).dt.total_seconds() / 3600
    df = df[hours.between(0, 24)]
    df["hours_since_admission"] = hours[hours.between(0, 24)]

    if table_name != "prescriptions" and "itemid" in df.columns:
        df = df[df["itemid"].isin(FEATURE_SET_C.get(table_name, []))]

    numeric_col = next((c for c in ["value", "amount", "valuenum"]
                        if c in df.columns), None)
    if numeric_col is None:
        return None
    df[numeric_col] = pd.to_numeric(df[numeric_col], errors="coerce")

    df["hour_bin"] = (df["hours_since_admission"] // 2).astype(int)
    agg_func = "sum" if table_name in ("inputevents", "outputevents") else "mean"
    if "itemid" not in df.columns:
        return None
    agg = (df.groupby(["subject_id", "hadm_id", "hour_bin", "itemid"])[numeric_col]
             .agg(agg_func).unstack().reset_index())
    if "hour_bin" in agg.columns:
        agg = agg.drop(columns=["hour_bin"])
    agg.columns = ["subject_id", "hadm_id"] + [
        f"{table_name}_t{int(c)}" for c in agg.columns[2:]
    ]
    _record("pandas", n_raw)
    return agg


def compute_readmission_labels(admissions: pd.DataFrame,
                               mode: str = "reference") -> pd.DataFrame:
    """Per-admission 30-day readmission label.

    ``mode="reference"`` is the formula the reference actually computes
    (Code/1_preprocessing_structured.py:27-28):
    ``groupby(subject)['ADMITTIME'].diff().dt.days <= 30`` — the gap between
    CONSECUTIVE ADMISSION TIMES, flagged on the **later** admission (a stay
    is positive when it began within 30 days of the previous admission;
    first admissions are NaT-diff -> 0).  Note ``.dt.days`` floors, exactly
    like the reference.

    ``mode="discharge_gap"`` is the rounds-1-3 variant kept as a documented
    alternative: next ADMITTIME within 30 days of THIS DISCHTIME, flagged on
    the **earlier** admission (the clinically conventional definition).

    Returns ``[subject_id, hadm_id, readmission_within_30d]``.
    """
    adm_sorted = admissions.sort_values(["subject_id", "ADMITTIME"]).copy()
    if mode == "reference":
        gap_days = adm_sorted.groupby("subject_id")["ADMITTIME"].diff().dt.days
        adm_sorted["readmission_within_30d"] = (gap_days <= 30).astype(int)
    elif mode == "discharge_gap":
        adm_sorted["next_admit"] = (
            adm_sorted.groupby("subject_id")["ADMITTIME"].shift(-1))
        gap_days = ((adm_sorted["next_admit"] - adm_sorted["DISCHTIME"])
                    .dt.total_seconds() / 86400.0)
        adm_sorted["readmission_within_30d"] = (
            (gap_days >= 0) & (gap_days <= 30)).astype(int)
    else:
        raise ValueError(f"unknown readmission mode {mode!r}; "
                         "expected 'reference' or 'discharge_gap'")
    return adm_sorted[["subject_id", "hadm_id", "readmission_within_30d"]]


def compute_mortality_30d_post_discharge(df: pd.DataFrame) -> pd.Series:
    """Earliest-era mortality label (Code/1_preprocessing_structured.py:24-26):
    death within 30 days of DISCHARGE, ``(DEATHTIME − DISCHTIME).dt.days <=
    30`` — NaT-safe (no DEATHTIME -> NaN -> False -> 0) and inclusive of
    in-hospital deaths (negative day gaps).  Distinct from the Final era's
    ``DEATHTIME.notnull()`` on any data where DEATHTIME can fall more than
    30 days after discharge."""
    return ((df["DEATHTIME"] - df["DISCHTIME"]).dt.days <= 30).astype(int)


def build_structured(mimic_dir: str, out_dir: str, los_threshold_hours: float = 168.0,
                     readmission_mode: str = "reference",
                     use_native: Optional[bool] = None,
                     timing_sink: Optional[List[Dict]] = None) -> pd.DataFrame:
    """Base cohort + labels + lab bins + feature set C (00_data.py:259-392)."""
    admissions = _read(mimic_dir, "ADMISSIONS.csv.gz",
                       usecols=["SUBJECT_ID", "HADM_ID", "ADMITTIME", "DISCHTIME",
                                "DEATHTIME", "ETHNICITY", "INSURANCE"])
    patients = _read(mimic_dir, "PATIENTS.csv.gz",
                     usecols=["SUBJECT_ID", "GENDER", "DOB"])
    icu = _read(mimic_dir, "ICUSTAYS.csv.gz",
                usecols=["SUBJECT_ID", "HADM_ID", "ICUSTAY_ID", "INTIME", "OUTTIME"])

    for col in ["ADMITTIME", "DISCHTIME", "DEATHTIME"]:
        admissions[col] = pd.to_datetime(admissions[col])
    icu["INTIME"] = pd.to_datetime(icu["INTIME"])
    icu["OUTTIME"] = pd.to_datetime(icu["OUTTIME"])

    admissions = admissions.rename(columns={"SUBJECT_ID": "subject_id", "HADM_ID": "hadm_id"})
    patients = patients.rename(columns={"SUBJECT_ID": "subject_id"})
    icu = icu.rename(columns={"SUBJECT_ID": "subject_id", "HADM_ID": "hadm_id"})

    df = pd.merge(icu, admissions, on=["subject_id", "hadm_id"], how="left")
    df = pd.merge(df, patients, on="subject_id", how="left")

    df["DOB"] = pd.to_datetime(df["DOB"], errors="coerce")
    df["age"] = df.apply(
        lambda r: calculate_age(r["DOB"], r["INTIME"])
        if pd.notnull(r["DOB"]) and pd.notnull(r["INTIME"]) else np.nan, axis=1)
    df = df[(df["age"] >= 15) & (df["age"] <= 90)]
    df["age_bucket"] = df["age"].apply(categorize_age)
    df["ethnicity_category"] = df["ETHNICITY"].apply(categorize_ethnicity)
    df["insurance_category"] = df["INSURANCE"].apply(categorize_insurance)
    # Real-data observability: the reference silently routes unexpected
    # category strings to the catch-all bucket (00_data.py:22-47); report
    # how many rows took that path so surprises are visible, not silent.
    from fairmultimodal_tpu.data.validate import count_unmapped

    n_eth = count_unmapped(df["ETHNICITY"], df["ethnicity_category"], "Other")
    n_ins = count_unmapped(df["INSURANCE"], df["insurance_category"],
                           "Government")
    if n_eth:
        print(f"[etl] {n_eth} rows with unmapped ETHNICITY routed to 'Other'")
    if n_ins:
        print(f"[etl] {n_ins} rows with unmapped INSURANCE routed to "
              f"'Government' (reference catch-all, 00_data.py:35-46)")
    df["gender"] = df["GENDER"].str.lower().apply(
        lambda x: "male" if "m" in x else ("female" if "f" in x else x))

    df["short_term_mortality"] = df["DEATHTIME"].notnull().astype(int)
    df["icu_los"] = (df["OUTTIME"] - df["INTIME"]).dt.total_seconds() / 3600
    df["los_binary"] = (df["icu_los"] > los_threshold_hours).astype(int)

    # Legacy-era labels kept in the inventory (Code/1_preprocessing_structured
    # .py:24-28; used by the earliest mortality+readmission generations).
    df["mortality_30d_post_discharge"] = compute_mortality_30d_post_discharge(df)
    readm = compute_readmission_labels(admissions, mode=readmission_mode)
    df = pd.merge(df, readm, on=["subject_id", "hadm_id"], how="left")
    df["readmission_within_30d"] = df["readmission_within_30d"].fillna(0).astype(int)

    vent = compute_ventilation_flags(mimic_dir)
    df = pd.merge(df, vent, on=["subject_id", "hadm_id"], how="left")
    df["mechanical_ventilation"] = df["mechanical_ventilation"].fillna(0).astype(int)

    lab = aggregate_lab_bins(mimic_dir)
    if lab is not None:
        df = pd.merge(df, lab, on=["subject_id", "hadm_id"], how="left")

    # First ICU stay per subject (00_data.py:323).
    df = df.sort_values(by="INTIME").groupby("subject_id").first().reset_index()
    df.to_csv(os.path.join(out_dir, "final_structured_dataset.csv"), index=False)

    # Feature set C merge (00_data.py:329-386).
    filtered_subjects = set(df["subject_id"].unique())
    stays = _read(mimic_dir, "ICUSTAYS.csv.gz",
                  usecols=["SUBJECT_ID", "HADM_ID", "INTIME", "OUTTIME"])
    stays.columns = stays.columns.str.lower()
    stays["intime"] = pd.to_datetime(stays["intime"])
    stays["outtime"] = pd.to_datetime(stays["outtime"])
    stays["icu_los"] = (stays["outtime"] - stays["intime"]).dt.total_seconds() / 3600
    stays = stays[stays["subject_id"].isin(filtered_subjects)]
    stays = stays[stays["icu_los"] >= 30]

    merged = df.copy()
    for table in INPUT_FILES:
        feat = aggregate_feature_table(mimic_dir, table, filtered_subjects,
                                       stays, use_native=use_native,
                                       timing_sink=timing_sink)
        if feat is not None:
            # Collapse each table to ONE row per stay before merging.  The
            # reference left-joins every per-(stay, hour_bin) table onto the
            # 1-row-per-subject cohort and only collapses at the very end
            # with groupby(subject).mean() (00_data.py:373-386) — a
            # Cartesian product of PI_T bins_T rows per stay (up to 12^4;
            # the dominant cost of its multi-hour 00_data run, and ~100 GB
            # frames at MIMIC scale).  Because every value of one table is
            # repeated a UNIFORM number of times (the product of the other
            # tables' row counts for that stay), the final mean is exactly
            # the per-stay mean of each table independently, so collapsing
            # here is a pure performance transformation (float rounding
            # order aside).  Equivalence pinned by tests/test_data.py::
            # test_feature_merge_collapse_matches_cartesian.
            feat = feat.groupby(["subject_id", "hadm_id"],
                                as_index=False).mean()
            merged = merged.merge(feat, on=["subject_id", "hadm_id"], how="left")

    numeric_cols = merged.select_dtypes(include=[np.number]).columns
    categorical_cols = merged.select_dtypes(exclude=[np.number]).columns
    merged_num = merged.groupby("subject_id", as_index=False)[list(numeric_cols)].mean()
    merged_cat = merged.groupby("subject_id", as_index=False)[list(categorical_cols)].first()
    merged = merged_num.merge(merged_cat, on="subject_id", how="left")
    merged.to_csv(os.path.join(
        out_dir, "final_structured_with_feature_set_C_24h_2h_bins.csv"), index=False)
    return merged


def clean_and_chunk_texts(
    texts: List[str],
    use_native: Optional[bool] = None,
) -> tuple:
    """(cleaned_texts, chunk_lists) for a list of raw note blobs.

    Semantics of the pandas chain in :func:`build_unstructured` —
    newline/CR -> space, strip, lower, :func:`clean_note_text`,
    :func:`split_text_to_chunks` (reference 00_data.py:395-439).  When the
    native scanner (``native/fastnotes``) is available it handles ASCII
    documents in C++ with identical output (fuzzed in tests/test_native.py);
    pandas/Python is the fallback and the semantics oracle.
    """
    if use_native is not False:
        try:
            from fairmultimodal_tpu.data import native

            if native.notes_available():
                return native.clean_and_chunk_native(list(texts))
        except Exception:
            if use_native:
                raise
    cleaned = [
        clean_note_text(("" if t is None else str(t))
                        .replace("\n", " ").replace("\r", " ").strip().lower())
        for t in texts
    ]
    return cleaned, [split_text_to_chunks(t) for t in cleaned]


def chunk_lists_to_frame(chunk_lists: List[List[str]], index) -> pd.DataFrame:
    """``note_chunk_i`` columns from per-doc chunk lists.

    Matches the reference's ``apply(pd.Series)`` construction
    (00_data.py:431-436) — column order note_chunk_1..max, ``NaN`` pads,
    object dtype — without the per-row Series allocation.
    """
    max_c = max((len(c) for c in chunk_lists), default=0)
    data = {
        f"note_chunk_{i + 1}":
            [cl[i] if i < len(cl) else np.nan for cl in chunk_lists]
        for i in range(max_c)
    }
    return pd.DataFrame(data, index=index)


def build_unstructured(mimic_dir: str, out_dir: str,
                       use_native: Optional[bool] = None) -> pd.DataFrame:
    """First-stay notes -> cleaned text -> 512-token chunk columns
    (00_data.py:441-501)."""
    notes = _read(mimic_dir, "NOTEEVENTS.csv.gz",
                  usecols=["SUBJECT_ID", "HADM_ID", "CHARTDATE", "TEXT"])
    stays = _read(mimic_dir, "ICUSTAYS.csv.gz",
                  usecols=["SUBJECT_ID", "HADM_ID", "ICUSTAY_ID", "INTIME", "OUTTIME"])
    notes["CHARTDATE"] = pd.to_datetime(notes["CHARTDATE"], errors="coerce")
    stays["INTIME"] = pd.to_datetime(stays["INTIME"], errors="coerce")
    stays["OUTTIME"] = pd.to_datetime(stays["OUTTIME"], errors="coerce")
    notes = notes.rename(columns={"SUBJECT_ID": "subject_id", "HADM_ID": "hadm_id"})
    stays = stays.rename(columns={"SUBJECT_ID": "subject_id", "HADM_ID": "hadm_id"})

    first = stays.sort_values(by="INTIME").groupby("subject_id").first().reset_index()
    sel = notes[notes["hadm_id"].isin(first["hadm_id"])]
    adm = first[["subject_id", "hadm_id", "INTIME", "OUTTIME"]].rename(
        columns={"INTIME": "admission_time", "OUTTIME": "discharge_time"})
    merged = pd.merge(sel, adm, on=["subject_id", "hadm_id"], how="inner")
    merged = merged[(merged["CHARTDATE"] >= merged["admission_time"])
                    & (merged["CHARTDATE"] <= merged["discharge_time"])].copy()

    agg = merged.groupby(["subject_id", "hadm_id"]).agg(
        {"TEXT": lambda t: " ".join(t)}).reset_index()
    cleaned, chunk_lists = clean_and_chunk_texts(
        agg["TEXT"].fillna(" ").tolist(), use_native=use_native)
    agg["TEXT"] = cleaned
    agg = pd.concat(
        [agg, chunk_lists_to_frame(chunk_lists, agg.index)], axis=1)

    structured = pd.read_csv(os.path.join(out_dir, "final_structured_dataset.csv"))
    if "los_binary" not in structured.columns:
        structured["los_binary"] = (structured["icu_los"] > 168).astype(int)
    out = pd.merge(
        agg,
        structured[["subject_id", "short_term_mortality", "icu_los", "los_binary",
                    "mechanical_ventilation", "age", "age_bucket",
                    "ethnicity_category", "insurance_category", "gender"]],
        on="subject_id", how="left")
    out.to_csv(os.path.join(out_dir, "unstructured_with_demographics.csv"), index=False)
    return out


def run_etl(mimic_dir: str, out_dir: str, los_threshold_hours: float = 168.0,
            readmission_mode: str = "reference",
            use_native: Optional[bool] = None,
            timing: bool = False) -> dict:
    """Full pipeline; returns summary stats (the reference's print block,
    00_data.py:507-545, as a dict).

    ``use_native``: None = auto-select the C++ streaming aggregator/chunker
    when available, True = require it (raise if it cannot build), False =
    force the pandas path.  ``timing=True`` prints per-table path + rows/sec
    lines and adds a ``"timings"`` list to the returned stats.
    """
    import time as _time

    from fairmultimodal_tpu.data.validate import validate_mimic_dir

    validate_mimic_dir(mimic_dir)   # fail fast, naming file+column problems
    os.makedirs(out_dir, exist_ok=True)
    timing_sink: Optional[List[Dict]] = [] if timing else None
    t0 = _time.perf_counter()
    structured = build_structured(mimic_dir, out_dir, los_threshold_hours,
                                  readmission_mode=readmission_mode,
                                  use_native=use_native,
                                  timing_sink=timing_sink)
    t_struct = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    unstructured = build_unstructured(mimic_dir, out_dir,
                                      use_native=use_native)
    t_unstruct = _time.perf_counter() - t0
    if timing and timing_sink is not None:
        for e in timing_sink:
            rate = e["rows"] / e["seconds"] if e["seconds"] > 0 else 0.0
            print(f"[etl timing] {e['table']}: {e['path']} path, "
                  f"{e['rows']:,} rows in {e['seconds']:.2f} s "
                  f"({rate / 1e6:.2f}M rows/s)")
        print(f"[etl timing] structured phase: {t_struct:.1f} s, "
              f"unstructured phase: {t_unstruct:.1f} s")

    common = set(structured["subject_id"]).intersection(set(unstructured["subject_id"]))
    s_common = structured[structured["subject_id"].isin(common)].copy()
    u_common = unstructured[unstructured["subject_id"].isin(common)].copy()
    s_common.to_csv(os.path.join(out_dir, "final_structured_common.csv"), index=False)
    u_common.to_csv(os.path.join(out_dir, "final_unstructured_common.csv"), index=False)

    stats = {
        "structured_shape": structured.shape,
        "unstructured_shape": unstructured.shape,
        "n_common": len(common),
        "common_mortality_positives": int(s_common["short_term_mortality"].sum()),
        "common_los_positives": int(s_common["los_binary"].sum()),
        "common_vent_positives": int(s_common["mechanical_ventilation"].sum()),
    }
    if timing_sink is not None:
        stats["timings"] = timing_sink
    return stats
