"""Synthetic MIMIC-shaped data for tests and CPU smoke runs.

Two levels:

- :func:`make_common_frames` fabricates the two cohort tables the training
  scripts consume (``final_structured_common.csv`` /
  ``final_unstructured_common.csv`` column shapes, ``00_data.py:535-536``)
  with learnable label structure, so end-to-end training tests can assert
  AUROC > chance on CPU in seconds.
- :func:`write_raw_mimic` fabricates tiny gzipped raw MIMIC-III tables
  (ADMISSIONS, PATIENTS, ICUSTAYS, CHARTEVENTS, LABEVENTS, NOTEEVENTS, ...)
  so the ETL (``fairmultimodal_tpu.data.etl``) can be golden-tested without
  PHI-bearing source data.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
import pandas as pd

__all__ = ["make_common_frames", "write_raw_mimic", "write_raw_mimic_scaled"]

_ETHNICITIES = [
    "WHITE", "BLACK/AFRICAN AMERICAN", "HISPANIC OR LATINO", "ASIAN",
    "WHITE - RUSSIAN", "OTHER", "UNKNOWN/NOT SPECIFIED",
]
_INSURANCES = ["Medicare", "Private", "Medicaid", "Self Pay", "Government"]
_WORDS = (
    "patient stable intubated sedated ventilator weaning afebrile lungs clear "
    "bilateral infiltrates sepsis pressors lasix cardiac failure renal improving "
    "deteriorating family meeting comfort care extubated alert oriented pain "
    "controlled discharge planning"
).split()


def make_common_frames(
    n_patients: int = 240,
    n_lab_features: int = 32,
    n_note_chunks: int = 3,
    seed: int = 0,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Fabricate (structured_common, unstructured_common) DataFrames.

    Labels are generated from a linear signal over a few lab columns plus a
    demographic-correlated noise term, so models trained on this data reach
    AUROC well above 0.5 — the end-to-end smoke tests assert that.
    """
    rng = np.random.default_rng(seed)
    subject_id = np.arange(10_000, 10_000 + n_patients)
    hadm_id = subject_id + 50_000

    age = rng.integers(15, 91, n_patients)
    gender = rng.choice(["M", "F"], n_patients)
    ethnicity = rng.choice(_ETHNICITIES, n_patients)
    insurance = rng.choice(_INSURANCES, n_patients)

    labs = rng.normal(0, 1, (n_patients, n_lab_features)).astype(np.float32)
    # Learnable signal on the first few lab columns, plus a modest age
    # gradient on mortality/los so demographics-only branches (legacy
    # sequence-BEHRT, demo encoders) are separable too — real ICU outcomes
    # correlate with age.
    w = np.zeros(n_lab_features)
    w[:4] = [1.5, -1.2, 0.9, 0.7]
    age_sig = 0.03 * (age - 52.0)
    logit_mort = labs @ w - 1.2 + age_sig + 0.3 * rng.normal(size=n_patients)
    logit_los = labs @ np.roll(w, 4) - 0.4 + age_sig + 0.3 * rng.normal(size=n_patients)
    logit_vent = labs @ np.roll(w, 8) + 0.8 + 0.3 * rng.normal(size=n_patients)
    mort = (1 / (1 + np.exp(-logit_mort)) > 0.5).astype(int)
    los = (1 / (1 + np.exp(-logit_los)) > 0.5).astype(int)
    vent = (1 / (1 + np.exp(-logit_vent)) > 0.5).astype(int)
    # Legacy-era label (mortality+readmission generation, SURVEY §2.4).
    logit_readm = labs @ np.roll(w, 2) - 0.9 + 0.3 * rng.normal(size=n_patients)
    readm = (1 / (1 + np.exp(-logit_readm)) > 0.5).astype(int)

    lab_cols = {f"lab_t{50800 + i}": labs[:, i] for i in range(n_lab_features)}
    structured = pd.DataFrame({
        "subject_id": subject_id,
        "hadm_id": hadm_id,
        "age": age,
        "GENDER": gender,
        "ETHNICITY": ethnicity,
        "INSURANCE": insurance,
        "gender": np.where(gender == "M", "male", "female"),
        "ethnicity_category": ethnicity,
        "insurance_category": insurance,
        "age_bucket": pd.cut(age, [14, 29, 49, 69, 89, 200],
                             labels=["15-29", "30-49", "50-69", "70-89", "Other"]).astype(str),
        "icu_los": rng.uniform(20, 400, n_patients),
        "short_term_mortality": mort,
        "los_binary": los,
        "mechanical_ventilation": vent,
        "readmission_within_30d": readm,
        **lab_cols,
    })

    note_cols = {}
    for k in range(n_note_chunks):
        texts = []
        for i in range(n_patients):
            if k > 0 and rng.random() < 0.4:
                texts.append(np.nan)  # ragged chunk counts
                continue
            n_words = rng.integers(8, 40)
            words = list(rng.choice(_WORDS, n_words))
            # Weak per-task text markers (real ICU notes carry outcome signal
            # — the reference's text-only AUROC is ~0.89; these make the
            # text-branch models learnably-separable so e2e tests can assert
            # AUROC, not just finiteness).
            if vent[i] and rng.random() < 0.8:
                words += ["intubated", "ventilator"]
            if mort[i] and rng.random() < 0.8:
                words += ["unresponsive", "expired"]
            if los[i] and rng.random() < 0.8:
                words += ["prolonged", "tracheostomy"]
            texts.append(" ".join(words))
        note_cols[f"note_chunk_{k + 1}"] = texts
    # A handful of patients with no notes at all (zero-vector path,
    # 10_FAME.py:153-154).
    for i in range(0, n_patients, 37):
        for k in range(n_note_chunks):
            note_cols[f"note_chunk_{k + 1}"][i] = np.nan

    unstructured = pd.DataFrame({
        "subject_id": subject_id,
        "hadm_id": hadm_id,
        "short_term_mortality": mort,
        "los_binary": los,
        "mechanical_ventilation": vent,
        "age": age,
        **note_cols,
    })
    return structured, unstructured


def make_admission_frame(
    n_subjects: int = 80,
    max_admissions: int = 4,
    seed: int = 0,
) -> pd.DataFrame:
    """Synthetic multi-admission structured frame for the legacy sequence
    BEHRT (FinalCode/New/02_BEHRT.py): one row per admission with the
    columns its data prep consumes — ADMITTIME/DISCHTIME/DEATHTIME,
    FIRST_WARDID/LAST_WARDID, demographics, and the three task labels.
    Labels carry a weak signal through the ward ids so the tiny e2e test can
    assert learning.
    """
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2150-01-01")
    rows = []
    hadm_counter = 90_000
    for s in range(n_subjects):
        sid = 20_000 + s
        n_adm = int(rng.integers(1, max_admissions + 1))
        age = int(rng.integers(15, 90))
        gender = str(rng.choice(["M", "F"]))
        eth = str(rng.choice(_ETHNICITIES))
        ins = str(rng.choice(_INSURANCES))
        risk = float(rng.normal())
        for a in range(n_adm):
            hadm_counter += 1
            admit = base + pd.Timedelta(days=int(rng.integers(0, 900)) + 30 * a)
            disch = admit + pd.Timedelta(hours=float(rng.uniform(10, 300)))
            ward = int(rng.integers(1, 20))
            mort = int(risk + 0.15 * ward / 10 + rng.normal(0, 0.6) > 1.0)
            rows.append({
                "subject_id": sid, "hadm_id": hadm_counter,
                "ADMITTIME": admit, "DISCHTIME": disch,
                "DEATHTIME": disch + pd.Timedelta(days=1) if mort else pd.NaT,
                "FIRST_WARDID": ward, "LAST_WARDID": int(rng.integers(1, 20)),
                "age": age, "GENDER": gender, "ETHNICITY": eth,
                "INSURANCE": ins,
                "short_term_mortality": mort,
                "los_binary": int(risk + rng.normal(0, 0.6) > 0.3),
                "mechanical_ventilation": int(-risk + rng.normal(0, 0.6) > -0.4),
            })
    return pd.DataFrame(rows)


def write_raw_mimic(out_dir: str, n_subjects: int = 40, seed: int = 0) -> None:
    """Write tiny gzipped raw MIMIC-III-shaped tables into ``out_dir``.

    Column names and dtypes match what ``data/etl.py`` (and the reference
    ``00_data.py``) read; values are synthetic.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    sid = np.arange(1, n_subjects + 1)
    hadm = sid + 1000
    icustay = sid + 2000

    base = pd.Timestamp("2150-01-01")
    intime = [base + pd.Timedelta(days=int(d)) for d in rng.integers(0, 300, n_subjects)]
    los_h = rng.uniform(26, 400, n_subjects)
    outtime = [t + pd.Timedelta(hours=float(h)) for t, h in zip(intime, los_h)]
    dob = [t - pd.Timedelta(days=int(365.25 * a))
           for t, a in zip(intime, rng.integers(10, 95, n_subjects))]
    death = [t + pd.Timedelta(days=2) if rng.random() < 0.2 else pd.NaT for t in outtime]
    # Push a deterministic subset of deaths past the 30-day window so the
    # earliest-era mortality label (death <= 30 d post discharge,
    # Code/1_preprocessing_structured.py:24-26) diverges from the Final
    # era's DEATHTIME-non-null on this fixture.
    death_rows = [i for i, d in enumerate(death) if pd.notnull(d)]
    for j, i in enumerate(death_rows):
        if j % 2 == 1:
            death[i] = death[i] + pd.Timedelta(days=43)

    adm = pd.DataFrame({
        "SUBJECT_ID": sid, "HADM_ID": hadm,
        "ADMITTIME": intime, "DISCHTIME": outtime, "DEATHTIME": death,
        "ETHNICITY": rng.choice(_ETHNICITIES, n_subjects),
        "INSURANCE": rng.choice(_INSURANCES, n_subjects),
    })
    # Prior admissions (no ICU stay) for a third of subjects, with admit-to-
    # admit gaps on both sides of 30 days, so the reference readmission
    # formula (ADMITTIME diff <= 30 d flagged on the later stay,
    # Code/1_preprocessing_structured.py:27-28) takes both values on this
    # fixture.  A separate rng stream keeps every pre-existing draw (and
    # thus every other column/golden) unchanged.
    rng2 = np.random.default_rng(seed + 987)
    extra = []
    for i in range(0, n_subjects, 3):
        gap_days = float(rng2.choice([12.0, 45.0])) + float(rng2.uniform(0, 5))
        prior_admit = intime[i] - pd.Timedelta(days=gap_days)
        extra.append({
            "SUBJECT_ID": sid[i], "HADM_ID": 900_000 + i,
            "ADMITTIME": prior_admit,
            "DISCHTIME": prior_admit + pd.Timedelta(days=2.0),
            "DEATHTIME": pd.NaT,
            "ETHNICITY": str(rng2.choice(_ETHNICITIES)),
            "INSURANCE": str(rng2.choice(_INSURANCES)),
        })
    adm = pd.concat([adm, pd.DataFrame(extra)], ignore_index=True)
    adm.to_csv(f"{out_dir}/ADMISSIONS.csv.gz", index=False, compression="gzip")

    pd.DataFrame({
        "SUBJECT_ID": sid, "GENDER": rng.choice(["M", "F"], n_subjects), "DOB": dob,
    }).to_csv(f"{out_dir}/PATIENTS.csv.gz", index=False, compression="gzip")

    pd.DataFrame({
        "SUBJECT_ID": sid, "HADM_ID": hadm, "ICUSTAY_ID": icustay,
        "INTIME": intime, "OUTTIME": outtime,
    }).to_csv(f"{out_dir}/ICUSTAYS.csv.gz", index=False, compression="gzip")

    # CHARTEVENTS: mix of vent itemids and feature-set-C itemids.
    rows = []
    for i in range(n_subjects):
        for _ in range(rng.integers(3, 10)):
            itemid = int(rng.choice([223849, 467, 220045, 220210, 618, 646]))
            rows.append({
                "ICUSTAY_ID": icustay[i],
                "CHARTTIME": intime[i] + pd.Timedelta(hours=float(rng.uniform(0, 23))),
                "ITEMID": itemid,
                "VALUE": "Ventilator" if itemid == 467 else f"{rng.uniform(40, 180):.1f}",
                "VALUENUM": rng.uniform(40, 180),
                "ERROR": 0,
                "SUBJECT_ID": sid[i], "HADM_ID": hadm[i],
            })
    pd.DataFrame(rows).to_csv(f"{out_dir}/CHARTEVENTS.csv.gz", index=False, compression="gzip")

    rows = []
    for i in range(n_subjects):
        for _ in range(rng.integers(4, 12)):
            rows.append({
                "SUBJECT_ID": sid[i], "HADM_ID": hadm[i],
                "CHARTTIME": intime[i] + pd.Timedelta(hours=float(rng.uniform(0, 23))),
                "ITEMID": int(rng.choice([51221, 50912, 50868, 51265])),
                "VALUENUM": rng.uniform(0.5, 40),
            })
    pd.DataFrame(rows).to_csv(f"{out_dir}/LABEVENTS.csv.gz", index=False, compression="gzip")

    for name, items, col in [
        ("inputevents_cv", [30008, 30023], "AMOUNT"),
        ("inputevents_mv", [220864, 225154], "AMOUNT"),
    ]:
        rows = []
        for i in range(n_subjects):
            for _ in range(rng.integers(1, 5)):
                rows.append({
                    "SUBJECT_ID": sid[i], "HADM_ID": hadm[i],
                    "STARTTIME": intime[i] + pd.Timedelta(hours=float(rng.uniform(0, 23))),
                    "ITEMID": int(rng.choice(items)),
                    col: rng.uniform(1, 500),
                })
        pd.DataFrame(rows).to_csv(f"{out_dir}/{name}.csv.gz", index=False, compression="gzip")

    rows = []
    for i in range(n_subjects):
        rows.append({
            "SUBJECT_ID": sid[i], "HADM_ID": hadm[i],
            "CHARTTIME": intime[i] + pd.Timedelta(hours=2.0),
            "ITEMID": 226573, "VALUE": rng.uniform(10, 400),
        })
    pd.DataFrame(rows).to_csv(f"{out_dir}/OUTPUTEVENTS.csv.gz", index=False, compression="gzip")

    rows = []
    for i in range(n_subjects):
        rows.append({
            "SUBJECT_ID": sid[i], "HADM_ID": hadm[i],
            "STARTDATE": intime[i], "DRUG": str(rng.choice(["Aspirin", "Metoprolol", "Bisacodyl"])),
        })
    pd.DataFrame(rows).to_csv(f"{out_dir}/PRESCRIPTIONS.csv.gz", index=False, compression="gzip")

    rows = []
    for i in range(0, n_subjects, 3):
        rows.append({
            "ICUSTAY_ID": icustay[i],
            "STARTTIME": intime[i] + pd.Timedelta(hours=30.0),
            "ITEMID": int(rng.choice([227194, 225468, 225477])),
        })
    pd.DataFrame(rows).to_csv(f"{out_dir}/PROCEDUREEVENTS_MV.csv.gz", index=False, compression="gzip")

    rows = []
    for i in range(n_subjects):
        if rng.random() < 0.9:
            n_words = int(rng.integers(20, 1200))
            rows.append({
                "SUBJECT_ID": sid[i], "HADM_ID": hadm[i],
                "CHARTDATE": (intime[i] + pd.Timedelta(days=1)).normalize(),
                "TEXT": " ".join(rng.choice(_WORDS, n_words)) + " Dr. Smith [**Name**] 1. item",
            })
    pd.DataFrame(rows).to_csv(f"{out_dir}/NOTEEVENTS.csv.gz", index=False, compression="gzip")


def _epoch_to_str(seconds: np.ndarray) -> np.ndarray:
    """Vectorized 'YYYY-MM-DDTHH:MM:SS' strings from epoch seconds (both the
    pandas and native ETL timestamp parsers accept the 'T' separator)."""
    return np.asarray(seconds, "datetime64[s]").astype(str)


def write_raw_mimic_scaled(
    out_dir: str,
    n_subjects: int = 3000,
    chartevents_rows: int = 20_000_000,
    seed: int = 0,
    chunk_rows: int = 2_000_000,
    verbose: bool = True,
) -> dict:
    """Realistic-VOLUME raw MIMIC-III tables for ETL throughput benchmarking.

    The reference's dominant cost is the 00_data full scans (270M-row
    CHARTEVENTS with a per-row ``apply``, ``00_data.py:129``); this writer
    reproduces that shape at configurable scale: ``chartevents_rows`` events
    over ``n_subjects`` first-ICU-stay subjects (real MIMIC density is
    ~7k events/subject), LABEVENTS at 1/8 the rows, input/output events at
    1/40, one long clinical note per subject.  Event tables are generated
    vectorized and streamed to ``csv.gz`` in ``chunk_rows`` chunks so peak
    memory stays bounded regardless of target size.  Itemid mix: ~70%
    feature-set-C chartevents ids, ~10% vent-flag ids (string VALUE), ~20%
    non-whitelisted ids; ~2% ERROR=1 rows and timestamps U(0, 48h) past
    INTIME so the 24-h window, whitelist and error filters all do real work.

    Returns a dict of row counts per table.  Used by ``scripts/bench_etl.py``.
    """
    import gzip

    from fairmultimodal_tpu.data.etl import FEATURE_SET_C, VENT_ITEMIDS

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    sid = np.arange(1, n_subjects + 1, dtype=np.int64)
    hadm = sid + 1_000_000
    icustay = sid + 2_000_000

    base_s = int(pd.Timestamp("2150-01-01").timestamp())
    intime_s = base_s + rng.integers(0, 300 * 86400, n_subjects)
    los_h = rng.uniform(26, 400, n_subjects)
    outtime_s = intime_s + (los_h * 3600).astype(np.int64)
    age_years = rng.integers(10, 95, n_subjects)
    dob_s = intime_s - (age_years * 365.25 * 86400).astype(np.int64)
    died = rng.random(n_subjects) < 0.2
    death_str = np.where(died, _epoch_to_str(outtime_s + 2 * 86400), "")

    pd.DataFrame({
        "SUBJECT_ID": sid, "HADM_ID": hadm,
        "ADMITTIME": _epoch_to_str(intime_s),
        "DISCHTIME": _epoch_to_str(outtime_s),
        "DEATHTIME": death_str,
        "ETHNICITY": rng.choice(_ETHNICITIES, n_subjects),
        "INSURANCE": rng.choice(_INSURANCES, n_subjects),
    }).to_csv(f"{out_dir}/ADMISSIONS.csv.gz", index=False, compression="gzip")
    pd.DataFrame({
        "SUBJECT_ID": sid, "GENDER": rng.choice(["M", "F"], n_subjects),
        "DOB": _epoch_to_str(dob_s),
    }).to_csv(f"{out_dir}/PATIENTS.csv.gz", index=False, compression="gzip")
    pd.DataFrame({
        "SUBJECT_ID": sid, "HADM_ID": hadm, "ICUSTAY_ID": icustay,
        "INTIME": _epoch_to_str(intime_s), "OUTTIME": _epoch_to_str(outtime_s),
    }).to_csv(f"{out_dir}/ICUSTAYS.csv.gz", index=False, compression="gzip")

    counts = {"ADMISSIONS": n_subjects, "PATIENTS": n_subjects,
              "ICUSTAYS": n_subjects}

    feat_items = np.asarray(sorted(set(FEATURE_SET_C["chartevents"])), np.int64)
    vent_items = np.asarray([223849, 467, 720, 445, 218], np.int64)
    other_items = np.asarray([999001, 999002, 999003], np.int64)

    def stream_events(name, total, make_chunk):
        written = 0
        with gzip.open(f"{out_dir}/{name}", "wt", compresslevel=1) as f:
            first = True
            while written < total:
                n = min(chunk_rows, total - written)
                make_chunk(n).to_csv(f, header=first, index=False)
                first = False
                written += n
                if verbose:
                    print(f"  {name}: {written:,}/{total:,} rows",
                          flush=True)
        return total

    def chartevents_chunk(n):
        subj_idx = rng.integers(0, n_subjects, n)
        kind = rng.random(n)
        items = np.where(
            kind < 0.70, feat_items[rng.integers(0, len(feat_items), n)],
            np.where(kind < 0.80,
                     vent_items[rng.integers(0, len(vent_items), n)],
                     other_items[rng.integers(0, len(other_items), n)]))
        t = intime_s[subj_idx] + rng.integers(0, 48 * 3600, n)
        vals = rng.uniform(40, 180, n).round(1).astype(str)
        vals = np.where(items == 467, "Ventilator", vals)
        vals = np.where(items == 223849, "CMV", vals)
        return pd.DataFrame({
            "SUBJECT_ID": sid[subj_idx], "HADM_ID": hadm[subj_idx],
            "ICUSTAY_ID": icustay[subj_idx],
            "CHARTTIME": _epoch_to_str(t), "ITEMID": items,
            "VALUE": vals, "VALUENUM": rng.uniform(40, 180, n).round(1),
            "ERROR": (rng.random(n) < 0.02).astype(int),
        })

    counts["CHARTEVENTS"] = stream_events(
        "CHARTEVENTS.csv.gz", chartevents_rows, chartevents_chunk)

    lab_items = np.asarray(sorted(set(FEATURE_SET_C["labevents"])), np.int64)

    def labevents_chunk(n):
        subj_idx = rng.integers(0, n_subjects, n)
        t = intime_s[subj_idx] + rng.integers(0, 48 * 3600, n)
        return pd.DataFrame({
            "SUBJECT_ID": sid[subj_idx], "HADM_ID": hadm[subj_idx],
            "CHARTTIME": _epoch_to_str(t),
            "ITEMID": lab_items[rng.integers(0, len(lab_items), n)],
            "VALUENUM": rng.uniform(0.5, 40, n).round(2),
        })

    counts["LABEVENTS"] = stream_events(
        "LABEVENTS.csv.gz", max(chartevents_rows // 8, 1), labevents_chunk)

    def io_chunk_factory(items, time_col, value_col):
        items = np.asarray(items, np.int64)

        def make(n):
            subj_idx = rng.integers(0, n_subjects, n)
            t = intime_s[subj_idx] + rng.integers(0, 48 * 3600, n)
            return pd.DataFrame({
                "SUBJECT_ID": sid[subj_idx], "HADM_ID": hadm[subj_idx],
                time_col: _epoch_to_str(t),
                "ITEMID": items[rng.integers(0, len(items), n)],
                value_col: rng.uniform(1, 500, n).round(1),
            })
        return make

    io_rows = max(chartevents_rows // 40, 1)
    counts["inputevents_cv"] = stream_events(
        "inputevents_cv.csv.gz", io_rows,
        io_chunk_factory(FEATURE_SET_C["inputevents"][:24], "STARTTIME",
                         "AMOUNT"))
    counts["inputevents_mv"] = stream_events(
        "inputevents_mv.csv.gz", io_rows,
        io_chunk_factory(FEATURE_SET_C["inputevents"][24:], "STARTTIME",
                         "AMOUNT"))
    counts["OUTPUTEVENTS"] = stream_events(
        "OUTPUTEVENTS.csv.gz", io_rows,
        io_chunk_factory(FEATURE_SET_C["outputevents"], "CHARTTIME", "VALUE"))

    pd.DataFrame({
        "SUBJECT_ID": sid, "HADM_ID": hadm,
        "STARTDATE": _epoch_to_str(intime_s),
        "DRUG": rng.choice(["Aspirin", "Metoprolol", "Bisacodyl"], n_subjects),
    }).to_csv(f"{out_dir}/PRESCRIPTIONS.csv.gz", index=False,
              compression="gzip")
    pe_idx = np.arange(0, n_subjects, 3)
    pd.DataFrame({
        "ICUSTAY_ID": icustay[pe_idx],
        "STARTTIME": _epoch_to_str(intime_s[pe_idx] + 30 * 3600),
        "ITEMID": rng.choice([227194, 225468, 225477], len(pe_idx)),
    }).to_csv(f"{out_dir}/PROCEDUREEVENTS_MV.csv.gz", index=False,
              compression="gzip")
    counts["PRESCRIPTIONS"] = n_subjects
    counts["PROCEDUREEVENTS_MV"] = len(pe_idx)

    # One long note per subject (real ICU discharge summaries run thousands
    # of words; exercises the native cleaner/chunker at volume too).
    n_words = rng.integers(200, 2000, n_subjects)
    notes = [" ".join(rng.choice(_WORDS, k)) + " Dr. Smith [**Name**] 1. item"
             for k in n_words]
    pd.DataFrame({
        "SUBJECT_ID": sid, "HADM_ID": hadm,
        "CHARTDATE": _epoch_to_str(((intime_s + 86400) // 86400) * 86400),
        "TEXT": notes,
    }).to_csv(f"{out_dir}/NOTEEVENTS.csv.gz", index=False, compression="gzip")
    counts["NOTEEVENTS"] = n_subjects
    return counts
