"""Day-1 input validation: corrupted/missing raw tables and cohort frames
produce actionable errors naming the file and column, not deep pandas
tracebacks (round-5 hardening)."""

from __future__ import annotations

import gzip
import os

import numpy as np
import pandas as pd
import pytest

from fairmultimodal_tpu.data.synthetic import make_common_frames, write_raw_mimic
from fairmultimodal_tpu.data.validate import (MimicInputError,
                                              count_unmapped,
                                              validate_common_frames,
                                              validate_mimic_dir)


@pytest.fixture()
def raw_dir(tmp_path):
    d = tmp_path / "raw"
    write_raw_mimic(str(d), n_subjects=10, seed=0)
    return d


def test_valid_dir_passes(raw_dir):
    validate_mimic_dir(str(raw_dir))


def test_missing_required_table_named(raw_dir):
    os.remove(raw_dir / "ADMISSIONS.csv.gz")
    with pytest.raises(MimicInputError, match="ADMISSIONS.csv.gz.*missing"):
        validate_mimic_dir(str(raw_dir))


def test_missing_optional_table_ok(raw_dir):
    os.remove(raw_dir / "LABEVENTS.csv.gz")
    validate_mimic_dir(str(raw_dir))


def test_missing_column_named(raw_dir):
    df = pd.read_csv(raw_dir / "ICUSTAYS.csv.gz")
    df.drop(columns=["INTIME"]).to_csv(raw_dir / "ICUSTAYS.csv.gz",
                                       index=False, compression="gzip")
    with pytest.raises(MimicInputError,
                       match="ICUSTAYS.csv.gz.*missing column.*INTIME"):
        validate_mimic_dir(str(raw_dir))


def test_corrupt_gzip_named(raw_dir):
    with open(raw_dir / "PATIENTS.csv.gz", "wb") as f:
        f.write(b"this is not gzip data")
    with pytest.raises(MimicInputError, match="PATIENTS.csv.gz"):
        validate_mimic_dir(str(raw_dir))


def test_not_a_directory():
    with pytest.raises(MimicInputError, match="not a directory"):
        validate_mimic_dir("/nonexistent/raw_mimic")


def test_run_etl_fails_fast_on_bad_dir(tmp_path):
    """run_etl pre-flights before any heavy work: a missing required table
    raises the named error, not a pandas traceback minutes in."""
    from fairmultimodal_tpu.data.etl import run_etl

    d = tmp_path / "raw"
    write_raw_mimic(str(d), n_subjects=8, seed=1)
    os.remove(d / "NOTEEVENTS.csv.gz")
    with pytest.raises(MimicInputError, match="NOTEEVENTS.csv.gz"):
        run_etl(str(d), str(tmp_path / "out"))


def test_common_frames_validation():
    s, u = make_common_frames(n_patients=30, n_lab_features=4, seed=2)
    validate_common_frames(s, u)    # clean tables pass

    with pytest.raises(MimicInputError, match="missing label column "
                                              "'los_binary'"):
        validate_common_frames(s.drop(columns=["los_binary"]), u)

    with pytest.raises(MimicInputError, match="merge key 'hadm_id'"):
        validate_common_frames(s, u.drop(columns=["hadm_id"]))

    s2 = s.copy()
    s2.loc[s2.index[:3], "short_term_mortality"] = np.nan
    with pytest.raises(MimicInputError, match="3 NaN rows"):
        validate_common_frames(s2, u)

    u2 = u.drop(columns=[c for c in u.columns if c.startswith("note_")])
    with pytest.raises(MimicInputError, match="note_"):
        validate_common_frames(s, u2)


def test_assemble_features_uses_validation():
    from fairmultimodal_tpu.data.featurize import assemble_features

    s, u = make_common_frames(n_patients=30, n_lab_features=4, seed=3)
    with pytest.raises(MimicInputError, match="mechanical_ventilation"):
        assemble_features(s.drop(columns=["mechanical_ventilation"]), u)


def test_count_unmapped():
    raw = pd.Series(["WHITE", "KLINGON", "OTHER", "MARTIAN"])
    mapped = pd.Series(["White", "Other", "Other", "Other"])
    # KLINGON and MARTIAN fell through; literal OTHER did not.
    assert count_unmapped(raw, mapped, "Other") == 2


def test_etl_reports_unmapped_categories(tmp_path, capsys):
    """Unexpected category strings route to the catch-all WITH a printed
    count (00_data.py:22-47 semantics, made visible)."""
    from fairmultimodal_tpu.data.etl import run_etl

    d = tmp_path / "raw"
    write_raw_mimic(str(d), n_subjects=12, seed=4)
    adm = pd.read_csv(d / "ADMISSIONS.csv.gz")
    adm.loc[adm.index[:5], "ETHNICITY"] = "UNSEEN CATEGORY X"
    adm.to_csv(d / "ADMISSIONS.csv.gz", index=False, compression="gzip")
    run_etl(str(d), str(tmp_path / "out"))
    out = capsys.readouterr().out
    assert "unmapped ETHNICITY routed to 'Other'" in out
