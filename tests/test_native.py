"""Native (C++) ETL aggregator parity vs a pandas reference implementation.

Builds ``native/libfastetl.so`` on demand (g++ + zlib, always present in the
toolchain); skips cleanly if the build is impossible.
"""

import gzip
import os

import numpy as np
import pandas as pd
import pytest

from fairmultimodal_tpu.data import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native fastetl library unavailable")
    return True


def _write_events(path, rng, stays, n_rows=500, quoted=False):
    rows = []
    base = pd.Timestamp("2150-01-01")
    for _ in range(n_rows):
        i = rng.integers(0, len(stays))
        subj, hadm, intime = stays[i]
        dt = float(rng.uniform(-5, 40))          # some rows out of window
        t = intime + pd.Timedelta(hours=dt)
        itemid = int(rng.choice([100, 200, 300, 400]))
        val = float(rng.uniform(0, 50))
        raw = f"{val:.4f}"
        if rng.random() < 0.05:
            raw = "Ventilator"                   # non-numeric -> skipped
        rows.append({"SUBJECT_ID": subj, "HADM_ID": hadm,
                     "CHARTTIME": t.strftime("%Y-%m-%d %H:%M:%S"),
                     "ITEMID": itemid,
                     "VALUE": f'"{raw}"' if quoted else raw})
    df = pd.DataFrame(rows)
    with gzip.open(path, "wt") as f:
        f.write(",".join(df.columns) + "\n")
        for _, r in df.iterrows():
            f.write(",".join(str(v) for v in r.values) + "\n")
    return df


def _pandas_reference(df, stays, itemids, agg):
    base = pd.Timestamp("1970-01-01")
    stay_df = pd.DataFrame(
        [{"subject_id": s, "hadm_id": h,
          "intime_epoch": (t - base).total_seconds()} for s, h, t in stays])
    d = df.copy()
    d.columns = [c.lower() for c in d.columns]
    d["value"] = pd.to_numeric(d["value"].astype(str).str.strip('"'),
                               errors="coerce")
    # NaN values stay as rows (etl.py coerces then groups without dropna):
    # all-NaN groups give sum 0.0 / mean NaN.  The merge duplicates each
    # event once per matching ICU stay (etl.py:383-386).
    d = d.merge(stay_df, on=["subject_id", "hadm_id"])
    t = pd.to_datetime(d["charttime"])
    d["hours"] = ((t - base).dt.total_seconds() - d["intime_epoch"]) / 3600.0
    d = d[d["hours"].between(0, 24)]
    if itemids is not None:
        d = d[d["itemid"].isin(itemids)]
    d["bin"] = (d["hours"] // 2).astype(int)
    g = d.groupby(["subject_id", "hadm_id", "bin", "itemid"])["value"]
    out = (g.sum() if agg == "sum" else g.mean()).reset_index()
    return out.sort_values(["subject_id", "hadm_id", "bin", "itemid"])


@pytest.mark.parametrize("agg", ["mean", "sum"])
@pytest.mark.parametrize("quoted", [False, True])
def test_aggregate_parity(tmp_path, lib_ok, agg, quoted):
    rng = np.random.default_rng(1 if quoted else 0)
    base = pd.Timestamp("2150-01-01")
    stays = [(1000 + i, 5000 + i,
              base + pd.Timedelta(days=int(rng.integers(0, 50))))
             for i in range(12)]
    path = str(tmp_path / f"events_{agg}_{quoted}.csv.gz")
    df = _write_events(path, rng, stays, quoted=quoted)

    epoch = pd.Timestamp("1970-01-01")
    subj = np.array([s for s, _, _ in stays], np.int64)
    hadm = np.array([h for _, h, _ in stays], np.int64)
    intime = np.array([(t - epoch).total_seconds() for _, _, t in stays])
    itemids = np.array([100, 200, 300], np.int64)       # drop 400

    (o_subj, o_hadm, o_bin, o_item, o_val,
     rows_scanned) = native.aggregate_events_native(
        path, subj, hadm, intime, itemids, window_hours=24.0, bin_hours=2.0,
        agg=agg)
    ref = _pandas_reference(df, stays, set(itemids.tolist()), agg)

    assert rows_scanned == len(df)
    assert len(o_subj) == len(ref), (len(o_subj), len(ref))
    np.testing.assert_array_equal(o_subj, ref["subject_id"].to_numpy())
    np.testing.assert_array_equal(o_hadm, ref["hadm_id"].to_numpy())
    np.testing.assert_array_equal(o_bin, ref["bin"].to_numpy())
    np.testing.assert_array_equal(o_item, ref["itemid"].to_numpy())
    np.testing.assert_allclose(o_val, ref["value"].to_numpy(), rtol=1e-10)


@pytest.mark.parametrize("agg", ["mean", "sum"])
def test_multi_stay_admission_parity(tmp_path, lib_ok, agg):
    """An admission with several ICU stays joins each event against EVERY
    stay (different intimes -> different hour bins; sum tables double-count),
    exactly like the pandas inner merge.  Also covers all-unparseable groups
    (sum -> 0.0, mean -> NaN)."""
    rng = np.random.default_rng(7)
    base = pd.Timestamp("2150-01-01")
    # Subject 1/hadm 10 has THREE stays, 6h and 30h apart; plus two
    # single-stay admissions.
    stays = [(1, 10, base),
             (1, 10, base + pd.Timedelta(hours=6)),
             (1, 10, base + pd.Timedelta(hours=30)),
             (2, 20, base + pd.Timedelta(days=2)),
             (3, 30, base + pd.Timedelta(days=5))]
    path = str(tmp_path / f"multi_{agg}.csv.gz")
    df = _write_events(path, rng, stays, n_rows=400)
    # Force one group whose only value is unparseable.
    extra = pd.DataFrame([{
        "SUBJECT_ID": 3, "HADM_ID": 30,
        "CHARTTIME": (base + pd.Timedelta(days=5, hours=1)
                      ).strftime("%Y-%m-%d %H:%M:%S"),
        "ITEMID": 100, "VALUE": "NotANumber"}])
    df = pd.concat([df, extra], ignore_index=True)
    with gzip.open(path, "wt") as f:
        f.write(",".join(df.columns) + "\n")
        for _, r in df.iterrows():
            f.write(",".join(str(v) for v in r.values) + "\n")

    epoch = pd.Timestamp("1970-01-01")
    subj = np.array([s for s, _, _ in stays], np.int64)
    hadm = np.array([h for _, h, _ in stays], np.int64)
    intime = np.array([(t - epoch).total_seconds() for _, _, t in stays])
    itemids = np.array([100, 200, 300, 400], np.int64)

    (o_subj, o_hadm, o_bin, o_item, o_val,
     _rows) = native.aggregate_events_native(
        path, subj, hadm, intime, itemids, window_hours=24.0, bin_hours=2.0,
        agg=agg)
    ref = _pandas_reference(df, stays, set(itemids.tolist()), agg)

    assert len(o_subj) == len(ref), (len(o_subj), len(ref))
    np.testing.assert_array_equal(o_subj, ref["subject_id"].to_numpy())
    np.testing.assert_array_equal(o_bin, ref["bin"].to_numpy())
    np.testing.assert_array_equal(o_item, ref["itemid"].to_numpy())
    np.testing.assert_allclose(o_val, ref["value"].to_numpy(), rtol=1e-10)
    # The multi-stay admission must contribute more aggregate rows than a
    # dedup-to-first-stay implementation would produce.
    first_only = _pandas_reference(df, stays[:1] + stays[3:], set(itemids), agg)
    assert len(ref) > len(first_only)


def test_no_itemid_filter(tmp_path, lib_ok):
    rng = np.random.default_rng(2)
    base = pd.Timestamp("2150-01-01")
    stays = [(1, 10, base), (2, 20, base + pd.Timedelta(days=3))]
    path = str(tmp_path / "events.csv.gz")
    df = _write_events(path, rng, stays, n_rows=100)
    epoch = pd.Timestamp("1970-01-01")
    subj = np.array([s for s, _, _ in stays], np.int64)
    hadm = np.array([h for _, h, _ in stays], np.int64)
    intime = np.array([(t - epoch).total_seconds() for _, _, t in stays])
    o = native.aggregate_events_native(path, subj, hadm, intime, None)
    ref = _pandas_reference(df, stays, None, "mean")
    assert len(o[0]) == len(ref)
    np.testing.assert_allclose(o[4], ref["value"].to_numpy(), rtol=1e-10)


def test_missing_file_raises(lib_ok):
    with pytest.raises(RuntimeError, match="cannot open"):
        native.aggregate_events_native(
            "/nonexistent/file.csv.gz", np.zeros(1, np.int64),
            np.zeros(1, np.int64), np.zeros(1))


def test_aggregate_feature_table_native_matches_pandas(tmp_path, lib_ok):
    """The full ETL helper must produce the same wide frame through the
    native path and the pandas path."""
    import pandas as pd

    from fairmultimodal_tpu.data import etl
    from fairmultimodal_tpu.data.synthetic import write_raw_mimic

    raw = str(tmp_path / "raw")
    write_raw_mimic(raw, n_subjects=25, seed=9)

    stays = pd.read_csv(f"{raw}/ICUSTAYS.csv.gz")
    stays.columns = [c.lower() for c in stays.columns]
    stays["intime"] = pd.to_datetime(stays["intime"])
    subjects = set(stays["subject_id"])

    nat = etl.aggregate_feature_table(raw, "chartevents", subjects, stays,
                                      use_native=True)
    ref = etl.aggregate_feature_table(raw, "chartevents", subjects, stays,
                                      use_native=False)
    assert nat is not None and ref is not None
    nat = nat.sort_values(["subject_id", "hadm_id"]).reset_index(drop=True)
    ref = ref.sort_values(["subject_id", "hadm_id"]).reset_index(drop=True)
    assert sorted(nat.columns) == sorted(ref.columns)
    for c in ref.columns:
        np.testing.assert_allclose(
            nat[c].to_numpy(np.float64), ref[c].to_numpy(np.float64),
            rtol=1e-9, atol=1e-12, err_msg=c)


# --- fastnotes: note cleaning + chunking ------------------------------------


@pytest.fixture(scope="module")
def notes_ok():
    if not native.notes_available():
        pytest.skip("native fastnotes library unavailable")
    return True


def _python_clean_chunk(text, chunk_size=512):
    """The pandas-path chain from etl.build_unstructured, one doc."""
    from fairmultimodal_tpu.data.etl import clean_note_text, split_text_to_chunks

    y = ("" if text is None else str(text))
    y = y.replace("\n", " ").replace("\r", " ").strip().lower()
    y = clean_note_text(y)
    return y, split_text_to_chunks(y, chunk_size)


def test_fastnotes_handcrafted_cases(notes_ok):
    cases = [
        "Admission Date: [**2112-3-4**]  Discharge Date: [**2112-3-9**]\n"
        "Dr. Smith M.D. examined 12. patients --- done == status [unclosed",
        "", "   \t  ", "a [b [c] d] e", "[][][]", "[x]",
        "123.456.78a9. m.d.dr. DR. --__== -=_ 0.",
        "dr.dr.dr.", "m.d.m.d.", "1.2.3.4.5.6.7.8.9.0.",
        "admission date:discharge date:admission date:",
        "--a--b----", "naïve café [é] dr. 5.",   # non-ascii -> python path
        "[no close at all", "tail ]", "] [ ]",
        "word\rword\nword", "  leading and trailing  ",
        "=-=-= == = ==== a",
    ]
    cleaned, chunks = native.clean_and_chunk_native(cases, chunk_size=4)
    for t, c, ch in zip(cases, cleaned, chunks):
        ref_c, ref_ch = _python_clean_chunk(t, 4)
        assert c == ref_c, repr(t)
        assert ch == ref_ch, repr(t)


def test_fastnotes_fuzz_parity(notes_ok):
    """Random note-ish documents through both paths, byte-identical."""
    rng = np.random.default_rng(20260818)
    # \x1c-\x1f: ASCII C1 separators that Python str.split()/strip() treat
    # as whitespace — pinned here because the native is_ws must match.
    alphabet = list("abcdefghij XYZ.0123456789[]-_=\t\n\r:\x0b\x0c"
                    "\x1c\x1d\x1e\x1f") + [
        "dr.", "m.d.", "admission date:", "discharge date:", "--", "__",
        "==", "[**2112-1-2**]", " 42. ", "é"]
    docs = []
    for _ in range(200):
        n = int(rng.integers(0, 120))
        docs.append("".join(rng.choice(alphabet) for _ in range(n)))
    # a couple of long multi-chunk docs
    docs.append(" ".join(f"tok{i}. [x{i}]" for i in range(3000)))
    docs.append("dr. " * 2000)
    cleaned, chunks = native.clean_and_chunk_native(docs, chunk_size=512)
    for t, c, ch in zip(docs, cleaned, chunks):
        ref_c, ref_ch = _python_clean_chunk(t, 512)
        assert c == ref_c, repr(t[:80])
        assert ch == ref_ch, repr(t[:80])


def test_clean_and_chunk_texts_native_matches_python():
    """The etl helper must agree between forced-native and forced-python."""
    from fairmultimodal_tpu.data import etl

    if not native.notes_available():
        pytest.skip("native fastnotes library unavailable")
    texts = ["Dr. A [**x**] 12. --", "", None, "plain words " * 700, "café ü"]
    nat_c, nat_ch = etl.clean_and_chunk_texts(texts, use_native=True)
    ref_c, ref_ch = etl.clean_and_chunk_texts(texts, use_native=False)
    assert nat_c == ref_c
    assert nat_ch == ref_ch


def test_chunk_lists_to_frame_matches_apply_series():
    """Fast frame construction == the reference's apply(pd.Series) shape
    (00_data.py:431-436), including ragged NaN pads and column order."""
    from fairmultimodal_tpu.data.etl import chunk_lists_to_frame

    chunk_lists = [["a b", "c"], [], ["x"], ["1", "2", "3"]]
    idx = pd.Index([10, 20, 30, 40])

    def to_chunk_cols(chunks):
        return pd.Series({f"note_chunk_{i + 1}": c
                          for i, c in enumerate(chunks)})

    ref = pd.Series(chunk_lists, index=idx).apply(to_chunk_cols)
    got = chunk_lists_to_frame(chunk_lists, idx)
    pd.testing.assert_frame_equal(got, ref)

    # all-empty edge: no columns at all
    empty = chunk_lists_to_frame([[], []], pd.Index([1, 2]))
    assert list(empty.columns) == [] and len(empty) == 2
