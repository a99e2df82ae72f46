"""Data layer tests: splits, featurization, loader, synthetic data, ETL."""

import numpy as np
import pandas as pd
import pytest

from fairmultimodal_tpu.data import (
    BatchIterator,
    assemble_features,
    multilabel_stratified_split,
    reference_three_way_split,
)
from fairmultimodal_tpu.data.featurize import (
    compute_pos_weights,
    get_age_bucket,
    map_ethnicity,
    map_insurance,
    zscore,
)
from fairmultimodal_tpu.data.synthetic import make_common_frames, write_raw_mimic


def test_split_sizes_and_disjoint(rng):
    labels = rng.integers(0, 2, (500, 3))
    rest, test = multilabel_stratified_split(labels, 0.2, seed=42)
    assert len(rest) + len(test) == 500
    assert len(test) == 100
    assert len(np.intersect1d(rest, test)) == 0


def test_split_stratification_quality(rng):
    # Rare label (~4%) must be proportionally represented in the test fold.
    labels = np.zeros((1000, 3), dtype=int)
    labels[:, 0] = rng.random(1000) < 0.04
    labels[:, 1] = rng.random(1000) < 0.4
    labels[:, 2] = rng.random(1000) < 0.9
    rest, test = multilabel_stratified_split(labels, 0.2, seed=42)
    pos_total = labels[:, 0].sum()
    pos_test = labels[test, 0].sum()
    assert abs(pos_test - 0.2 * pos_total) <= 2


def test_split_deterministic(rng):
    labels = rng.integers(0, 2, (300, 3))
    a = multilabel_stratified_split(labels, 0.2, seed=7)
    b = multilabel_stratified_split(labels, 0.2, seed=7)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_three_way_split_matches_reference_fractions(rng):
    labels = rng.integers(0, 2, (1000, 3))
    tr, va, te = reference_three_way_split(labels)
    assert len(te) == 200
    assert len(va) == round(0.05 * 800)
    assert len(tr) + len(va) + len(te) == 1000
    assert not (set(tr) & set(va) or set(tr) & set(te) or set(va) & set(te))


def test_demographic_mappers_reference_quirks():
    assert get_age_bucket(29) == "15-29"
    assert get_age_bucket(90) == "Other"
    assert get_age_bucket("bad") == "Other"
    # Title-cased exact match only: MIMIC subtypes fall to Other
    # (10_FAME.py:662-670).
    assert map_ethnicity("WHITE") == "White"
    assert map_ethnicity("WHITE - RUSSIAN") == "Other"
    assert map_ethnicity(2) == "Hispanic"
    assert map_insurance("SELF PAY") == "Self Pay"
    assert map_insurance(4) == "Self Pay"
    assert map_insurance("Other thing") == "Other"


def test_zscore_and_pos_weights():
    x = np.array([[1.0, 10.0], [3.0, 10.0]], np.float32)
    z, mean, std = zscore(x)
    np.testing.assert_allclose(mean, [2.0, 10.0])
    assert z[0, 1] == 0.0  # zero-std column maps to 0 via eps
    labels = np.array([[1, 0, 1], [0, 0, 1], [0, 0, 1], [0, 0, 1]], np.float32)
    w = compute_pos_weights(labels)
    np.testing.assert_allclose(w, [4 / 2, 1.0, 4 / 8])


def test_assemble_features_from_synthetic():
    s, u = make_common_frames(n_patients=60, n_lab_features=8, seed=1)
    fb = assemble_features(s, u)
    # Patients without any note chunk are dropped (10_FAME.py:629-635).
    assert fb.num_patients < 60
    assert fb.num_lab_features == 8 + 1  # 8 lab_t cols + icu_los is numeric
    assert fb.labels.shape == (fb.num_patients, 3)
    assert fb.labs.dtype == np.float32
    # z-scored columns: zero mean.
    np.testing.assert_allclose(fb.labs.mean(axis=0), 0, atol=1e-4)
    assert all(len(c) >= 1 for c in fb.note_chunks)
    # age codes within the reference space.
    assert set(np.unique(fb.age_codes)) <= {0, 1, 2, 3, 4}


def test_assemble_features_keep_noteless():
    s, u = make_common_frames(n_patients=60, n_lab_features=8, seed=1)
    fb = assemble_features(s, u, require_notes=False)
    assert fb.num_patients == 60
    assert any(len(c) == 0 for c in fb.note_chunks)


def test_batch_iterator_pads_and_masks(rng):
    arrays = {"x": rng.normal(size=(10, 4)).astype(np.float32),
              "y": rng.integers(0, 2, 10).astype(np.float32)}
    it = BatchIterator(arrays, batch_size=4)
    batches = list(it)
    assert len(batches) == 3
    assert all(b["x"].shape == (4, 4) for b in batches)
    assert batches[-1]["weight"].sum() == 2.0
    total = sum(b["weight"].sum() for b in batches)
    assert total == 10


def test_batch_iterator_shuffles_deterministically(rng):
    arrays = {"x": np.arange(20, dtype=np.float32)}
    a = [b["x"] for b in BatchIterator(arrays, 5, shuffle=True, seed=3)]
    b = [b["x"] for b in BatchIterator(arrays, 5, shuffle=True, seed=3)]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))
    assert not np.array_equal(np.concatenate(a), arrays["x"])


@pytest.mark.slow
def test_etl_end_to_end(tmp_path):
    from fairmultimodal_tpu.data.etl import run_etl

    raw = tmp_path / "raw"
    out = tmp_path / "out"
    write_raw_mimic(str(raw), n_subjects=30, seed=0)
    stats = run_etl(str(raw), str(out))

    s = pd.read_csv(out / "final_structured_common.csv")
    u = pd.read_csv(out / "final_unstructured_common.csv")
    # Contract columns exist.
    for col in ["subject_id", "hadm_id", "short_term_mortality", "los_binary",
                "mechanical_ventilation", "age", "age_bucket",
                "ethnicity_category", "insurance_category", "gender", "icu_los"]:
        assert col in s.columns, col
    assert any(c.startswith("lab_t") for c in s.columns)
    assert any(c.startswith("chartevents_t") for c in s.columns)
    assert any(c.startswith("note_chunk_") for c in u.columns)
    # One row per subject; common subjects only.
    assert s["subject_id"].is_unique
    assert set(s["subject_id"]) == set(u["subject_id"])
    assert stats["n_common"] == len(s)
    # Labels are binary ints.
    assert set(s["short_term_mortality"].unique()) <= {0, 1}
    assert set(s["los_binary"].unique()) <= {0, 1}
    assert set(s["mechanical_ventilation"].unique()) <= {0, 1}
    # Age window respected (00_data.py:294).
    assert s["age"].between(15, 90).all()
    # los_binary consistent with icu_los threshold.
    base = pd.read_csv(out / "final_structured_dataset.csv")
    assert ((base["icu_los"] > 168).astype(int) == base["los_binary"]).all()


def test_note_cleaning_and_chunking():
    from fairmultimodal_tpu.data.etl import clean_note_text, split_text_to_chunks

    txt = "admission date: 2150-1-1 [**Name**] dr. smith m.d. 1. first -- item"
    cleaned = clean_note_text(txt)
    assert "[**" not in cleaned and "dr." not in cleaned and "--" not in cleaned
    chunks = split_text_to_chunks("a b c d e", chunk_size=2)
    assert chunks == ["a b", "c d", "e"]


def test_prefetch_to_device_preserves_order_and_content():
    import jax
    import jax.numpy as jnp

    from fairmultimodal_tpu.data.loader import BatchIterator
    from fairmultimodal_tpu.data.prefetch import PrefetchLoader, prefetch_to_device

    arrays = {"x": np.arange(20, dtype=np.float32).reshape(10, 2),
              "y": np.arange(10, dtype=np.int32)}
    it = BatchIterator(arrays, batch_size=4)
    batches = list(prefetch_to_device(it, size=2))
    assert len(batches) == 3
    assert isinstance(batches[0]["x"], jax.Array)
    flat = np.concatenate([np.asarray(b["x"])[b["weight"] > 0] for b in batches])
    np.testing.assert_array_equal(flat, arrays["x"])

    # Re-iterable wrapper gives identical passes.
    pl_loader = PrefetchLoader(BatchIterator(arrays, batch_size=4), size=3)
    assert len(pl_loader) == 3
    two = [list(pl_loader) for _ in range(2)]
    np.testing.assert_array_equal(np.asarray(two[0][0]["y"]),
                                  np.asarray(two[1][0]["y"]))


def test_debug_and_profiling_utils():
    import jax.numpy as jnp

    from fairmultimodal_tpu.utils.debug import check_finite_tree
    from fairmultimodal_tpu.utils.profiling import Timer, throughput, trace

    tree = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, float("nan")])},
            "ids": jnp.asarray([1, 2])}
    bad = check_finite_tree(tree, "params")
    assert bad == ["params/b/c"]

    with trace("unit-test"):
        pass
    with Timer() as t:
        _ = jnp.sum(jnp.ones(8))
    assert t.elapsed >= 0.0

    stats = throughput(lambda x: x + 1, jnp.ones(4), iters=3, warmup=1,
                       items_per_call=4)
    assert stats["items_per_sec"] > 0


def test_feature_merge_collapse_matches_cartesian():
    """The per-stay collapse before the feature merge (data/etl.py,
    build_structured) is mean-identical to the reference's Cartesian
    left-join + final groupby(subject).mean() (00_data.py:373-386): each
    table's values are repeated a uniform number of times in the product, so
    the mean is unchanged.  Verified on a fixture with ragged bin counts,
    NaN bins, and a stay missing from one table entirely."""
    rng = np.random.default_rng(5)
    base = pd.DataFrame({
        "subject_id": [1, 2, 3], "hadm_id": [10, 20, 30],
        "age": [50, 60, 70], "label": [0, 1, 0],
    })

    def make_table(name, bins_per_stay):
        rows = []
        for (s, h), k in bins_per_stay.items():
            for b in range(k):
                rows.append({"subject_id": s, "hadm_id": h,
                             f"{name}_tA": rng.normal(),
                             f"{name}_tB": (np.nan if b == 0
                                            else rng.normal())})
        return pd.DataFrame(rows)

    t1 = make_table("x", {(1, 10): 3, (2, 20): 1, (3, 30): 5})
    t2 = make_table("y", {(1, 10): 2, (2, 20): 4})   # subject 3 absent

    # Reference path: Cartesian merges then groupby(subject).mean().
    cart = base.copy()
    for t in (t1, t2):
        cart = cart.merge(t, on=["subject_id", "hadm_id"], how="left")
    num_cols = cart.select_dtypes("number").columns
    ref = cart.groupby("subject_id", as_index=False)[list(num_cols)].mean()

    # Rebuild path: collapse per stay first.
    fast = base.copy()
    for t in (t1, t2):
        fast = fast.merge(t.groupby(["subject_id", "hadm_id"],
                                    as_index=False).mean(),
                          on=["subject_id", "hadm_id"], how="left")
    got = fast.groupby("subject_id", as_index=False)[list(num_cols)].mean()

    pd.testing.assert_frame_equal(ref, got, rtol=1e-12, atol=1e-12)
