"""Legacy-generation models (SURVEY §2.4): sequence BEHRT, EDDI-dot fusion,
readmission label."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairmultimodal_tpu.models.legacy import (
    BEHRTSequence,
    EDDIDotFusion,
    EDDIEnhancementLayer,
)


@pytest.fixture(scope="module")
def tiny_text():
    from fairmultimodal_tpu.models.bert import BertConfig
    from fairmultimodal_tpu.models.text import TextEncoder

    return TextEncoder.from_pretrained(
        "offline/none",
        fallback_config=BertConfig(vocab_size=256, hidden_size=32,
                                   num_hidden_layers=1, num_attention_heads=2,
                                   intermediate_size=64,
                                   max_position_embeddings=64))


def test_behrt_sequence_shapes_and_masking():
    rng = np.random.default_rng(0)
    B, S = 4, 6
    model = BEHRTSequence(num_diseases=50, num_ages=80, hidden_size=32,
                          num_hidden_layers=1, num_attention_heads=2)
    batch = {
        "disease_ids": np.where(rng.random((B, S)) < 0.7,
                                rng.integers(1, 50, (B, S)), 0).astype(np.int32),
        "age_ids": rng.integers(15, 80, (B, S)).astype(np.int32),
        "segment_ids": (np.arange(S)[None, :] % 2).repeat(B, 0).astype(np.int32),
        "adm_loc_ids": rng.integers(0, 100, (B, S)).astype(np.int32),
        "disch_loc_ids": rng.integers(0, 100, (B, S)).astype(np.int32),
        "gender_ids": rng.integers(0, 2, (B, S)).astype(np.int32),
        "ethnicity_ids": rng.integers(0, 6, (B, S)).astype(np.int32),
        "insurance_ids": rng.integers(0, 6, (B, S)).astype(np.int32),
    }
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    params = model.init(jax.random.PRNGKey(0), jb)["params"]
    out = model.apply({"params": params}, jb)
    assert out["logits"].shape == (B, 3)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_eddi_enhancement_layer_identity_at_init():
    """ones-init weight => output == sigmoid(x) exactly (EDDI.py:210)."""
    layer = EDDIEnhancementLayer(dim=8)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (3, 8)), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    out = layer.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(jax.nn.sigmoid(x)),
                               rtol=1e-6)


def test_eddi_dot_fusion_shapes():
    rng = np.random.default_rng(1)
    B = 5
    demo = jnp.asarray(rng.normal(0, 1, (B, 16)), jnp.float32)
    lab = jnp.asarray(rng.normal(0, 1, (B, 16)), jnp.float32)
    text = jnp.asarray(rng.normal(0, 1, (B, 16)), jnp.float32)
    model = EDDIDotFusion(proj_dim=8, fusion_hidden=16)
    params = model.init(jax.random.PRNGKey(0), demo, lab, text)["params"]
    out = model.apply({"params": params}, demo, lab, text)
    assert out["logits"].shape == (B, 3)
    assert out["branch_scalars"].shape == (B, 3)


def test_readmission_label_in_etl(tmp_path):
    from fairmultimodal_tpu.data.etl import run_etl
    from fairmultimodal_tpu.data.synthetic import write_raw_mimic

    raw = tmp_path / "raw"
    out = tmp_path / "out"
    out.mkdir()
    write_raw_mimic(str(raw), n_subjects=30, seed=3)
    run_etl(str(raw), str(out))
    import pandas as pd

    s = pd.read_csv(out / "final_structured_common.csv")
    assert "readmission_within_30d" in s.columns
    # The fixture plants prior admissions with gaps on both sides of 30 d,
    # so the reference formula must produce BOTH label values.
    assert set(s["readmission_within_30d"].unique()) == {0, 1}
    # Earliest-era mortality label present, binary, and genuinely different
    # from the Final label (the fixture pushes some deaths past 30 d
    # post-discharge).
    assert "mortality_30d_post_discharge" in s.columns
    assert set(s["mortality_30d_post_discharge"].unique()) <= {0, 1}
    assert (s["mortality_30d_post_discharge"] <= s["short_term_mortality"]).all()
    assert (s["mortality_30d_post_discharge"] != s["short_term_mortality"]).any()


def test_label_formulas_match_reference():
    """The two earliest-era label formulas, verified against VERBATIM
    re-statements of Code/1_preprocessing_structured.py:24-28 on a
    hand-built admissions table covering the edges: first admission,
    same-day readmission, exactly-30/31-day admit gaps, long discharge but
    short admit gap (the case where the old discharge-gap variant and the
    reference formula disagree), in-hospital death, death 29 vs 31 days
    post-discharge, and no death."""
    import pandas as pd

    from fairmultimodal_tpu.data.etl import (
        compute_mortality_30d_post_discharge,
        compute_readmission_labels,
    )

    T = pd.Timestamp
    adm = pd.DataFrame([
        # subject 1: three admissions — gaps 31 d (admit-to-admit) then 2 d.
        dict(subject_id=1, hadm_id=10, ADMITTIME=T("2100-01-01"),
             DISCHTIME=T("2100-01-20"), DEATHTIME=pd.NaT),
        dict(subject_id=1, hadm_id=11, ADMITTIME=T("2100-02-01"),
             DISCHTIME=T("2100-02-03"), DEATHTIME=pd.NaT),
        dict(subject_id=1, hadm_id=12, ADMITTIME=T("2100-02-05"),
             DISCHTIME=T("2100-02-10"), DEATHTIME=T("2100-02-10 12:00")),
        # subject 2: admit gap exactly 30 d; long stay means the discharge
        # gap is only 5 d — both variants agree positive but on DIFFERENT
        # admissions (reference flags hadm 21, discharge-gap flags 20).
        dict(subject_id=2, hadm_id=20, ADMITTIME=T("2100-03-01"),
             DISCHTIME=T("2100-03-26"), DEATHTIME=pd.NaT),
        dict(subject_id=2, hadm_id=21, ADMITTIME=T("2100-03-31"),
             DISCHTIME=T("2100-04-02"), DEATHTIME=T("2100-05-20")),
        # subject 3: single admission, death 29 d post discharge.
        dict(subject_id=3, hadm_id=30, ADMITTIME=T("2100-05-01"),
             DISCHTIME=T("2100-05-04"), DEATHTIME=T("2100-06-02")),
        # subject 4: single admission, no death.
        dict(subject_id=4, hadm_id=40, ADMITTIME=T("2100-06-01"),
             DISCHTIME=T("2100-06-05"), DEATHTIME=pd.NaT),
    ])

    # --- readmission: reference formula verbatim (1_preprocessing_
    # structured.py:27-28) ---
    ref = adm.sort_values(by=["subject_id", "ADMITTIME"]).copy()
    ref["readmitted_within_30_days"] = (
        ref.groupby("subject_id")["ADMITTIME"].diff().dt.days <= 30
    ).astype(int)
    got = compute_readmission_labels(adm, mode="reference")
    merged = pd.merge(ref, got, on=["subject_id", "hadm_id"])
    assert (merged["readmission_within_30d"]
            == merged["readmitted_within_30_days"]).all()
    by_hadm = got.set_index("hadm_id")["readmission_within_30d"]
    assert by_hadm[10] == 0          # first admission
    assert by_hadm[11] == 0          # 31-day admit gap
    assert by_hadm[12] == 1          # 4-day admit gap
    assert by_hadm[20] == 0 and by_hadm[21] == 1   # flagged on the LATER stay
    assert by_hadm[30] == 0 and by_hadm[40] == 0

    # The old discharge-gap variant flags the EARLIER admission instead.
    alt = compute_readmission_labels(adm, mode="discharge_gap") \
        .set_index("hadm_id")["readmission_within_30d"]
    assert alt[20] == 1 and alt[21] == 0

    # --- mortality: reference formula verbatim (:24-26) ---
    expect = ((adm["DEATHTIME"] - adm["DISCHTIME"]).dt.days <= 30).astype(int)
    got_m = compute_mortality_30d_post_discharge(adm)
    assert (got_m == expect).all()
    by_hadm_m = dict(zip(adm["hadm_id"], got_m))
    assert by_hadm_m[12] == 1        # in-hospital death (same-day)
    assert by_hadm_m[21] == 0        # death 48 d post discharge
    assert by_hadm_m[30] == 1        # 29 d post discharge
    assert by_hadm_m[40] == 0        # no death (NaT-safe)


@pytest.mark.slow
def test_legacy_behrt_pipeline_e2e():
    """Sequence BEHRT runs end-to-end on synthetic multi-admission data and
    beats chance on at least one task (New/02_BEHRT.py experiment)."""
    from fairmultimodal_tpu.data.synthetic import make_admission_frame
    from fairmultimodal_tpu.pipelines import (
        LegacyBEHRTPipelineConfig,
        run_legacy_behrt_experiment,
    )
    from fairmultimodal_tpu.train.simple import SimpleTrainConfig

    frame = make_admission_frame(n_subjects=120, max_admissions=4, seed=1)
    cfg = LegacyBEHRTPipelineConfig(
        train=SimpleTrainConfig(lr=1e-3, num_epochs=6, batch_size=32,
                                loss="bce", optimizer="adamw",
                                weight_decay=0.01, patience=10,
                                rng_impl="threefry"),
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2)
    out = run_legacy_behrt_experiment(frame, cfg, verbose=False)
    assert set(out["metrics"]) == {"mortality", "los_binary",
                                   "mechanical_ventilation"} or len(out["metrics"]) == 3
    aurocs = [m["aucroc"] for m in out["metrics"].values()]
    assert all(np.isfinite(aurocs))
    assert max(aurocs) > 0.55, aurocs
    # Reference-compat mode: train == eval == full cohort (02_BEHRT.py:173).
    cfg.reference_compat = True
    cfg.train.num_epochs = 1
    out2 = run_legacy_behrt_experiment(frame, cfg, verbose=False)
    n_subjects = len(np.unique(frame["subject_id"]))
    assert len(out2["splits"]["test"]) <= n_subjects
    assert len(out2["splits"]["train"]) == len(out2["splits"]["test"])


@pytest.mark.slow
def test_legacy_eddi_pipeline_e2e(tiny_text):
    """EDDI-dot fusion trains on the 2-task legacy era (mortality +
    readmission) end-to-end (Code/EDDI.py experiment)."""
    from fairmultimodal_tpu.data.synthetic import make_common_frames
    from fairmultimodal_tpu.pipelines import (
        LegacyEDDIPipelineConfig,
        run_legacy_eddi_experiment,
    )
    from fairmultimodal_tpu.train.simple import SimpleTrainConfig

    s, u = make_common_frames(n_patients=120, n_lab_features=10, seed=4)
    assert "readmission_within_30d" in s.columns
    cfg = LegacyEDDIPipelineConfig(
        train=SimpleTrainConfig(lr=1e-3, num_epochs=3, batch_size=32,
                                loss="focal", gamma=2.0, optimizer="adam",
                                patience=10, rng_impl="threefry"),
        text_max_length=32, text_batch_size=16, hidden_size=32,
        demo_layers=1, demo_heads=2, lab_layers=1, lab_heads=2)
    out = run_legacy_eddi_experiment(s, u, cfg, text_encoder=tiny_text,
                                     verbose=False)
    assert set(out["metrics"]) == {"mortality", "readmission"}
    for m in out["metrics"].values():
        assert np.isfinite(m["aucroc"])
    # The readmission label must NOT appear among the lab features (leak
    # guard via EXCLUDE_COLS).
    from fairmultimodal_tpu.data.featurize import assemble_features

    bundle = assemble_features(s, u)
    assert not any("readmission" in c for c in bundle.lab_columns)
