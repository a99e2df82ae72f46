"""Legacy-generation models (SURVEY §2.4): sequence BEHRT, EDDI-dot fusion,
readmission label."""

import jax
import jax.numpy as jnp
import numpy as np

from fairmultimodal_tpu.models.legacy import (
    BEHRTSequence,
    EDDIDotFusion,
    EDDIEnhancementLayer,
)


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
    write_raw_mimic(str(raw), n_subjects=20, seed=3)
    run_etl(str(raw), str(out))
    import pandas as pd

    s = pd.read_csv(out / "final_structured_common.csv")
    assert "readmission_within_30d" in s.columns
    assert set(s["readmission_within_30d"].unique()) <= {0, 1}
