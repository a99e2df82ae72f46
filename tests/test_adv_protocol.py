"""Stage-2 adversarial-debiasing protocol parity (round-5 fixes).

Pins the out-of-the-box 04 configuration against the reference literals
(04_AdvDebias.py:888-893,1081-1088) and the stage-2 model artifact
round-trip (04:752-763).
"""

from __future__ import annotations

import itertools
import os

import numpy as np
import pytest

from fairmultimodal_tpu.data.featurize import assemble_features, zscore
from fairmultimodal_tpu.data.synthetic import make_common_frames
from fairmultimodal_tpu.train import adversarial as adv


def test_reference_grid_literals():
    """REFERENCE_GRID is the verbatim 2^6 product (04:1081-1088)."""
    assert adv.REFERENCE_GRID == {
        "learning_rate": [1e-4, 5e-5],
        "num_iters": [1000, 2000],
        "num_nodes": [64, 128],
        "num_nodes_adv": [32, 64],
        "dropout_rate": [0.3, 0.5],
        "alpha": [1, 2],
    }
    n_points = 1
    for v in adv.REFERENCE_GRID.values():
        n_points *= len(v)
    assert n_points == 64


def test_default_grid_is_reference(monkeypatch):
    """adv_grid_search(grid=None) enumerates exactly the reference 64-point
    product in itertools.product order."""
    seen = []

    def fake_train(X, y, z, Xv, yv, zv, cfg, verbose=True, log_every=100):
        seen.append(cfg)
        return {"predictor_params": {}, "adversary_params": {},
                "train_curve": [], "valid_curve": [],
                "yhat_valid": np.full(len(yv), 0.5)}

    monkeypatch.setattr(adv, "train_adversarial", fake_train)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 3)).astype(np.float32)
    y = (rng.random(40) < 0.3).astype(np.float32)
    z = rng.integers(0, 3, 40)
    adv.adv_grid_search(X, y, z, X[:10], y[:10], z[:10], grid=None,
                        verbose=False)
    assert len(seen) == 64
    keys = list(adv.REFERENCE_GRID)
    expected = list(itertools.product(*(adv.REFERENCE_GRID[k] for k in keys)))
    got = [tuple(getattr(c, k) for k in keys) for c in seen]
    assert got == expected


def test_pipeline_defaults_match_reference():
    """Default stage-2 target/sensitive/grid follow 04:888-893."""
    from fairmultimodal_tpu.pipelines.adv_debias import AdvDebiasPipelineConfig

    cfg = AdvDebiasPipelineConfig()
    assert cfg.stage2_task == 0            # short_term_mortality (04:892)
    assert cfg.stage2_sensitive == "ethnicity"   # 04:893
    assert cfg.stage2_grid is None         # -> REFERENCE_GRID


def test_labs_raw_is_unscaled():
    """FeatureBundle.labs_raw = fillna(0) lab columns with NO z-score
    (04:888-891), while .labs stays the z-scored matrix."""
    s, u = make_common_frames(n_patients=40, n_lab_features=5, seed=3)
    bundle = assemble_features(s, u)
    assert bundle.labs_raw is not None
    assert bundle.labs_raw.shape == bundle.labs.shape
    # labs is exactly zscore(labs_raw): labs_raw is the pre-scaling matrix.
    expected_scaled, _, _ = zscore(bundle.labs_raw)
    np.testing.assert_allclose(bundle.labs, expected_scaled, rtol=1e-6)
    # And labs_raw itself is NOT z-scored (guards against aliasing labs):
    # z-scored columns have ~zero mean / ~unit std, raw ones generally don't.
    col_std = bundle.labs_raw.std(axis=0)
    assert not np.allclose(col_std[col_std > 0], 1.0, atol=1e-3)


def test_params_tostring_reference_order():
    cfg = adv.AdvConfig(learning_rate=1e-4, num_iters=2000, num_nodes=128,
                        num_nodes_adv=64, dropout_rate=0.5, alpha=2)
    assert adv.params_tostring(cfg) == (
        "learning_rate_0.0001-num_iters_2000-num_nodes_128-"
        "num_nodes_adv_64-dropout_rate_0.5-alpha_2")


def test_artifact_save_load_roundtrip(tmp_path):
    """Per-grid-point and reference-named finals are written; reload gives a
    module+params whose predictions match the originals exactly."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    X = rng.normal(size=(64, 4)).astype(np.float32)
    y = (rng.random(64) < 0.4).astype(np.float32)
    z = rng.integers(0, 3, 64)
    cfg = adv.AdvConfig(learning_rate=1e-3, num_iters=4, num_nodes=8,
                        num_nodes_adv=4, dropout_rate=0.1, alpha=1.0)
    out = adv.train_adversarial(X, y, z, X[:16], y[:16], z[:16], cfg,
                                verbose=False)
    results = [{"config": __import__("dataclasses").asdict(cfg),
                "metrics": {}, "train_curve": [], "valid_curve": [],
                "predictor_params": out["predictor_params"],
                "adversary_params": out["adversary_params"]}]
    written = adv.save_adv_artifacts(str(tmp_path), results, X.shape[1])
    tag = adv.params_tostring(cfg)
    expected = {os.path.join(str(tmp_path), "model", f"model-basic_{tag}.npz"),
                os.path.join(str(tmp_path), "model", "model-basic_final.npz"),
                os.path.join(str(tmp_path), "adv", f"model-adv_{tag}.npz"),
                os.path.join(str(tmp_path), "adv", "model-adv_final.npz")}
    assert set(written) == expected
    # Reference pre-creates model/adv/metrics dirs (04:1089-1091).
    assert os.path.isdir(os.path.join(str(tmp_path), "metrics"))

    module, params, loaded_cfg = adv.load_adv_artifact(
        os.path.join(str(tmp_path), "model", "model-basic_final.npz"))
    assert loaded_cfg == cfg
    ref_logits = adv.AdvPredictor(cfg.num_nodes, cfg.dropout_rate).apply(
        {"params": out["predictor_params"]}, jnp.asarray(X))
    new_logits = module.apply({"params": params}, jnp.asarray(X))
    np.testing.assert_array_equal(np.asarray(ref_logits),
                                  np.asarray(new_logits))

    adv_mod, adv_params, _ = adv.load_adv_artifact(
        os.path.join(str(tmp_path), "adv", "model-adv_final.npz"))
    pair = jnp.concatenate([jnp.zeros((8, 1)), jnp.ones((8, 1))], axis=1)
    ref_adv = adv.AdvAdversary(cfg.num_nodes_adv, cfg.dropout_rate).apply(
        {"params": out["adversary_params"]}, pair)
    np.testing.assert_array_equal(
        np.asarray(ref_adv),
        np.asarray(adv_mod.apply({"params": adv_params}, pair)))


def test_non_adversarial_skips_adv_artifacts(tmp_path):
    rng = np.random.default_rng(2)
    X = rng.normal(size=(32, 3)).astype(np.float32)
    y = (rng.random(32) < 0.5).astype(np.float32)
    z = rng.integers(0, 2, 32)
    cfg = adv.AdvConfig(num_iters=2, num_nodes=4, num_nodes_adv=4,
                        dropout_rate=0.0, adversarial=False)
    out = adv.train_adversarial(X, y, z, X[:8], y[:8], z[:8], cfg,
                                verbose=False)
    results = [{"config": __import__("dataclasses").asdict(cfg),
                "metrics": {},
                "predictor_params": out["predictor_params"],
                "adversary_params": out["adversary_params"]}]
    written = adv.save_adv_artifacts(str(tmp_path), results, X.shape[1])
    assert all("model-basic" in p for p in written)
    assert not os.listdir(os.path.join(str(tmp_path), "adv"))
