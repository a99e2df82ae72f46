"""End-to-end smoke tests for every baseline pipeline on synthetic data
(tiny configs, CPU).  Mirrors the reference test strategy (SURVEY.md §4):
each numbered script must run train->eval->fairness-report without error and
produce finite metrics with the right schema."""

import numpy as np
import pytest

from fairmultimodal_tpu import TASKS
from fairmultimodal_tpu.data.synthetic import make_common_frames
from fairmultimodal_tpu.models.bert import BertConfig
from fairmultimodal_tpu.models.text import TextEncoder
from fairmultimodal_tpu.train.simple import SimpleTrainConfig


@pytest.fixture(scope="module")
def frames():
    return make_common_frames(n_patients=96, n_lab_features=8, seed=7)


@pytest.fixture(scope="module")
def tiny_text():
    return TextEncoder.from_pretrained(
        "offline/none",
        fallback_config=BertConfig(vocab_size=256, hidden_size=32,
                                   num_hidden_layers=1, num_attention_heads=2,
                                   intermediate_size=64,
                                   max_position_embeddings=64))


def _tiny_train(**kw):
    base = dict(lr=1e-3, num_epochs=2, batch_size=32)
    base.update(kw)
    return SimpleTrainConfig(**base)


def _check(out):
    assert set(out["metrics"]) == set(TASKS)
    for task, m in out["metrics"].items():
        assert np.isfinite(m["f1"]), task
    assert "overall_combined_eddi" in out["eddi"]
    assert len(out["history"]) >= 1


@pytest.mark.slow
def test_behrt_pipeline(frames):
    from fairmultimodal_tpu.pipelines import BEHRTPipelineConfig, run_behrt_experiment

    s, u = frames
    cfg = BEHRTPipelineConfig(train=_tiny_train(loss="bce", optimizer="adamw",
                                                grad_clip=1.0),
                              hidden_size=32)
    out = run_behrt_experiment(s, u, cfg, verbose=False)
    _check(out)


@pytest.mark.slow
def test_text_only_pipeline(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        TextOnlyPipelineConfig,
        run_text_only_experiment,
    )

    s, u = frames
    cfg = TextOnlyPipelineConfig(train=_tiny_train(loss="focal", gamma=2.0),
                                 text_max_length=32, text_batch_size=16)
    out = run_text_only_experiment(s, u, cfg, text_encoder=tiny_text,
                                   verbose=False)
    _check(out)


@pytest.mark.slow
def test_dfc_pipeline(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import DfCPipelineConfig, run_dfc_experiment

    s, u = frames
    cfg = DfCPipelineConfig(train=_tiny_train(), text_max_length=32,
                            text_batch_size=16, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=2)
    out = run_dfc_experiment(s, u, cfg, text_encoder=tiny_text, verbose=False)
    _check(out)


@pytest.mark.slow
def test_average_fusion_pipeline(frames, tiny_text, tmp_path):
    from fairmultimodal_tpu.pipelines import (
        AverageFusionPipelineConfig,
        run_average_fusion_experiment,
    )

    s, u = frames
    cfg = AverageFusionPipelineConfig(
        train=_tiny_train(), text_max_length=32, text_batch_size=16,
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        out_dir=str(tmp_path))
    out = run_average_fusion_experiment(s, u, cfg, text_encoder=tiny_text,
                                        verbose=False)
    _check(out)
    emb = np.load(out["artifacts"]["extracted_embeddings"])
    assert emb["embeddings"].shape[1] == 512   # pre-ReLU fused dim
    assert len(emb["embeddings"]) == len(emb["labels"])


@pytest.mark.slow
def test_adv_debias_pipeline(frames, tiny_text, tmp_path):
    from fairmultimodal_tpu.pipelines import (
        AdvDebiasPipelineConfig,
        run_adv_debias_experiment,
    )

    s, u = frames
    cfg = AdvDebiasPipelineConfig(
        train=_tiny_train(num_epochs=1), text_max_length=32,
        text_batch_size=16, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2,
        stage2_grid={"learning_rate": [1e-3], "num_iters": [60],
                     "num_nodes": [16], "num_nodes_adv": [8],
                     "dropout_rate": [0.1], "alpha": [1.0]},
        out_dir=str(tmp_path))
    out = run_adv_debias_experiment(s, u, cfg, text_encoder=tiny_text,
                                    verbose=False)
    _check(out)
    assert out["stage2"] is not None and len(out["stage2"]) == 1
    m = out["stage2"][0]["metrics"]
    assert 0.0 <= m["accuracy"] <= 1.0
    assert np.isfinite(m["f1"])
    import os
    assert os.path.exists(os.path.join(str(tmp_path), "metrics.csv"))
    # Stage-2 model artifacts (npz analogue of model/model-basic*.pth,
    # adv/model-adv*.pth — 04:752-763) are written and reloadable.
    from fairmultimodal_tpu.train.adversarial import load_adv_artifact

    pred_final = os.path.join(str(tmp_path), "model", "model-basic_final.npz")
    adv_final = os.path.join(str(tmp_path), "adv", "model-adv_final.npz")
    assert os.path.exists(pred_final) and os.path.exists(adv_final)
    module, params, cfg2 = load_adv_artifact(pred_final)
    import jax.numpy as jnp
    X = np.asarray(out["prep"].bundle.labs_raw, np.float32)
    logits = module.apply({"params": params}, jnp.asarray(X))
    assert np.isfinite(np.asarray(logits)).all()
    assert cfg2.num_nodes == 16


@pytest.mark.slow
def test_fairehr_clp_pipeline_reference_mode(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        FairEHRCLPPipelineConfig,
        run_fairehr_clp_experiment,
    )

    s, u = frames
    cfg = FairEHRCLPPipelineConfig(
        train=_tiny_train(num_epochs=1), text_max_length=32,
        text_batch_size=16, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2)
    out = run_fairehr_clp_experiment(s, u, cfg, text_encoder=tiny_text,
                                     verbose=False)
    _check(out)


@pytest.mark.slow
def test_fairehr_clp_pipeline_contrastive(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        FairEHRCLPPipelineConfig,
        run_fairehr_clp_experiment,
    )

    s, u = frames
    cfg = FairEHRCLPPipelineConfig(
        train=_tiny_train(num_epochs=1), text_max_length=32,
        text_batch_size=16, contrastive=True)
    out = run_fairehr_clp_experiment(s, u, cfg, text_encoder=tiny_text,
                                     verbose=False)
    _check(out)


@pytest.mark.slow
def test_eddi_fusion_pipeline(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        EDDIFusionPipelineConfig,
        run_eddi_fusion_experiment,
    )

    s, u = frames
    cfg = EDDIFusionPipelineConfig(
        train=_tiny_train(num_epochs=2), text_max_length=32,
        text_batch_size=16, hidden_size=32, demo_layers=1, demo_heads=2,
        lab_layers=1, lab_heads=2)
    out = run_eddi_fusion_experiment(s, u, cfg, text_encoder=tiny_text,
                                     verbose=False)
    _check(out)
    w = out["weights"]
    assert w.shape == (3, 3)
    assert np.isfinite(w).all()
    # Per-epoch persistence protocol (08:861-916): old_eddi_weights is held
    # fixed for every batch of an epoch — epoch 1 trains with the 0.33 base
    # (08:389-392) and only the per-epoch update (from the last val batch)
    # moves it.  Each update adds beta*(eddi_max - eddi_m) >= 0.
    hist_w = [np.asarray(h["weights"]) for h in out["history"]]
    np.testing.assert_allclose(hist_w[0], 0.33, atol=1e-6)
    if len(hist_w) > 1:
        assert (hist_w[1] >= hist_w[0] - 1e-6).all()


@pytest.mark.slow
def test_sigmoid_fusion_pipeline(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        SigmoidFusionPipelineConfig,
        run_sigmoid_fusion_experiment,
    )

    s, u = frames
    cfg = SigmoidFusionPipelineConfig(
        train=_tiny_train(num_epochs=2), text_max_length=32,
        text_batch_size=16, hidden_size=32, demo_layers=1, demo_heads=2,
        lab_layers=1, lab_heads=2)
    out = run_sigmoid_fusion_experiment(s, u, cfg, text_encoder=tiny_text,
                                        verbose=False)
    _check(out)


def test_batch_eddi_weights_jit_parity():
    """The on-device batch EDDI weighting must match the host compute_eddi
    over the same hard predictions."""
    import jax.numpy as jnp

    from fairmultimodal_tpu.fairness.eddi import compute_eddi
    from fairmultimodal_tpu.pipelines.eddi_fusion import batch_eddi_weights

    rng = np.random.default_rng(0)
    B = 64
    tm = rng.normal(0, 2, (B, 3, 3)).astype(np.float32)
    labels = rng.integers(0, 2, (B, 3)).astype(np.float32)
    gender = rng.integers(0, 2, B).astype(np.int32)
    w_prev = np.full((3, 3), 1 / 3, np.float32)

    w_new, eddi = batch_eddi_weights(jnp.asarray(tm), jnp.asarray(labels),
                                     jnp.asarray(gender), jnp.asarray(w_prev),
                                     beta=0.3)
    eddi = np.asarray(eddi)
    probs = 1 / (1 + np.exp(-tm))
    for t in range(3):
        for m in range(3):
            ref, _ = compute_eddi(labels[:, t], probs[:, t, m], gender,
                                  threshold=0.5)
            assert eddi[t, m] == pytest.approx(ref, abs=1e-5), (t, m)
    np.testing.assert_allclose(
        np.asarray(w_new),
        w_prev + 0.3 * (eddi.max(axis=1, keepdims=True) - eddi), atol=1e-6)


@pytest.mark.slow
def test_fame_inference_roundtrip(frames, tiny_text, tmp_path):
    """Export trained FAME params, reload via the serving path, and verify
    the predictor reproduces the training-time probabilities."""
    import jax
    import jax.numpy as jnp

    from fairmultimodal_tpu.models.fusion import FAMEModel
    from fairmultimodal_tpu.pipelines.fame import build_model_arrays
    from fairmultimodal_tpu.pipelines.inference import FAMEPredictor
    from fairmultimodal_tpu.utils.checkpoint import load_params_npz, save_params_npz
    from fairmultimodal_tpu.data.featurize import assemble_features
    from fairmultimodal_tpu.models.text import encode_note_chunks

    s, u = frames
    bundle = assemble_features(s, u)
    bundle.text_embeddings = encode_note_chunks(tiny_text, bundle.note_chunks,
                                                max_length=32, batch_size=16)
    arrays = build_model_arrays(bundle)
    n_ages, n_gen, n_eth, n_ins = bundle.vocab_sizes()
    model = FAMEModel(num_ages=n_ages, num_genders=n_gen,
                      num_ethnicities=n_eth, num_insurances=n_ins,
                      lab_token_count=bundle.num_lab_features,
                      text_embed_size=32, hidden_size=32, demo_layers=1,
                      demo_heads=2, lab_layers=1, lab_heads=2, fusion_hidden=16)
    jb = {k: jnp.asarray(v[:4]) for k, v in arrays.items()}
    params = model.init(jax.random.PRNGKey(0), jb)["params"]

    path = str(tmp_path / "best.npz")
    save_params_npz(path, params)
    restored = load_params_npz(path, params)

    pred = FAMEPredictor(model, restored, batch_size=16)
    out = pred.predict_arrays(arrays)
    assert out["probs"].shape == (bundle.num_patients, 3)
    assert ((out["probs"] >= 0) & (out["probs"] <= 1)).all()

    # Oracle: direct apply on the first 16 rows.
    mi = {k: jnp.asarray(v[:16]) for k, v in arrays.items()}
    direct = jax.nn.sigmoid(model.apply(
        {"params": params}, mi,
        dynamic_weights=jnp.full((3, 3), 0.33), deterministic=True
    )["fused_logits"])
    np.testing.assert_allclose(out["probs"][:16], np.asarray(direct), atol=1e-5)

    # Serving benchmark smoke: finite, positive, right schema.
    r = pred.benchmark(iters=2)
    assert r["batch_size"] == 16
    assert r["batch_latency_ms"] > 0 and np.isfinite(r["patients_per_sec"])


@pytest.mark.slow
def test_fame_inference_uses_checkpoint_metadata(frames, tiny_text, tmp_path):
    """run_fame_inference reconstructs the model purely from the metadata
    embedded in the exported npz (no geometry kwargs needed)."""
    import jax
    import jax.numpy as jnp

    from fairmultimodal_tpu.data.featurize import assemble_features
    from fairmultimodal_tpu.models.fusion import FAMEModel
    from fairmultimodal_tpu.models.text import encode_note_chunks
    from fairmultimodal_tpu.pipelines.fame import build_model_arrays
    from fairmultimodal_tpu.pipelines.inference import run_fame_inference
    from fairmultimodal_tpu.utils.checkpoint import save_params_npz

    s, u = frames
    bundle = assemble_features(s, u)
    bundle.text_embeddings = encode_note_chunks(tiny_text, bundle.note_chunks,
                                                max_length=32, batch_size=16)
    n_ages, n_gen, n_eth, n_ins = bundle.vocab_sizes()
    geometry = dict(num_ages=n_ages, num_genders=n_gen, num_ethnicities=n_eth,
                    num_insurances=n_ins,
                    lab_token_count=bundle.num_lab_features,
                    text_embed_size=32, hidden_size=32, demo_layers=1,
                    demo_heads=2, lab_layers=1, lab_heads=2, fusion_hidden=16)
    model = FAMEModel(**geometry)
    arrays = build_model_arrays(bundle)
    jb = {k: jnp.asarray(v[:4]) for k, v in arrays.items()}
    params = model.init(jax.random.PRNGKey(0), jb)["params"]
    path = str(tmp_path / "best.npz")
    save_params_npz(path, params, metadata={
        "model": geometry,
        "thresholds": {"mortality": 0.3, "los": 0.5,
                       "mechanical_ventilation": 0.7},
        "dynamic_weights": [[0.33, 0.33, 0.34]] * 3})

    table = run_fame_inference(s, u, path, text_encoder=tiny_text,
                               text_max_length=32, verbose=False)
    assert len(table) == bundle.num_patients
    assert {"mortality_prob", "los_pred"} <= set(table.columns)
    # Threshold from metadata actually applied.
    mort = table["mortality_prob"].to_numpy()
    np.testing.assert_array_equal(table["mortality_pred"].to_numpy(),
                                  (mort > 0.3).astype(int))
