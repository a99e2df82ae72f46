"""Golden transcripts for every remaining runnable pipeline (VERDICT r2 #2).

Extends ``test_golden.py``'s oracle (the reference commits a ``.log`` for
every script — ``FinalCode/New/*.log``, SURVEY §4) to 03-09, the legacy
generations, the single-task regime, and ``predict`` — plus a longer-horizon
FAME transcript in which plateau LR decay, a no-improvement streak, early
stopping, and the dynamic-weight trajectory are all pinned.

Regenerate intentionally-changed transcripts with::

    GOLDEN_REGEN=1 python -m pytest tests/test_golden_pipelines.py -q
"""

import contextlib
import io
import re

import numpy as np
import pytest

from test_golden import _check_or_regen, _tiny_text

from fairmultimodal_tpu.data.synthetic import make_common_frames
from fairmultimodal_tpu.train.simple import SimpleTrainConfig

_TMP_RE = re.compile(r"(/tmp|/private/var)/\S+")


@pytest.fixture(scope="module")
def frames():
    return make_common_frames(n_patients=96, n_lab_features=8, seed=5)


@pytest.fixture(scope="module")
def tiny_text():
    return _tiny_text()


def _tiny_train(**kw):
    base = dict(lr=1e-3, num_epochs=2, batch_size=32, rng_impl="threefry")
    base.update(kw)
    return SimpleTrainConfig(**base)


def _capture(fn, *args, **kwargs):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out = fn(*args, **kwargs)
    # Temp paths (artifact dirs) are run-specific; pin everything else.
    return _TMP_RE.sub("<TMP>", buf.getvalue()), out


@pytest.mark.slow
def test_golden_dfc_transcript(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import DfCPipelineConfig, run_dfc_experiment

    s, u = frames
    cfg = DfCPipelineConfig(train=_tiny_train(), text_max_length=32,
                            text_batch_size=16, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=2)
    text, _ = _capture(run_dfc_experiment, s, u, cfg, text_encoder=tiny_text,
                       verbose=True)
    _check_or_regen("dfc_tiny.log", text)


@pytest.mark.slow
def test_golden_average_fusion_transcript(frames, tiny_text, tmp_path):
    from fairmultimodal_tpu.pipelines import (
        AverageFusionPipelineConfig,
        run_average_fusion_experiment,
    )

    s, u = frames
    cfg = AverageFusionPipelineConfig(
        train=_tiny_train(), text_max_length=32, text_batch_size=16,
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        out_dir=str(tmp_path))
    text, _ = _capture(run_average_fusion_experiment, s, u, cfg,
                       text_encoder=tiny_text, verbose=True)
    _check_or_regen("average_fusion_tiny.log", text)


@pytest.mark.slow
def test_golden_adv_debias_transcript(frames, tiny_text, tmp_path):
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
    text, _ = _capture(run_adv_debias_experiment, s, u, cfg,
                       text_encoder=tiny_text, verbose=True)
    _check_or_regen("adv_debias_tiny.log", text)


@pytest.mark.slow
def test_golden_fairehr_clp_transcript(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        FairEHRCLPPipelineConfig,
        run_fairehr_clp_experiment,
    )

    s, u = frames
    cfg = FairEHRCLPPipelineConfig(
        train=_tiny_train(num_epochs=1), text_max_length=32,
        text_batch_size=16, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2)
    text, _ = _capture(run_fairehr_clp_experiment, s, u, cfg,
                       text_encoder=tiny_text, verbose=True)
    _check_or_regen("fairehr_clp_tiny.log", text)


@pytest.mark.slow
def test_golden_eddi_fusion_transcript(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        EDDIFusionPipelineConfig,
        run_eddi_fusion_experiment,
    )

    s, u = frames
    cfg = EDDIFusionPipelineConfig(
        train=_tiny_train(), text_max_length=32, text_batch_size=16,
        hidden_size=32, demo_layers=1, demo_heads=2, lab_layers=1,
        lab_heads=2)
    text, _ = _capture(run_eddi_fusion_experiment, s, u, cfg,
                       text_encoder=tiny_text, verbose=True)
    _check_or_regen("eddi_fusion_tiny.log", text)


@pytest.mark.slow
def test_golden_sigmoid_fusion_transcript(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        SigmoidFusionPipelineConfig,
        run_sigmoid_fusion_experiment,
    )

    s, u = frames
    cfg = SigmoidFusionPipelineConfig(
        train=_tiny_train(), text_max_length=32, text_batch_size=16,
        hidden_size=32, demo_layers=1, demo_heads=2, lab_layers=1,
        lab_heads=2)
    text, _ = _capture(run_sigmoid_fusion_experiment, s, u, cfg,
                       text_encoder=tiny_text, verbose=True)
    _check_or_regen("sigmoid_fusion_tiny.log", text)


@pytest.mark.slow
def test_golden_legacy_behrt_transcript(frames):
    from fairmultimodal_tpu.pipelines.legacy import (
        LegacyBEHRTPipelineConfig,
        run_legacy_behrt_experiment,
    )

    s, _ = frames
    cfg = LegacyBEHRTPipelineConfig(hidden_size=32, num_hidden_layers=1,
                                    num_attention_heads=2)
    cfg.train = _tiny_train(loss="bce", optimizer="adamw", grad_clip=1.0)
    text, _ = _capture(run_legacy_behrt_experiment, s, cfg, verbose=True)
    _check_or_regen("legacy_behrt_tiny.log", text)


@pytest.mark.slow
def test_golden_legacy_eddi_transcript(frames, tiny_text):
    from fairmultimodal_tpu.pipelines.legacy import (
        LegacyEDDIPipelineConfig,
        run_legacy_eddi_experiment,
    )

    s, u = frames
    cfg = LegacyEDDIPipelineConfig(hidden_size=32, demo_layers=1,
                                   demo_heads=2, lab_layers=1, lab_heads=2,
                                   text_max_length=32, text_batch_size=16)
    cfg.train = _tiny_train(loss="focal", gamma=2.0)
    text, _ = _capture(run_legacy_eddi_experiment, s, u, cfg,
                       text_encoder=tiny_text, verbose=True)
    _check_or_regen("legacy_eddi_tiny.log", text)


@pytest.mark.slow
def test_golden_single_task_transcript(frames):
    from fairmultimodal_tpu.pipelines import (
        BEHRTPipelineConfig,
        run_behrt_experiment,
    )

    s, u = frames
    cfg = BEHRTPipelineConfig(
        train=_tiny_train(loss="bce", optimizer="adamw", grad_clip=1.0),
        hidden_size=32, task="mechanical_ventilation")
    text, _ = _capture(run_behrt_experiment, s, u, cfg, verbose=True)
    _check_or_regen("single_task_behrt_tiny.log", text)


@pytest.mark.slow
def test_golden_predict_transcript(frames, tiny_text, tmp_path):
    """Serving path: train-free init -> export npz with metadata -> predict."""
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
    # Typed threefry: a raw PRNGKey follows the process-global default impl,
    # which earlier suite tests flip to unsafe_rbg (utils/rng.py) — the
    # transcript must not depend on suite order.
    params = model.init(jax.random.key(0, impl="threefry2x32"), jb)["params"]
    path = str(tmp_path / "best.npz")
    save_params_npz(path, params, metadata={
        "model": geometry,
        "thresholds": {"mortality": 0.5, "los": 0.5,
                       "mechanical_ventilation": 0.5},
        "dynamic_weights": [[0.33, 0.33, 0.34]] * 3})

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        table = run_fame_inference(s, u, path, text_encoder=tiny_text,
                                   text_max_length=32, verbose=True)
        # Pin the prediction table head alongside the stdout (value drift in
        # the serving path must fail the diff even if prints stay stable).
        print("--- head ---")
        print(table.head(8).round(4).to_string())
    _check_or_regen("predict_tiny.log", _TMP_RE.sub("<TMP>", buf.getvalue()))


@pytest.mark.slow
def test_golden_fame_long_transcript():
    """Longer-horizon FAME golden: enough epochs that plateau LR decay,
    a multi-epoch no-improvement streak, early stopping, and dynamic-weight
    drift ALL appear in the pinned text (VERDICT r2: the 2-epoch golden never
    exercised the scheduler)."""
    from fairmultimodal_tpu.data.synthetic import make_common_frames
    from fairmultimodal_tpu.pipelines.fame import (
        FAMEPipelineConfig,
        run_fame_experiment,
    )
    from fairmultimodal_tpu.train.loop import TrainConfig

    s, u = make_common_frames(n_patients=96, n_lab_features=8, seed=5)
    cfg = FAMEPipelineConfig(
        train=TrainConfig(lr=1e-3, num_epochs=20, batch_size=32,
                          rng_impl="threefry", patience=5,
                          scheduler_factor=0.1, scheduler_patience=2),
        text_max_length=32, text_batch_size=16, hidden_size=32,
        demo_layers=1, demo_heads=2, lab_layers=1, lab_heads=2,
        fusion_hidden=16, save_artifacts=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_fame_experiment(s, u, cfg, text_encoder=_tiny_text(), verbose=True)
    text = buf.getvalue()
    # The protocol features this golden exists to pin:
    assert "No improvement for" in text
    assert "Weight Update" in text
    _check_or_regen("fame_long.log", text)
