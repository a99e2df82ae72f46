"""Learning-quality assertions for every baseline pipeline (VERDICT r2 #3/#6).

The e2e smoke tests (`test_pipelines.py`) assert schema + finiteness; these
assert the models actually LEARN: on a 240-patient synthetic cohort whose
labels carry lab, text, and age signal (`data/synthetic.py`), each pipeline
must clear an AUROC bar a label-shuffling or wiring regression (e.g. 09's
embedding-argsort misalignment, a dead projection, a loss wired to the wrong
logits) cannot clear.  Thresholds sit ≥0.05 below deterministically-probed
CPU values (runs are seeded; conftest pins the CPU backend).

Legacy sequence-BEHRT is the exception: on single-admission synthetic data
its observable features (demographic embeddings over raw-age rows) carry too
little signal for generalization, so it is asserted in ``reference_compat``
mode (train == eval, the reference's own protocol) where its per-patient
proxy token must drive memorization to AUROC ~1.0 — which still fails on any
gradient/eval-alignment breakage.
"""

import numpy as np
import pytest

from fairmultimodal_tpu.data.synthetic import make_common_frames
from fairmultimodal_tpu.models.bert import BertConfig
from fairmultimodal_tpu.models.text import TextEncoder
from fairmultimodal_tpu.train.simple import SimpleTrainConfig

pytestmark = pytest.mark.slow

N = 240


@pytest.fixture(scope="module")
def frames():
    return make_common_frames(n_patients=N, n_lab_features=8, seed=7)


@pytest.fixture(scope="module")
def tiny_text():
    return TextEncoder.from_pretrained(
        "offline/none",
        fallback_config=BertConfig(vocab_size=256, hidden_size=32,
                                   num_hidden_layers=1, num_attention_heads=2,
                                   intermediate_size=64,
                                   max_position_embeddings=64))


def _train(**kw):
    base = dict(lr=1e-3, num_epochs=10, batch_size=32)
    base.update(kw)
    return SimpleTrainConfig(**base)


def _aurocs(out):
    return {t: m["aucroc"] for t, m in out["metrics"].items()}


def _assert_learns(out, max_floor, all_floor=None):
    a = _aurocs(out)
    assert max(a.values()) > max_floor, a
    if all_floor is not None:
        assert min(a.values()) > all_floor, a


def test_behrt_learns(frames):
    from fairmultimodal_tpu.pipelines import BEHRTPipelineConfig, run_behrt_experiment

    s, u = frames
    cfg = BEHRTPipelineConfig(train=_train(loss="bce", optimizer="adamw",
                                           grad_clip=1.0), hidden_size=32)
    out = run_behrt_experiment(s, u, cfg, verbose=False)
    _assert_learns(out, max_floor=0.85, all_floor=0.70)   # probed .96/.83/.96


def test_text_only_learns(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        TextOnlyPipelineConfig,
        run_text_only_experiment,
    )

    s, u = frames
    cfg = TextOnlyPipelineConfig(train=_train(loss="focal", gamma=2.0),
                                 text_max_length=32, text_batch_size=16)
    out = run_text_only_experiment(s, u, cfg, text_encoder=tiny_text,
                                   verbose=False)
    _assert_learns(out, max_floor=0.65)                   # probed max .78


def test_dfc_learns(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import DfCPipelineConfig, run_dfc_experiment

    s, u = frames
    cfg = DfCPipelineConfig(train=_train(), text_max_length=32,
                            text_batch_size=16, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=2)
    out = run_dfc_experiment(s, u, cfg, text_encoder=tiny_text, verbose=False)
    _assert_learns(out, max_floor=0.70)                   # probed max .88


def test_average_fusion_learns(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        AverageFusionPipelineConfig,
        run_average_fusion_experiment,
    )

    s, u = frames
    cfg = AverageFusionPipelineConfig(
        train=_train(), text_max_length=32, text_batch_size=16,
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2)
    out = run_average_fusion_experiment(s, u, cfg, text_encoder=tiny_text,
                                        verbose=False)
    _assert_learns(out, max_floor=0.65)                   # probed max .74


def test_adv_debias_stage1_learns(frames, tiny_text, tmp_path):
    from fairmultimodal_tpu.pipelines import (
        AdvDebiasPipelineConfig,
        run_adv_debias_experiment,
    )

    s, u = frames
    cfg = AdvDebiasPipelineConfig(
        train=_train(), text_max_length=32, text_batch_size=16,
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        stage2_grid={"learning_rate": [1e-3], "num_iters": [60],
                     "num_nodes": [16], "num_nodes_adv": [8],
                     "dropout_rate": [0.1], "alpha": [1.0]},
        out_dir=str(tmp_path))
    out = run_adv_debias_experiment(s, u, cfg, text_encoder=tiny_text,
                                    verbose=False)
    _assert_learns(out, max_floor=0.65)                   # stage1 == avg arch


def test_fairehr_clp_learns(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        FairEHRCLPPipelineConfig,
        run_fairehr_clp_experiment,
    )

    s, u = frames
    cfg = FairEHRCLPPipelineConfig(
        train=_train(), text_max_length=32, text_batch_size=16,
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2)
    out = run_fairehr_clp_experiment(s, u, cfg, text_encoder=tiny_text,
                                     verbose=False)
    _assert_learns(out, max_floor=0.65)                   # probed max .74


def test_eddi_fusion_learns(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        EDDIFusionPipelineConfig,
        run_eddi_fusion_experiment,
    )

    s, u = frames
    cfg = EDDIFusionPipelineConfig(
        train=_train(), text_max_length=32, text_batch_size=16,
        hidden_size=32, demo_layers=1, demo_heads=2, lab_layers=1,
        lab_heads=2)
    out = run_eddi_fusion_experiment(s, u, cfg, text_encoder=tiny_text,
                                     verbose=False)
    _assert_learns(out, max_floor=0.75)                   # probed .86/.86/.82


def test_sigmoid_fusion_learns(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        SigmoidFusionPipelineConfig,
        run_sigmoid_fusion_experiment,
    )

    s, u = frames
    cfg = SigmoidFusionPipelineConfig(
        train=_train(), text_max_length=32, text_batch_size=16,
        hidden_size=32, demo_layers=1, demo_heads=2, lab_layers=1,
        lab_heads=2)
    out = run_sigmoid_fusion_experiment(s, u, cfg, text_encoder=tiny_text,
                                        verbose=False)
    _assert_learns(out, max_floor=0.68)                   # probed max .73


def test_single_task_vent_learns(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        BEHRTPipelineConfig,
        SigmoidFusionPipelineConfig,
        run_behrt_experiment,
        run_sigmoid_fusion_experiment,
    )

    s, u = frames
    cfg = BEHRTPipelineConfig(train=_train(loss="bce", optimizer="adamw",
                                           grad_clip=1.0), hidden_size=32,
                              task="mechanical_ventilation")
    out = run_behrt_experiment(s, u, cfg, verbose=False)
    assert out["metrics"]["mechanical_ventilation"]["aucroc"] > 0.75  # .87

    cfg = SigmoidFusionPipelineConfig(
        train=_train(), text_max_length=32, text_batch_size=16,
        hidden_size=32, demo_layers=1, demo_heads=2, lab_layers=1,
        lab_heads=2, task="mechanical_ventilation")
    out = run_sigmoid_fusion_experiment(s, u, cfg, text_encoder=tiny_text,
                                        verbose=False)
    assert out["metrics"]["mechanical_ventilation"]["aucroc"] > 0.75  # .91


def test_legacy_eddi_learns(frames, tiny_text):
    from fairmultimodal_tpu.pipelines.legacy import (
        LegacyEDDIPipelineConfig,
        run_legacy_eddi_experiment,
    )

    s, u = frames
    cfg = LegacyEDDIPipelineConfig(hidden_size=32, demo_layers=1,
                                   demo_heads=2, lab_layers=1, lab_heads=2,
                                   text_max_length=32, text_batch_size=16)
    cfg.train = _train(loss="focal", gamma=2.0, num_epochs=20)
    out = run_legacy_eddi_experiment(s, u, cfg, text_encoder=tiny_text,
                                     verbose=False)
    _assert_learns(out, max_floor=0.65)                   # probed mort .71


def test_legacy_behrt_memorizes_under_compat(frames):
    """See module docstring: compat mode (train == eval) must reach ~1.0 via
    the unique per-patient proxy token — fails on any gradient or
    eval-alignment breakage."""
    from fairmultimodal_tpu.pipelines.legacy import (
        LegacyBEHRTPipelineConfig,
        run_legacy_behrt_experiment,
    )

    s, _ = frames
    cfg = LegacyBEHRTPipelineConfig(hidden_size=32, num_hidden_layers=1,
                                    num_attention_heads=2,
                                    reference_compat=True)
    cfg.train = _train(lr=3e-3, num_epochs=25, loss="bce", optimizer="adamw",
                       grad_clip=1.0, patience=50)
    out = run_legacy_behrt_experiment(s, cfg, verbose=False)
    a = _aurocs(out)
    assert min(a.values()) > 0.95, a                      # probed 1.0/1.0/1.0
    assert out["history"][-1]["train_loss"] < 0.2 * out["history"][0]["train_loss"]
