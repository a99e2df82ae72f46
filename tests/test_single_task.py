"""Single-task training regime (the Mechanical_Ventilation generation:
FinalCode/Mechanical_Ventilation/* trains one-label models).  Each supporting
pipeline must train a 1-logit model on the selected task, stratify/pos-weight
on that label alone, and report a single-task metric/EDDI block."""

import numpy as np
import pytest

from fairmultimodal_tpu.data.synthetic import make_common_frames
from fairmultimodal_tpu.models.bert import BertConfig
from fairmultimodal_tpu.models.text import TextEncoder
from fairmultimodal_tpu.train.simple import SimpleTrainConfig

TASK = "mechanical_ventilation"


@pytest.fixture(scope="module")
def frames():
    return make_common_frames(n_patients=96, n_lab_features=8, seed=11)


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


def _check_single(out):
    assert set(out["metrics"]) == {TASK}
    assert np.isfinite(out["metrics"][TASK]["f1"])
    assert set(out["eddi"]) >= {TASK}
    # The trained model really is single-headed: test logits are [N, 1].
    prep = out["prep"]
    assert prep.bundle.labels.shape[1] == 1


def test_behrt_single_task(frames):
    from fairmultimodal_tpu.pipelines import (
        BEHRTPipelineConfig,
        run_behrt_experiment,
    )

    s, u = frames
    cfg = BEHRTPipelineConfig(train=_tiny_train(loss="bce", optimizer="adamw",
                                                grad_clip=1.0),
                              hidden_size=32, task=TASK)
    out = run_behrt_experiment(s, u, cfg, verbose=False)
    _check_single(out)
    # Param tree has exactly one classifier head, named for the task.
    heads = [k for k in out["best_params"]["combined"] if
             k.startswith("classifier_")]
    assert heads == ["classifier_mech"]


def test_sigmoid_fusion_single_task(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        SigmoidFusionPipelineConfig,
        run_sigmoid_fusion_experiment,
    )

    s, u = frames
    cfg = SigmoidFusionPipelineConfig(
        train=_tiny_train(), hidden_size=32, demo_layers=1, demo_heads=2,
        lab_layers=1, lab_heads=2, text_batch_size=16, task=TASK)
    out = run_sigmoid_fusion_experiment(s, u, cfg, text_encoder=tiny_text,
                                        verbose=False)
    _check_single(out)


def test_eddi_fusion_single_task(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        EDDIFusionPipelineConfig,
        run_eddi_fusion_experiment,
    )

    s, u = frames
    cfg = EDDIFusionPipelineConfig(
        train=_tiny_train(), hidden_size=32, demo_layers=1, demo_heads=2,
        lab_layers=1, lab_heads=2, text_batch_size=16, task=TASK)
    out = run_eddi_fusion_experiment(s, u, cfg, text_encoder=tiny_text,
                                     verbose=False)
    assert set(out["metrics"]) == {TASK}
    assert np.isfinite(out["metrics"][TASK]["f1"])
    assert out["weights"].shape == (1, 3)


def test_average_fusion_single_task(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        AverageFusionPipelineConfig,
        run_average_fusion_experiment,
    )

    s, u = frames
    cfg = AverageFusionPipelineConfig(
        train=_tiny_train(), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, text_batch_size=16, save_artifacts=False,
        task=TASK)
    out = run_average_fusion_experiment(s, u, cfg, text_encoder=tiny_text,
                                        verbose=False)
    _check_single(out)


def test_text_only_single_task(frames, tiny_text):
    from fairmultimodal_tpu.pipelines import (
        TextOnlyPipelineConfig,
        run_text_only_experiment,
    )

    s, u = frames
    cfg = TextOnlyPipelineConfig(train=_tiny_train(loss="focal", gamma=2.0,
                                                   optimizer="adamw"),
                                 text_batch_size=16, task=TASK)
    out = run_text_only_experiment(s, u, cfg, text_encoder=tiny_text,
                                   verbose=False)
    _check_single(out)


def test_text_only_readmission_single_task(frames, tiny_text):
    """The Uni_label_run readmission-only text regime
    (FinalCode/Uni_label_run/Readmit_Biobert_2(1).py): a one-logit text
    model trained on readmission_within_30d."""
    from fairmultimodal_tpu.pipelines import (
        TextOnlyPipelineConfig,
        run_text_only_experiment,
    )

    s, u = frames
    cfg = TextOnlyPipelineConfig(train=_tiny_train(loss="focal", gamma=2.0,
                                                   optimizer="adamw"),
                                 text_batch_size=16, task="readmission")
    out = run_text_only_experiment(s, u, cfg, text_encoder=tiny_text,
                                   verbose=False)
    assert set(out["metrics"]) == {"readmission"}
    assert np.isfinite(out["metrics"]["readmission"]["f1"])
    prep = out["prep"]
    assert prep.bundle.labels.shape[1] == 1
    # The label really is the readmission column (merge order preserves the
    # structured frame's row order for these synthetic one-note-per-row
    # frames, so direct comparison is valid).
    import pandas as pd

    merged = pd.merge(s, u.drop(columns=[c for c in u.columns
                                         if c not in ("subject_id", "hadm_id")
                                         and not c.startswith("note_")]),
                      on=["subject_id", "hadm_id"], how="inner")
    has_note = merged[[c for c in merged.columns if c.startswith("note_")]] \
        .apply(lambda r: any(isinstance(v, str) and v.strip() for v in r), axis=1)
    expect = merged.loc[has_note, "readmission_within_30d"].to_numpy()
    np.testing.assert_array_equal(prep.bundle.labels[:, 0], expect)


def test_resolve_task_errors():
    from fairmultimodal_tpu.pipelines.common import (
        resolve_task,
        task_label_columns,
    )

    names, idx = resolve_task(None)
    assert len(names) == 3 and idx is None
    names, idx = resolve_task("los")
    assert names == ("los",) and idx == 1
    with pytest.raises(ValueError):
        resolve_task("ventilation")   # CLI name, not the TASKS name
    # readmission is opt-in (text-only pipeline), label from its own column.
    with pytest.raises(ValueError):
        resolve_task("readmission")
    names, idx = resolve_task("readmission", allow_extra=True)
    assert names == ("readmission",) and idx is None
    assert task_label_columns("readmission") == ("readmission_within_30d",)
    assert task_label_columns("los") is None
    assert task_label_columns(None) is None
