"""--tensorboard event export (utils/tblog.py).

The reference README promises a ``--tensorboard`` CLI switch and an
``outputs/tensorboard`` directory (README.md:179-189,228-234) with no
implementation behind it (SURVEY §0); ours writes real tfevents files.
These tests drive ``log_run`` on a pipeline-shaped output dict and read the
events back with tensorboard's own EventAccumulator.
"""

import glob
import os

import pytest

pytest.importorskip("torch.utils.tensorboard")
from tensorboard.backend.event_processing.event_accumulator import (  # noqa: E402
    EventAccumulator,
)

from fairmultimodal_tpu.utils.tblog import log_run  # noqa: E402


class _FakeTrainer:
    tracked_dynamic_weights = {
        "mortality": [[0.4, 0.3, 0.3], [0.5, 0.25, 0.25]],
        "los": [[1 / 3] * 3, [0.2, 0.4, 0.4]],
    }


def _pipeline_out():
    return {
        "history": [
            {"epoch": 1, "train_loss": 1.5, "train_bce": 1.2,
             "val_loss": 1.4, "lr": 1e-3},
            {"epoch": 2, "train_loss": 1.1, "train_bce": 0.9,
             "val_loss": 1.2, "lr": 1e-4},
        ],
        "metrics": {
            "mortality": {"aucroc": 0.91, "auprc": 0.55, "f1": 0.4,
                          "recall (TPR)": 0.5, "optimal_threshold": 0.35},
            "los": {"aucroc": 0.88},
        },
        "fairness": {
            "mortality": {
                "age": {"avg_tpr_diff": 0.02, "avg_fpr_diff": 0.01,
                        "eo_metric": 0.015},
                "overall_eo": 0.015,
            },
        },
        "eddi": {
            "mortality": {
                "attribute_eddi": {"age": 0.03, "ethnicity": 0.02},
                "subgroups": {"age": {"15-29": 0.01}},
                "combined_eddi": 0.021,
            },
        },
        "trainer": _FakeTrainer(),
    }


def _load_tags(log_dir):
    acc = EventAccumulator(log_dir)
    acc.Reload()
    return acc


def test_log_run_writes_curves_and_final_blocks(tmp_path):
    log_dir = str(tmp_path / "tb")
    assert log_run(_pipeline_out(), log_dir, verbose=False) == log_dir
    assert glob.glob(os.path.join(log_dir, "events.out.tfevents.*"))

    acc = _load_tags(log_dir)
    tags = set(acc.Tags()["scalars"])
    # per-epoch curves, stepped by epoch
    assert {"train/train_loss", "train/val_loss", "train/lr",
            "train/train_bce"} <= tags
    loss = acc.Scalars("train/train_loss")
    assert [e.step for e in loss] == [1, 2]
    assert loss[1].value == pytest.approx(1.1)
    # dynamic-weight trajectories
    assert "dynamic_weights/mortality/demo" in tags
    demo = acc.Scalars("dynamic_weights/mortality/demo")
    assert [e.step for e in demo] == [1, 2]
    assert demo[1].value == pytest.approx(0.5)
    # final blocks; unsafe tag characters ('recall (TPR)') sanitized
    assert "test/mortality/aucroc" in tags
    assert "test/mortality/recall__TPR_" in tags
    assert "fairness/mortality/age/eo_metric" in tags
    assert "eddi/mortality/combined" in tags
    assert acc.Scalars("eddi/mortality/combined")[0].value == pytest.approx(
        0.021)
    assert "eddi/mortality/age" in tags
    # string-keyed subgroup maps flatten too ('15-29' stays literal)
    assert "eddi/mortality/subgroups/age/15-29" in tags


def test_log_run_skips_non_dict_and_missing_history(tmp_path):
    assert log_run(0, str(tmp_path / "a"), verbose=False) is None
    # predict/data-shaped dicts (no history/metrics) still succeed
    out = log_run({"probs": None}, str(tmp_path / "b"), verbose=False)
    assert out == str(tmp_path / "b")
