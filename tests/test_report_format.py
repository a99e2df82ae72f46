"""Printed metric-block format parity.

The reference's only regression oracle is its committed run logs (SURVEY §4)
— so the *shape* of our printed evaluation blocks is part of the public
surface.  These tests pin the line patterns evaluate_multitask/eddi_report
emit against the reference's block structure (10_FAME.py:887-915 and the
committed ``.log`` files)."""

import io
import re
from contextlib import redirect_stdout

import numpy as np

from fairmultimodal_tpu.eval.report import eddi_report, evaluate_multitask


def _fake_eval(n=200, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 2, (n, 3))
    labels = (rng.random((n, 3)) < 0.3).astype(float)
    sensitive = {
        "age": rng.integers(0, 4, n),
        "ethnicity": rng.integers(0, 5, n),
        "insurance": rng.integers(0, 6, n),
    }
    return logits, labels, sensitive


def test_eo_block_lines():
    logits, labels, sensitive = _fake_eval()
    buf = io.StringIO()
    with redirect_stdout(buf):
        evaluate_multitask(logits, labels, sensitive, 0.5, verbose=True)
    out = buf.getvalue()
    # One block per (task, attribute) with group TPR/FPR lines.
    assert out.count("Fairness metrics for sensitive attribute:") == 9
    assert re.search(r"Group \d+: TPR = \d\.\d{3}, FPR = \d\.\d{3}", out)
    assert "Average TPR difference across groups:" in out
    assert "EO fairness metric (average of TPR and FPR differences):" in out
    for task in ("mortality", "los", "mechanical_ventilation"):
        assert f"Overall EO fairness metric for outcome {task}:" in out


def test_eddi_block_lines():
    logits, labels, sensitive = _fake_eval(seed=1)
    buf = io.StringIO()
    with redirect_stdout(buf):
        eddi_report(logits, labels, sensitive, 0.5, verbose=True)
    out = buf.getvalue()
    assert "--- Sensitive Subgroup EDDI Statistics ---" in out
    for attr in ("Age", "Ethnicity", "Insurance"):
        assert f"{attr} EDDI:" in out
    assert out.count("\n Combined EDDI:") == 3
    assert "--- Overall Combined EDDI across outcomes ---" in out
    assert "Overall Combined EDDI:" in out


def test_metrics_dict_schema():
    logits, labels, sensitive = _fake_eval(seed=2)
    metrics, fairness = evaluate_multitask(logits, labels, sensitive, 0.5,
                                           verbose=False)
    for task, m in metrics.items():
        assert set(m) == {"aucroc", "auprc", "f1", "recall (TPR)", "TPR",
                          "precision", "fpr", "optimal_threshold"}
        assert fairness[task]["overall_eo"] >= 0.0
        for attr in ("age", "ethnicity", "insurance"):
            assert set(fairness[task][attr]) == {"avg_tpr_diff",
                                                 "avg_fpr_diff", "eo_metric"}


def test_plots_write_pngs(tmp_path):
    from fairmultimodal_tpu.eval.plots import (
        disparity_bars,
        jitter_plot,
        training_curves,
    )

    rng = np.random.default_rng(0)
    p1 = jitter_plot(rng.random(100), rng.integers(0, 2, 100),
                     rng.integers(0, 4, 100), str(tmp_path / "j.png"))
    p2 = disparity_bars({0: 0.1, 1: -0.05, 2: 0.2}, str(tmp_path / "d.png"))
    p3 = training_curves([{"epoch": 1, "train_loss": 1.0, "val_loss": 0.9},
                          {"epoch": 2, "train_loss": 0.8, "val_loss": 0.85}],
                         str(tmp_path / "t.png"))
    import os
    for p in (p1, p2, p3):
        assert p is not None and os.path.getsize(p) > 0


def test_named_subgroups_in_eddi_print():
    logits, labels, sensitive = _fake_eval(seed=3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        eddi_report(logits, labels, sensitive, 0.5, verbose=True)
    out = buf.getvalue()
    for name in ("15-29", "70-89", "Black", "White", "Medicare", "Self Pay"):
        assert f"'{name}'" in out, name
