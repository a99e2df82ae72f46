"""5-run-average protocol (paper Table 3, reference README.md:215-224):
metric extraction, mean±std aggregation, table formatting, CLI --runs."""

from __future__ import annotations

import csv
import math
import os

import numpy as np
import pytest

from fairmultimodal_tpu.eval.aggregate import (aggregate_runs,
                                               extract_table3_row,
                                               format_table3, write_runs_csv)


def _fake_out(auroc, auprc, eddi, eo, task="mortality"):
    return {
        "metrics": {task: {"aucroc": auroc, "auprc": auprc, "f1": 0.5}},
        "eddi": {task: {"combined_eddi": eddi},
                 "overall_combined_eddi": eddi},
        "fairness": {task: {"overall_eo": eo}},
    }


def test_extract_table3_row_scales_to_percent():
    row = extract_table3_row(_fake_out(0.94, 0.82, 0.0044, 0.0425))
    assert row["mortality"]["auroc"] == pytest.approx(0.94)
    assert row["mortality"]["auprc"] == pytest.approx(0.82)
    assert row["mortality"]["eddi_pct"] == pytest.approx(0.44)
    assert row["mortality"]["eo_pct"] == pytest.approx(4.25)


def test_extract_skips_non_task_entries():
    out = _fake_out(0.9, 0.8, 0.01, 0.02)
    out["metrics"]["history"] = [1, 2, 3]          # non-dict entry
    row = extract_table3_row(out)
    assert set(row) == {"mortality"}


def test_aggregate_mean_std_and_nan_dropping():
    rows = [
        {"mortality": {"auroc": 0.90, "auprc": 0.80}},
        {"mortality": {"auroc": 0.94, "auprc": float("nan")}},
        {"mortality": {"auroc": 0.92, "auprc": 0.84}},
    ]
    agg = aggregate_runs(rows)
    m = agg["mortality"]
    assert m["auroc"]["mean"] == pytest.approx(0.92)
    assert m["auroc"]["std"] == pytest.approx(np.std([0.90, 0.94, 0.92]))
    assert m["auroc"]["n"] == 3
    # NaN dropped per metric, not per run.
    assert m["auprc"]["n"] == 2
    assert m["auprc"]["mean"] == pytest.approx(0.82)


def test_format_table3_shape():
    rows = [extract_table3_row(_fake_out(0.94, 0.82, 0.0044, 0.0425)),
            extract_table3_row(_fake_out(0.96, 0.84, 0.0052, 0.0475))]
    table = format_table3(aggregate_runs(rows), 2)
    assert "| Task" in table and "AUROC" in table and "EDDI %" in table
    assert "Mortality" in table
    assert "0.95 ± 0.01" in table      # auroc mean ± std
    # Missing metric renders as '-', not a crash.
    table2 = format_table3(aggregate_runs(
        [{"mortality": {"auroc": 0.9}}]), 1)
    assert "| - |" in table2 or "| - " in table2


def test_write_runs_csv_roundtrip(tmp_path):
    rows = [extract_table3_row(_fake_out(0.9, 0.8, 0.01, 0.02)),
            extract_table3_row(_fake_out(0.94, 0.84, 0.02, 0.04))]
    agg = aggregate_runs(rows)
    path = os.path.join(str(tmp_path), "runs_aggregate.csv")
    write_runs_csv(path, rows, seeds=[42, 43], agg=agg)
    with open(path) as f:
        recs = list(csv.DictReader(f))
    per_run = [r for r in recs if r["run"] not in ("mean", "std")]
    assert {r["seed"] for r in per_run} == {"42", "43"}
    mean_auroc = [r for r in recs
                  if r["run"] == "mean" and r["metric"] == "auroc"]
    assert len(mean_auroc) == 1
    assert float(mean_auroc[0]["value"]) == pytest.approx(0.92)
    # repr round-trip keeps full float precision
    vals = [float(r["value"]) for r in per_run if r["metric"] == "auroc"]
    assert vals == [0.9, 0.94]


@pytest.mark.slow
def test_cli_runs_protocol_behrt(tmp_path, capsys):
    """--runs 2 on a tiny synthetic BEHRT: aggregate block printed, CSV
    written with two distinct seeds."""
    from fairmultimodal_tpu.cli import main

    rc = main(["behrt", "--synthetic", "48", "--tiny", "--epochs", "1",
               "--bsz", "32", "--runs", "2", "--out_dir", str(tmp_path)])
    assert rc == 0
    outtext = capsys.readouterr().out
    assert "Aggregate over 2 runs (seeds 42..43)" in outtext
    assert "AUROC" in outtext and "EDDI %" in outtext
    csv_path = os.path.join(str(tmp_path), "runs_aggregate.csv")
    assert os.path.exists(csv_path)
    with open(csv_path) as f:
        recs = list(csv.DictReader(f))
    seeds = {r["seed"] for r in recs if r["run"] not in ("mean", "std")}
    assert seeds == {"42", "43"}
    # mean/std rows exist for each task x metric
    assert any(r["run"] == "mean" for r in recs)
    assert all(math.isfinite(float(r["value"])) for r in recs
               if r["run"] == "mean" and r["metric"] == "auroc")


def test_cli_runs_rejects_data_pipeline():
    from fairmultimodal_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["data", "--synthetic", "8", "--runs", "2"])
