"""CLI surface tests: the README-documented shared flags parse, dispatch to
every pipeline, and a tiny synthetic run executes end-to-end."""

import os
import sys

import pytest

from fairmultimodal_tpu.cli import build_parser, main
from fairmultimodal_tpu.cli.main import PIPELINES, _SCRIPT_TO_PIPELINE


def test_parser_accepts_documented_flags():
    p = build_parser()
    args = p.parse_args(["fame", "--task", "mortality", "--epochs", "3",
                         "--bsz", "8", "--lr", "1e-4", "--lambda", "0.5",
                         "--beta", "0.9", "--seed", "7",
                         "--mimic_dir", "/x", "--out_dir", "/y"])
    assert args.pipeline == "fame"
    assert args.epochs == 3 and args.bsz == 8
    assert args.lr == pytest.approx(1e-4)
    assert args.lambda_edd == pytest.approx(0.5)
    assert args.beta == pytest.approx(0.9)


def test_all_numbered_scripts_have_wrappers():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scripts = os.listdir(os.path.join(here, "scripts"))
    for num, pipeline in _SCRIPT_TO_PIPELINE.items():
        assert any(s.startswith(num + "_") for s in scripts), num
        assert pipeline in PIPELINES


def test_default_pipeline_wrapper_parsing():
    p = build_parser(default_pipeline="behrt")
    args = p.parse_args(["--epochs", "1"])
    assert args.pipeline == "behrt"


@pytest.mark.slow
def test_cli_end_to_end_synthetic_behrt(tmp_path):
    rc = main(["behrt", "--synthetic", "64", "--tiny", "--epochs", "1",
               "--bsz", "32", "--out_dir", str(tmp_path), "--quiet"])
    assert rc == 0


@pytest.mark.slow
def test_cli_readmission_single_task(tmp_path):
    """--single_task --task readmission: the Uni_label_run text-only regime
    (Readmit_Biobert_2(1).py) is runnable from the CLI."""
    rc = main(["bioclinicalbert", "--synthetic", "64", "--tiny",
               "--epochs", "1", "--bsz", "32", "--single_task",
               "--task", "readmission", "--out_dir", str(tmp_path),
               "--quiet"])
    assert rc == 0


def test_cli_readmission_guards():
    # readmission without --single_task: 3-headed models have no such head.
    with pytest.raises(SystemExit):
        main(["fame", "--task", "readmission", "--synthetic", "16", "--tiny"])
    # readmission on a non-text pipeline is not a reference regime.
    with pytest.raises(SystemExit):
        main(["behrt", "--task", "readmission", "--single_task",
              "--synthetic", "16", "--tiny"])


@pytest.mark.slow
def test_cli_data_pipeline_synthetic(tmp_path):
    rc = main(["data", "--synthetic", "16", "--out_dir", str(tmp_path),
               "--quiet"])
    assert rc == 0
    assert (tmp_path / "final_structured_common.csv").exists()
    assert (tmp_path / "final_unstructured_common.csv").exists()


def test_predict_flags_parse():
    p = build_parser()
    args = p.parse_args(["predict", "--params", "best.npz",
                         "--thresholds", "thr.json",
                         "--predictions_csv", "out.csv"])
    assert args.pipeline == "predict"
    assert args.params == "best.npz"
    assert args.predictions_csv == "out.csv"


def test_predict_requires_params():
    with pytest.raises(SystemExit):
        main(["predict", "--synthetic", "8", "--quiet"])


def test_mesh_flag_parses_and_rejects_non_fame():
    p = build_parser()
    assert p.parse_args(["fame", "--mesh", "8"]).mesh == "8"
    assert p.parse_args(["fame", "--mesh", "4x2"]).mesh == "4x2"
    with pytest.raises(SystemExit):
        main(["behrt", "--mesh", "8", "--synthetic", "8", "--quiet"])


@pytest.mark.slow
def test_cli_fame_under_dp_mesh(tmp_path):
    """fame --mesh 8 on the virtual 8-device mesh: the full pipeline
    (DeviceLoader parked under the mesh, shard_map train/eval steps,
    psum'd dyn-weight scan) runs from the CLI."""
    rc = main(["fame", "--synthetic", "64", "--tiny", "--epochs", "1",
               "--bsz", "16", "--mesh", "8", "--out_dir", str(tmp_path),
               "--quiet"])
    assert rc == 0


@pytest.mark.slow
def test_cli_fame_checkpoint_dir_resume(tmp_path, capsys):
    """--checkpoint_dir saves per-epoch orbax checkpoints and a second run
    against the same directory auto-resumes (fit() restores the latest step
    instead of starting over — mechanics pinned in test_checkpoint.py)."""
    ckpt = tmp_path / "ckpts"
    args = ["fame", "--synthetic", "64", "--tiny", "--epochs", "2",
            "--bsz", "16", "--out_dir", str(tmp_path),
            "--checkpoint_dir", str(ckpt)]
    assert main(args + ["--quiet"]) == 0
    steps = sorted(os.listdir(ckpt))
    assert steps, "no checkpoints written"
    # Second invocation resumes from the latest epoch rather than
    # retraining: the restore message is printed and no checkpoint dir is
    # rewritten (a silent from-scratch retrain would re-save every step —
    # rc==0 alone cannot distinguish the two).
    mtimes = {s: os.stat(os.path.join(ckpt, s)).st_mtime_ns for s in steps}
    capsys.readouterr()
    assert main(args) == 0
    out = capsys.readouterr().out
    assert "Resumed from checkpoint at epoch 2" in out, out[-2000:]
    assert sorted(os.listdir(ckpt)) == steps
    assert {s: os.stat(os.path.join(ckpt, s)).st_mtime_ns
            for s in steps} == mtimes
