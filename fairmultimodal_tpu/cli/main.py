"""The shared CLI (README.md:145-189 surface, implemented for real).

Usage:

    python -m fairmultimodal_tpu.cli <pipeline> [flags]
    python scripts/10_FAME.py [flags]            # numbered wrappers

Pipelines: data, behrt, bioclinicalbert, dfc, advdebias, fpm, fairehrclp,
average, eddi, sigmoid, fame.

Common flags (the README-documented set):
  --task {mortality,los,ventilation,all}   evaluation focus (default all;
                                           models are always 3-headed like
                                           the reference)
  --epochs N  --bsz N  --lr F  --lambda F  --beta F  --seed N
  --mimic_dir DIR   raw MIMIC-III csv.gz directory (data pipeline)
  --data_dir DIR    directory holding the two *_common.csv tables
  --out_dir DIR     artifact directory
  --synthetic N     run on N synthetic patients instead of real CSVs
  --bf16            bfloat16 compute (TPU)
  --tiny            tiny model geometry (CPU smoke)
  --tensorboard     tfevents export (curves, dynamic weights, final blocks)
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from typing import Optional

def _ensure_compile_cache() -> None:
    """Persistent XLA compile cache for every CLI-launched process (bench.py
    does the same).  On this platform a fresh process otherwise re-pays
    multi-minute TPU compiles of the train step and text-encoder buckets;
    the cache is keyed on HLO+flags so it is always safe.  setdefault: an
    explicit user value wins.  Called from main() AFTER parse_args — before
    any pipeline imports jax, but late enough that --help/usage-error paths
    never touch the environment or pay the jax import (advisor r4).  The
    default dir is per-user to avoid permission collisions on shared /tmp.
    """
    from fairmultimodal_tpu.cachedir import default_compile_cache_dir

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          default_compile_cache_dir())
    if "jax" in sys.modules:
        # jax snapshots env at import; push through the live config instead.
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])

PIPELINES = ("data", "behrt", "bioclinicalbert", "dfc", "advdebias", "fpm",
             "fairehrclp", "average", "eddi", "sigmoid", "fame", "predict",
             "legacy-behrt", "legacy-eddi")

_SCRIPT_TO_PIPELINE = {
    "00": "data", "01": "behrt", "02": "bioclinicalbert", "03": "dfc",
    "04": "advdebias", "05": "fpm", "06": "fairehrclp", "07": "average",
    "08": "eddi", "09": "sigmoid", "10": "fame",
}


def build_parser(default_pipeline: Optional[str] = None) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="fairmultimodal-tpu",
        description="TPU-native FAME: fairness-aware multimodal EHR models.")
    if default_pipeline is None:
        p.add_argument("pipeline", choices=PIPELINES)
    else:
        p.set_defaults(pipeline=default_pipeline)
    p.add_argument("--task",
                   choices=["mortality", "los", "ventilation", "readmission",
                            "all"],
                   default="all",
                   help="evaluation focus, or the label for --single_task; "
                        "'readmission' is single-task-only (the "
                        "Uni_label_run text-only regime, Readmit_Biobert_2)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--bsz", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lambda", dest="lambda_edd", type=float, default=None,
                   help="EDDI loss weight (FAME/FPM)")
    p.add_argument("--beta", type=float, default=None,
                   help="dynamic-weight step size")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--runs", type=int, default=1, metavar="N",
                   help="repeat the experiment over N seeds (seed, seed+1, "
                        "...) and print the paper's Table-3-shaped "
                        "mean±std AUROC/AUPRC/EDDI%%/EO%% block "
                        "(5-run-average protocol, reference README.md:"
                        "215-224); per-run values land in "
                        "<out_dir>/runs_aggregate.csv")
    p.add_argument("--mimic_dir", default=".")
    p.add_argument("--use_native", choices=("auto", "on", "off"),
                   default="auto",
                   help="data pipeline: C++ streaming aggregator/chunker "
                        "for the big event tables (auto = use when it "
                        "builds; on = require; off = pandas). --timing "
                        "prints the chosen path + rows/sec per table")
    p.add_argument("--data_dir", default=".")
    p.add_argument("--out_dir", default="./outputs")
    p.add_argument("--head", type=int, default=None,
                   help="subsample first N patients (02/05 reference behavior)")
    p.add_argument("--synthetic", type=int, default=None, metavar="N",
                   help="use N synthetic patients instead of real CSVs")
    p.add_argument("--synthetic_labs", type=int, default=32,
                   help="lab feature columns in the synthetic cohort "
                        "(549 = reference geometry, 10_FAME NUM_LAB_FEATURES)")
    p.add_argument("--synthetic_chunks", type=int, default=3,
                   help="note-chunk columns in the synthetic cohort")
    p.add_argument("--mesh", default=None, metavar="DATA[xMODEL]",
                   help="train over a jax device mesh (fame/fpm): '8' = "
                        "8-way pure data parallelism (shard_map path; Pallas "
                        "kernels stay enabled per shard — the recommended "
                        "multi-chip mode), '4x2' = 4-way data x 2-way tensor "
                        "parallelism (GSPMD; on real TPU the Pallas kernels "
                        "are auto-disabled with a warning — recorded "
                        "decision, see ops/gates.py)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny geometry for CPU smoke runs")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--reference_compat", action="store_true",
                   help="reproduce every documented per-script reference "
                        "quirk from one switch: the relative-index split "
                        "(10_FAME.py:744-755), 02's .head(1000) subsample "
                        "(02:405), and 09's 70-90 age bucket edge (09:57-67)")
    p.add_argument("--single_task", action="store_true",
                   help="train a single-label model on --task (the "
                        "Mechanical_Ventilation generation's regime) instead "
                        "of a 3-task model with a focused report; supported "
                        "by behrt/bioclinicalbert/average/sigmoid/eddi")
    p.add_argument("--timing", action="store_true",
                   help="print a per-phase wall-clock block at the end "
                        "(fame/fpm)")
    p.add_argument("--tensorboard", action="store_true",
                   help="write TensorBoard event files (per-epoch train/val "
                        "curves, FAME dynamic-weight trajectories, final "
                        "test/fairness/EDDI blocks) under "
                        "<out_dir>/tensorboard/<pipeline>_<ts>/ — the "
                        "reference README promises this flag "
                        "(README.md:179-189,228-234) but never implements it")
    p.add_argument("--checkpoint_dir", default=None,
                   help="FAME/FPM: save an orbax checkpoint per epoch and "
                        "AUTO-RESUME from the latest one when the directory "
                        "already holds checkpoints (bit-identical resume: "
                        "params, opt state, dropout RNG stream, tracked "
                        "histories, loader shuffle phase)")
    p.add_argument("--text_cache", default=None, metavar="DIR",
                   help="persistent text-embedding cache: the frozen-encoder "
                        "precompute (the reference's hottest loop, redone "
                        "every run) is stored content-addressed by encoder "
                        "weights + note text + settings and reused across "
                        "runs/pipelines (sets FMTPU_TEXT_CACHE)")
    p.add_argument("--require_hf_weights", action="store_true",
                   help="fail instead of random-init fallback when the "
                        "pretrained Bio_ClinicalBERT cannot be loaded "
                        "(recommended for any real-data run)")
    # Serving (predict pipeline)
    p.add_argument("--params", default=None,
                   help="exported best_model_*.npz for `predict`")
    p.add_argument("--thresholds", default=None,
                   help="JSON file of calibrated per-task thresholds")
    p.add_argument("--predictions_csv", default="predictions.csv")
    return p


def _load_frames(args):
    import pandas as pd

    if args.synthetic:
        # Synthetic smoke runs never need HF downloads; skip the retry backoff.
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
        from fairmultimodal_tpu.data.synthetic import make_common_frames

        return make_common_frames(n_patients=args.synthetic,
                                  n_lab_features=args.synthetic_labs,
                                  n_note_chunks=args.synthetic_chunks,
                                  seed=args.seed)
    s = pd.read_csv(os.path.join(args.data_dir, "final_structured_common.csv"))
    u = pd.read_csv(os.path.join(args.data_dir, "final_unstructured_common.csv"))
    return s, u


def _apply_overrides(train_cfg, args):
    if args.epochs is not None:
        train_cfg.num_epochs = args.epochs
    if args.bsz is not None:
        train_cfg.batch_size = args.bsz
    if args.lr is not None:
        train_cfg.lr = args.lr
    train_cfg.seed = args.seed
    return train_cfg


_TINY = dict(hidden_size=64, text_batch_size=16)



_TASK_KEY = {"mortality": "mortality", "los": "los",
             "ventilation": "mechanical_ventilation",
             "readmission": "readmission"}


_SINGLE_TASK_PIPELINES = ("behrt", "bioclinicalbert", "average", "sigmoid",
                          "eddi")


def _apply_single_task(cfg, args):
    """--single_task: train a one-label model on --task (the
    Mechanical_Ventilation generation's regime, FinalCode/Mechanical_
    Ventilation/*) instead of focusing the 3-task report."""
    if getattr(args, "single_task", False):
        if args.task == "all":
            raise SystemExit("--single_task requires --task "
                             "mortality|los|ventilation|readmission")
        if args.task == "readmission" and args.pipeline != "bioclinicalbert":
            # The only readmission-only run in the reference is the
            # Uni_label_run text model (Readmit_Biobert_2(1).py).
            raise SystemExit("--task readmission is the Uni_label_run "
                             "text-only regime; use the bioclinicalbert "
                             "pipeline")
        cfg.task = _TASK_KEY[args.task]
    return cfg


def _finish_run(out, args) -> int:
    """Post-run hooks shared by every training pipeline: optional
    TensorBoard export (--tensorboard), then the --task report focus."""
    if getattr(args, "_collect", None) is not None and isinstance(out, dict):
        args._collect.append(out)   # --runs N aggregation hook
    if getattr(args, "tensorboard", False) and isinstance(out, dict):
        import time as _time

        from fairmultimodal_tpu.utils.tblog import log_run

        log_run(out, os.path.join(
            args.out_dir, "tensorboard",
            f"{args.pipeline}_{_time.strftime('%Y%m%d-%H%M%S')}"),
            verbose=not args.quiet)
    return _report_task_focus(out, args)


def _report_task_focus(out, args) -> int:
    """--task focus: re-print the selected task's metric block after the
    full run (without --single_task, models are 3-headed like the reference;
    the flag narrows the report, matching the vent-only legacy pipelines'
    output surface)."""
    if getattr(args, "single_task", False):
        return 0   # metrics are already single-task
    if args.task != "all" and isinstance(out, dict) and "metrics" in out:
        key = _TASK_KEY[args.task]
        m = out["metrics"].get(key)
        if m and not args.quiet:
            print(f"\n=== Selected task: {key} ===")
            for k, v in m.items():
                print(f"  {k}: {v:.4f}" if isinstance(v, float) else f"  {k}: {v}")
    return 0

def _build_mesh(args):
    """--mesh 'DATA[xMODEL]' -> jax Mesh (validated against live devices)."""
    if not getattr(args, "mesh", None):
        return None
    from fairmultimodal_tpu.parallel import get_mesh

    parts = str(args.mesh).lower().split("x")
    try:
        data = int(parts[0])
        model = int(parts[1]) if len(parts) > 1 else 1
    except ValueError:
        raise SystemExit(f"--mesh {args.mesh!r}: expected 'N' or 'NxM'")
    return get_mesh(data=data, model=model)


def _run_multi(args) -> int:
    """--runs N: the paper's 5-run-average protocol (README.md:215-224).

    Repeats the pipeline over seeds (seed, seed+1, ..., seed+N-1) — the seed
    feeds param init, loader shuffling AND --synthetic cohort generation —
    then prints the Table-3-shaped mean±std block and writes every per-run
    value to <out_dir>/runs_aggregate.csv."""
    import copy

    from fairmultimodal_tpu.eval.aggregate import (aggregate_runs,
                                                   extract_table3_row,
                                                   format_table3,
                                                   write_runs_csv)

    if args.pipeline in ("data", "predict"):
        raise SystemExit(f"--runs is for training pipelines, not "
                         f"{args.pipeline!r}")
    rows, seeds = [], []
    for r in range(args.runs):
        run_args = copy.copy(args)
        run_args.runs = 1
        run_args.seed = args.seed + r
        run_args._collect = collected = []
        if not args.quiet:
            print(f"\n===== Run {r + 1}/{args.runs} (seed {run_args.seed}) "
                  f"=====")
        rc = run_pipeline(run_args)
        if rc != 0:
            return rc
        if collected:
            rows.append(extract_table3_row(collected[-1]))
            seeds.append(run_args.seed)
    if not rows:
        raise SystemExit("--runs: no run produced a metrics dict")
    agg = aggregate_runs(rows)
    table = format_table3(agg, len(rows))
    print(f"\n===== Aggregate over {len(rows)} runs "
          f"(seeds {seeds[0]}..{seeds[-1]}) =====")
    print(table)
    os.makedirs(args.out_dir, exist_ok=True)
    csv_path = os.path.join(args.out_dir, "runs_aggregate.csv")
    write_runs_csv(csv_path, rows, seeds, agg)
    print(f"Per-run metrics written to {csv_path}")
    return 0


def run_pipeline(args) -> int:
    if getattr(args, "runs", 1) > 1:
        return _run_multi(args)
    verbose = not args.quiet
    name = args.pipeline
    if getattr(args, "text_cache", None):
        # encode_note_chunks reads this env default, so every pipeline's
        # text precompute (and any nested API call) sees the cache.
        os.environ["FMTPU_TEXT_CACHE"] = args.text_cache
    if getattr(args, "single_task", False) and name not in _SINGLE_TASK_PIPELINES:
        raise SystemExit(f"--single_task is not supported by {name!r} "
                         f"(supported: {', '.join(_SINGLE_TASK_PIPELINES)})")
    if args.task == "readmission" and not getattr(args, "single_task", False):
        raise SystemExit("--task readmission requires --single_task (the "
                         "3-headed models have no readmission head)")
    if getattr(args, "mesh", None) and name not in ("fame", "fpm"):
        raise SystemExit("--mesh is supported for fame/fpm only")

    if name == "legacy-behrt":
        # Sequence BEHRT (FinalCode/New/02_BEHRT.py) — structured-only, its
        # own multi-admission data shape (make_admission_frame for
        # --synthetic; final_structured_common.csv otherwise).
        import pandas as pd

        from fairmultimodal_tpu.pipelines import (
            LegacyBEHRTPipelineConfig,
            run_legacy_behrt_experiment,
        )

        if args.synthetic:
            from fairmultimodal_tpu.data.synthetic import make_admission_frame

            frame = make_admission_frame(n_subjects=args.synthetic,
                                         seed=args.seed)
        else:
            frame = pd.read_csv(os.path.join(args.data_dir,
                                             "final_structured_common.csv"))
        cfg = LegacyBEHRTPipelineConfig(
            reference_compat=args.reference_compat)
        _apply_overrides(cfg.train, args)
        if args.tiny:
            cfg.hidden_size, cfg.num_hidden_layers = 64, 1
            cfg.num_attention_heads = 2
        out = run_legacy_behrt_experiment(frame, cfg, verbose=verbose)
        return _finish_run(out, args)

    if name == "data":
        from fairmultimodal_tpu.data.etl import run_etl

        if args.synthetic:
            import tempfile

            from fairmultimodal_tpu.data.synthetic import write_raw_mimic

            tmp = tempfile.mkdtemp(prefix="mimic_syn_")
            write_raw_mimic(tmp, n_subjects=args.synthetic, seed=args.seed)
            args.mimic_dir = tmp
        use_native = {"auto": None, "on": True, "off": False}[args.use_native]
        run_etl(args.mimic_dir, args.out_dir, use_native=use_native,
                timing=getattr(args, "timing", False))
        return 0

    s, u = _load_frames(args)
    os.makedirs(args.out_dir, exist_ok=True)
    dtype = "bfloat16" if args.bf16 else "float32"

    # With --require_hf_weights the encoder is built here so a missing
    # checkpoint fails fast, before any featurization work.
    text_encoder = None
    if getattr(args, "require_hf_weights", False) and name != "behrt":
        from fairmultimodal_tpu.models.text import TextEncoder

        text_encoder = TextEncoder.from_pretrained(require_weights=True)

    if name == "predict":
        import json as _json

        from fairmultimodal_tpu.pipelines.inference import run_fame_inference

        if not args.params:
            raise SystemExit("predict requires --params <best_model.npz>")
        thresholds = None
        if args.thresholds:
            with open(args.thresholds) as f:
                thresholds = _json.load(f)
        model_kwargs = ({"hidden_size": 64, "demo_layers": 1, "demo_heads": 2,
                         "lab_layers": 1, "lab_heads": 2, "fusion_hidden": 32}
                        if args.tiny else None)
        run_fame_inference(
            s, u, args.params, thresholds=thresholds,
            model_kwargs=model_kwargs, text_encoder=text_encoder,
            out_csv=os.path.join(args.out_dir, args.predictions_csv),
            verbose=verbose)
        return 0

    def tinyize(cfg):
        if not args.tiny:
            return cfg
        for k, v in _TINY.items():
            if hasattr(cfg, k):
                setattr(cfg, k, v)
        for attr in ("num_hidden_layers", "demo_layers", "lab_layers"):
            if hasattr(cfg, attr):
                setattr(cfg, attr, 1 if attr != "lab_layers" else 1)
        for attr in ("num_attention_heads", "demo_heads", "lab_heads"):
            if hasattr(cfg, attr):
                setattr(cfg, attr, 2)
        if hasattr(cfg, "text_max_length"):
            cfg.text_max_length = min(cfg.text_max_length, 64)
        return cfg

    if name in ("fame", "fpm"):
        from fairmultimodal_tpu.pipelines import (
            FAMEPipelineConfig,
            run_fame_experiment,
        )
        from fairmultimodal_tpu.train.loop import TrainConfig

        tc = _apply_overrides(TrainConfig(), args)
        if args.lambda_edd is not None:
            tc.lambda_edd = args.lambda_edd
        elif name == "fpm":
            tc.lambda_edd = 1.0          # 05_FPM.py:920
        if args.beta is not None:
            tc.beta = args.beta
        cfg = FAMEPipelineConfig(train=tc, out_dir=args.out_dir, dtype=dtype,
                                 head=args.head or (1000 if name == "fpm" else None),
                                 reference_compat=args.reference_compat,
                                 require_hf_weights=args.require_hf_weights,
                                 timing=args.timing,
                                 checkpoint_dir=args.checkpoint_dir,
                                 mesh=_build_mesh(args))
        if args.tiny:
            cfg.hidden_size, cfg.demo_layers, cfg.demo_heads = 64, 1, 2
            cfg.lab_layers, cfg.lab_heads, cfg.fusion_hidden = 1, 2, 32
            cfg.text_max_length = 64
        out = run_fame_experiment(s, u, cfg, text_encoder=text_encoder,
                                 verbose=verbose)
        return _finish_run(out, args)

    if name == "behrt":
        from fairmultimodal_tpu.pipelines import (
            BEHRTPipelineConfig,
            run_behrt_experiment,
        )

        cfg = BEHRTPipelineConfig(dtype=dtype)
        _apply_overrides(cfg.train, args)
        tinyize(cfg)
        _apply_single_task(cfg, args)
        out = run_behrt_experiment(s, u, cfg, verbose=verbose)
        return _finish_run(out, args)

    if name == "bioclinicalbert":
        from fairmultimodal_tpu.pipelines import (
            TextOnlyPipelineConfig,
            run_text_only_experiment,
        )

        # 02 always subsamples to 1000 patients (02:405); reproduced under
        # --reference_compat (explicit --head wins either way).
        cfg = TextOnlyPipelineConfig(
            head=args.head if args.head is not None
            else (1000 if args.reference_compat else None))
        _apply_overrides(cfg.train, args)
        tinyize(cfg)
        _apply_single_task(cfg, args)
        out = run_text_only_experiment(s, u, cfg, text_encoder=text_encoder,
                                      verbose=verbose)
        return _finish_run(out, args)

    if name == "dfc":
        from fairmultimodal_tpu.pipelines import DfCPipelineConfig, run_dfc_experiment

        cfg = DfCPipelineConfig(dtype=dtype)
        _apply_overrides(cfg.train, args)
        tinyize(cfg)
        out = run_dfc_experiment(s, u, cfg, text_encoder=text_encoder,
                                verbose=verbose)
        return _finish_run(out, args)

    if name == "advdebias":
        from fairmultimodal_tpu.pipelines import (
            AdvDebiasPipelineConfig,
            run_adv_debias_experiment,
        )

        cfg = AdvDebiasPipelineConfig(dtype=dtype, out_dir=args.out_dir)
        _apply_overrides(cfg.train, args)
        tinyize(cfg)
        if args.tiny:
            cfg.stage2_grid = {"learning_rate": [1e-3], "num_iters": [100],
                               "num_nodes": [16], "num_nodes_adv": [8],
                               "dropout_rate": [0.1], "alpha": [1.0]}
        out = run_adv_debias_experiment(s, u, cfg, text_encoder=text_encoder,
                                       verbose=verbose)
        return _finish_run(out, args)

    if name == "fairehrclp":
        from fairmultimodal_tpu.pipelines import (
            FairEHRCLPPipelineConfig,
            run_fairehr_clp_experiment,
        )

        cfg = FairEHRCLPPipelineConfig(dtype=dtype)
        _apply_overrides(cfg.train, args)
        tinyize(cfg)
        out = run_fairehr_clp_experiment(s, u, cfg, text_encoder=text_encoder,
                                        verbose=verbose)
        return _finish_run(out, args)

    if name == "average":
        from fairmultimodal_tpu.pipelines import (
            AverageFusionPipelineConfig,
            run_average_fusion_experiment,
        )

        cfg = AverageFusionPipelineConfig(dtype=dtype, out_dir=args.out_dir)
        _apply_overrides(cfg.train, args)
        tinyize(cfg)
        _apply_single_task(cfg, args)
        out = run_average_fusion_experiment(s, u, cfg, text_encoder=text_encoder,
                                           verbose=verbose)
        return _finish_run(out, args)

    if name == "eddi":
        from fairmultimodal_tpu.pipelines import (
            EDDIFusionPipelineConfig,
            run_eddi_fusion_experiment,
        )

        cfg = EDDIFusionPipelineConfig(dtype=dtype)
        _apply_overrides(cfg.train, args)
        if args.beta is not None:
            cfg.beta = args.beta
        tinyize(cfg)
        if args.tiny:
            cfg.demo_layers, cfg.demo_heads = 1, 2
        _apply_single_task(cfg, args)
        out = run_eddi_fusion_experiment(s, u, cfg, text_encoder=text_encoder,
                                        verbose=verbose)
        return _finish_run(out, args)

    if name == "legacy-eddi":
        from fairmultimodal_tpu.pipelines import (
            LegacyEDDIPipelineConfig,
            run_legacy_eddi_experiment,
        )

        cfg = LegacyEDDIPipelineConfig(
            dtype=dtype, reference_compat=args.reference_compat)
        _apply_overrides(cfg.train, args)
        tinyize(cfg)
        if args.tiny:
            cfg.demo_layers, cfg.demo_heads = 1, 2
        out = run_legacy_eddi_experiment(s, u, cfg, text_encoder=text_encoder,
                                         verbose=verbose)
        return _finish_run(out, args)

    if name == "sigmoid":
        from fairmultimodal_tpu.pipelines import (
            SigmoidFusionPipelineConfig,
            run_sigmoid_fusion_experiment,
        )

        cfg = SigmoidFusionPipelineConfig(
            dtype=dtype, reference_compat=args.reference_compat)
        _apply_overrides(cfg.train, args)
        tinyize(cfg)
        _apply_single_task(cfg, args)
        out = run_sigmoid_fusion_experiment(s, u, cfg, text_encoder=text_encoder,
                                           verbose=verbose)
        return _finish_run(out, args)

    raise SystemExit(f"unknown pipeline {name!r}")


def main(argv=None, default_pipeline: Optional[str] = None) -> int:
    args = build_parser(default_pipeline).parse_args(argv)
    _ensure_compile_cache()
    return run_pipeline(args)


if __name__ == "__main__":
    sys.exit(main())
