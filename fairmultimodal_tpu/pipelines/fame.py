"""Full FAME experiment pipeline (reference: 10_FAME.py run_experiment,
:606-918; 05_FPM.py is the same engine with lambda_edd=1.0 and a subsample).

Stages: load cohort CSVs -> featurize -> batched text precompute -> splits ->
fixed-shape loaders -> FAMETrainer.fit (jitted, dynamic fairness weights) ->
threshold calibration -> test evaluation + EDDI report -> artifacts
(best params, dynamic-weights CSV, extracted vectors npz, tracked npy).

Reference bug handled here: ``10_FAME.py:744-755`` indexes the full-cohort
tensors with indices *relative to the train_val subframe*, silently training
on the wrong rows.  Default mode maps everything to absolute indices;
``reference_compat=True`` reproduces the buggy indexing for log-parity runs.
"""

from __future__ import annotations

import dataclasses
import datetime
import os
import time
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from fairmultimodal_tpu import TASKS
from fairmultimodal_tpu.data.featurize import (
    FeatureBundle,
    assemble_features,
    compute_pos_weights,
)
from fairmultimodal_tpu.data.loader import BatchIterator
from fairmultimodal_tpu.data.split import multilabel_stratified_split
from fairmultimodal_tpu.eval.report import eddi_report, evaluate_multitask
from fairmultimodal_tpu.models.fusion import FAMEModel
from fairmultimodal_tpu.models.text import TextEncoder, encode_note_chunks
from fairmultimodal_tpu.train.calibrate import calibrate_thresholds
from fairmultimodal_tpu.train.loop import FAMETrainer, TrainConfig
from fairmultimodal_tpu.utils.checkpoint import save_params_npz

__all__ = ["FAMEPipelineConfig", "run_fame_experiment", "build_model_arrays",
           "make_loaders"]


@dataclasses.dataclass
class FAMEPipelineConfig:
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    text_model: str = "emilyalsentzer/Bio_ClinicalBERT"
    text_max_length: int = 512
    # Chunk-level device batch for the precompute.  128 quarters the number
    # of dispatches/pulls vs 32 (measured 621 vs 412 chunks/s sync on the
    # axon v5e).  Chunks are row-independent and pad rows are sliced off,
    # but XLA may tile the batched matmuls differently per batch size, so
    # embeddings can differ in the last bits across batch choices (like any
    # retiling); downstream metrics are insensitive to this.
    text_batch_size: int = 128
    test_size: float = 0.20
    val_size: float = 0.05
    split_seed: int = 42
    out_dir: str = "."
    head: Optional[int] = None        # 05_FPM-style .head(n) subsample
    reference_compat: bool = False
    # 10_FAME.py:283-285 quirk: the mortality row's dynamic weights scale all
    # three tasks' fusions.  False = per-task weight rows (the fixed mode).
    reference_weight_compat: bool = True
    # Make a missing pretrained Bio_ClinicalBERT fatal instead of the loud
    # random-init fallback (real-data runs should set this).
    require_hf_weights: bool = False
    # Print a per-phase wall-clock block at the end (off by default: the
    # golden-transcript tests diff stdout line-by-line).  Timings are always
    # returned in the result dict under "timings".
    timing: bool = False
    mesh: Optional[object] = None
    # Park split arrays in device memory and gather batches on device
    # (data/device.py).  Bit-identical batches to the host path; False
    # restores the BatchIterator+PrefetchLoader pipeline.
    device_data: bool = True
    save_artifacts: bool = True
    checkpoint_dir: Optional[str] = None   # enables orbax per-epoch resume
    # Tiny-model overrides for CPU smoke runs (None = reference sizes).
    hidden_size: int = 768
    demo_layers: int = 12
    demo_heads: int = 12
    lab_layers: int = 2
    lab_heads: int = 8
    fusion_hidden: int = 512
    dtype: str = "float32"


def build_model_arrays(bundle: FeatureBundle) -> Dict[str, np.ndarray]:
    """FeatureBundle -> flat dict of model input arrays (10_FAME:714-723)."""
    n = bundle.num_patients
    return {
        "demo_dummy_ids": np.zeros((n, 1), np.int32),
        "demo_attn_mask": np.ones((n, 1), np.int32),
        "age_ids": bundle.age_codes.astype(np.int32),
        "gender_ids": bundle.gender_codes.astype(np.int32),
        "ethnicity_ids": bundle.ethnicity_codes.astype(np.int32),
        "insurance_ids": bundle.insurance_codes.astype(np.int32),
        "lab_features": bundle.labs.astype(np.float32),
        "text_embedding": bundle.text_embeddings.astype(np.float32),
    }


class _NestingLoader:
    """Wraps a flat BatchIterator into the trainer's nested batch schema."""

    _MODEL_KEYS = ("demo_dummy_ids", "demo_attn_mask", "age_ids", "gender_ids",
                   "ethnicity_ids", "insurance_ids", "lab_features",
                   "text_embedding")

    def __init__(self, it: BatchIterator):
        self.it = it

    def __len__(self):
        return len(self.it)

    def __iter__(self):
        for flat in self.it:
            yield {
                "model_inputs": {k: flat[k] for k in self._MODEL_KEYS},
                "labels": flat["labels"],
                "weight": flat["weight"],
            }


def make_loaders(arrays: Dict[str, np.ndarray], labels: np.ndarray,
                 idx: Dict[str, np.ndarray], batch_size: int, seed: int = 42,
                 device_data: bool = True, mesh=None):
    """Per-split loaders.  ``device_data=True`` parks each split's arrays in
    device memory once and gathers batches on device (``data.device``) —
    bit-identical batches to the host ``BatchIterator`` path, but the host
    sends a [B] index vector per step instead of the full batch (at reference
    scale this host path was ~2/3 of the measured epoch time)."""
    loaders = {}
    for split, indices in idx.items():
        flat = {k: v[indices] for k, v in arrays.items()}
        split_labels = labels[indices]
        if device_data:
            from fairmultimodal_tpu.data.device import DeviceLoader

            loaders[split] = DeviceLoader(
                flat, split_labels, batch_size,
                shuffle=(split == "train"), seed=seed, mesh=mesh)
        else:
            flat["labels"] = split_labels
            loaders[split] = _NestingLoader(BatchIterator(
                flat, batch_size, shuffle=(split == "train"), seed=seed))
    return loaders


def run_fame_experiment(
    structured: pd.DataFrame,
    unstructured: pd.DataFrame,
    config: Optional[FAMEPipelineConfig] = None,
    text_encoder: Optional[TextEncoder] = None,
    verbose: bool = True,
) -> Dict:
    """Train + evaluate full FAME. Returns metrics/fairness/eddi dict."""
    import jax.numpy as jnp

    cfg = config or FAMEPipelineConfig()
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    timings: Dict[str, float] = {}
    _t0 = time.perf_counter()

    def _mark(phase: str):
        nonlocal _t0
        now = time.perf_counter()
        timings[phase] = timings.get(phase, 0.0) + (now - _t0)
        _t0 = now

    if cfg.head:
        structured = structured.head(cfg.head)
        unstructured = unstructured.head(cfg.head)

    bundle = assemble_features(structured, unstructured)
    _mark("featurize")
    if verbose:
        print(f"After filtering, number of rows: {bundle.num_patients}")
        print(f"Number of lab feature columns: {bundle.num_lab_features}")

    # Text precompute (frozen encoder), batched.
    if text_encoder is None:
        text_encoder = TextEncoder.from_pretrained(
            cfg.text_model, dtype=dtype,
            require_weights=cfg.require_hf_weights, mesh=cfg.mesh)
    bundle.text_embeddings = encode_note_chunks(
        text_encoder, bundle.note_chunks, max_length=cfg.text_max_length,
        batch_size=cfg.text_batch_size)
    if verbose:
        print("Aggregated text embeddings shape:", bundle.text_embeddings.shape)
    _mark("text_precompute")

    # Two-stage multilabel stratified split (10_FAME:733-742).
    train_val_idx, test_idx = multilabel_stratified_split(
        bundle.labels, cfg.test_size, seed=cfg.split_seed)
    rel_train, rel_val = multilabel_stratified_split(
        bundle.labels[train_val_idx], cfg.val_size, seed=cfg.split_seed)
    if cfg.reference_compat:
        # Reproduce 10_FAME.py:744-755: relative indices applied to the
        # full-cohort tensors.
        train_idx, val_idx = rel_train, rel_val
    else:
        train_idx, val_idx = train_val_idx[rel_train], train_val_idx[rel_val]
    if verbose:
        print(f"Train size: {len(train_idx)}, Validation size: {len(val_idx)}, "
              f"Test size: {len(test_idx)}")

    arrays = build_model_arrays(bundle)
    loaders = make_loaders(arrays, bundle.labels,
                           {"train": train_idx, "val": val_idx, "test": test_idx},
                           cfg.train.batch_size, seed=cfg.train.seed,
                           device_data=cfg.device_data, mesh=cfg.mesh)

    pos_weight = compute_pos_weights(bundle.labels[train_idx])
    n_ages, n_genders, n_eth, n_ins = bundle.vocab_sizes()
    if verbose:
        print("NUM_AGES:", n_ages, "NUM_GENDERS:", n_genders,
              "NUM_ETHNICITIES:", n_eth, "NUM_INSURANCES:", n_ins)
        print("NUM_LAB_FEATURES (tokens):", bundle.num_lab_features)

    model = FAMEModel(
        num_ages=n_ages, num_genders=n_genders, num_ethnicities=n_eth,
        num_insurances=n_ins, lab_token_count=bundle.num_lab_features,
        text_embed_size=bundle.text_embeddings.shape[1],
        hidden_size=cfg.hidden_size, demo_layers=cfg.demo_layers,
        demo_heads=cfg.demo_heads, lab_layers=cfg.lab_layers,
        lab_heads=cfg.lab_heads, fusion_hidden=cfg.fusion_hidden,
        reference_weight_compat=cfg.reference_weight_compat, dtype=dtype)

    os.makedirs(cfg.out_dir, exist_ok=True)
    trainer = FAMETrainer(
        model, cfg.train, pos_weight, rngs_seed=cfg.train.seed, mesh=cfg.mesh,
        dynamic_weights_csv=os.path.join(cfg.out_dir, "dynamic_weights_per_epoch1.csv")
        if cfg.save_artifacts else None)

    _mark("split_and_loaders")
    example = next(iter(loaders["train"]))
    params = trainer.init_params(example)
    checkpointer = None
    if cfg.checkpoint_dir:
        from fairmultimodal_tpu.utils.checkpoint import Checkpointer

        checkpointer = Checkpointer(cfg.checkpoint_dir)
    best_params, history = trainer.fit(params, loaders["train"], loaders["val"],
                                       verbose=verbose,
                                       checkpointer=checkpointer)
    _mark("train")

    # Threshold calibration on validation (10_FAME:868).
    _, val_logits, val_labels = trainer.validate(best_params, loaders["val"])
    thresholds = calibrate_thresholds(1 / (1 + np.exp(-val_logits)), val_labels)
    if verbose:
        print("\nOptimal thresholds from validation:")
        for k, v in thresholds.items():
            print(f"{k}: {v:.2f}")

    test_out = trainer.predict_logits(best_params, loaders["test"])
    sensitive = {"age": test_out["age"], "ethnicity": test_out["ethnicity"],
                 "insurance": test_out["insurance"]}
    metrics, fairness = evaluate_multitask(
        test_out["logits"], test_out["labels"], sensitive, thresholds,
        verbose=verbose)
    eddi = eddi_report(test_out["logits"], test_out["labels"], sensitive,
                       thresholds, verbose=verbose)
    _mark("calibrate_and_eval")

    if verbose:
        print("\n--- Final Evaluation Metrics on Test Set ---")
        for task, m in metrics.items():
            print(f"\nOutcome: {task}")
            print("  AUROC     : {:.4f}".format(m["aucroc"]))
            print("  AUPRC     : {:.4f}".format(m["auprc"]))
            print("  F1 Score  : {:.4f}".format(m["f1"]))
            print("  Recall    : {:.4f}".format(m["recall (TPR)"]))
            print("  Precision : {:.4f}".format(m["precision"]))
            print("  TPR       : {:.4f}".format(m["TPR"]))
            print("  FPR       : {:.4f}".format(m["fpr"]))
            print("  Optimal Thresh: {:.2f}".format(m["optimal_threshold"]))
            print("  Overall EO fairness metric: {:.3f}".format(
                fairness[task]["overall_eo"]))

    artifacts = {}
    if cfg.save_artifacts:
        ts = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        best_path = os.path.join(cfg.out_dir, f"best_model_{ts}.npz")
        save_params_npz(best_path, best_params, metadata={
            "model": {
                "num_ages": n_ages, "num_genders": n_genders,
                "num_ethnicities": n_eth, "num_insurances": n_ins,
                "lab_token_count": bundle.num_lab_features,
                "text_embed_size": int(bundle.text_embeddings.shape[1]),
                "hidden_size": cfg.hidden_size, "demo_layers": cfg.demo_layers,
                "demo_heads": cfg.demo_heads, "lab_layers": cfg.lab_layers,
                "lab_heads": cfg.lab_heads, "fusion_hidden": cfg.fusion_hidden,
                "reference_weight_compat": cfg.reference_weight_compat,
            },
            "thresholds": {k: float(v) for k, v in thresholds.items()},
            "dynamic_weights": trainer.dynamic_weights.tolist(),
        })
        np.save(os.path.join(cfg.out_dir, "tracked_dynamic_weights.npy"),
                trainer.tracked_dynamic_weights, allow_pickle=True)
        np.save(os.path.join(cfg.out_dir, "tracked_sigmoid_weights.npy"),
                np.array(trainer.tracked_sigmoid_weights))
        # extract_and_save_vectors parity (10_FAME.py:559-604): the reference
        # npz keys are gated_vectors [N, 768], fusion_pre_relu_vectors
        # [N, 512], labels, age, ethnicity, insurance; `logits` is an extra.
        vectors = trainer.extract_vectors(best_params, loaders["test"])
        np.savez(os.path.join(cfg.out_dir, f"extracted_vectors_{ts}.npz"),
                 logits=test_out["logits"], **vectors)
        artifacts = {"best_model": best_path}
        if verbose:
            print("Saved best model to", best_path)
    _mark("artifacts")

    timings["total"] = sum(timings.values())
    if cfg.timing and verbose:
        print("\n--- Phase wall-clock (s) ---")
        for phase, secs in timings.items():
            print(f"  {phase:<20s} {secs:9.2f}")

    return {
        "timings": timings,
        "metrics": metrics,
        "fairness": fairness,
        "eddi": eddi,
        "thresholds": thresholds,
        "history": history,
        "artifacts": artifacts,
        "best_params": best_params,
        "trainer": trainer,
        "bundle": bundle,
        "splits": {"train": train_idx, "val": val_idx, "test": test_idx},
    }
