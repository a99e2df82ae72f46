"""08_multimodal_eddi_fusion: EDDI-weighted logit-level fusion pipeline
(08_multimodal_eddi_fusion.py).

Nine single-logit heads (3 tasks x 3 modalities) over 6L/6H demo-BERT + lab +
text encoders (08:261-346).  Per batch, each modality's EDDI is computed on
the *current batch* with gender as the sensitive attribute (08:470-474) and
the fused logit is ``sum_m w_m * logit_m`` with
``w_m = w_prev + beta * (eddi_max - eddi_m)``, beta=0.3 (08:348-402).
The loss is per-task FocalLoss(gamma=1, pos_weight = clip-10 neg/pos over
the whole filtered cohort, 08:846-851) plus the reference's regularizer
``mean((mort_logit - 1)^2)`` (08:486-487).

Weight persistence protocol (08:861-916): ``old_eddi_weights`` is held FIXED
for every batch of an epoch (train, val, and eval all receive the same
``old_eddi_weights`` argument); each batch fuses with the *effective* weights
``old + beta * (eddi_max - eddi_m)`` recomputed fresh from that batch's EDDI,
and the persistent weights are replaced once per epoch by the LAST validation
batch's effective weights (08:911-916) — skipped on the early-stop epoch,
because the reference ``break``s before the update (08:908-909).  The base
value when no old weights exist yet is 0.33 (08:389-392), not 1/3.

TPU design: the whole per-batch computation — batch EDDI from hard
predictions via one-hot segment sums, weight nudge, fused logits, focal
loss, backward — is ONE jitted step.  The reference's per-batch
``compute_eddi`` host roundtrip (numpy on CPU per batch) disappears; the
fixed per-epoch weights ride through the step as a [3, 3] array input.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import pandas as pd

from fairmultimodal_tpu.eval.report import eddi_report, evaluate_multitask
from fairmultimodal_tpu.models.baselines import EDDIFusionFull
from fairmultimodal_tpu.models.text import TextEncoder
from fairmultimodal_tpu.pipelines.common import (
    TASK_SHORT,
    prepare_experiment,
    resolve_task,
)
from fairmultimodal_tpu.train.loop import EarlyStopper, PlateauScheduler
from fairmultimodal_tpu.train.simple import SimpleTrainConfig

from fairmultimodal_tpu.utils.rng import threefry_key

__all__ = ["EDDIFusionPipelineConfig", "run_eddi_fusion_experiment",
           "batch_eddi_weights", "make_eddi_fusion_loss"]

_KEYS = ("demo_dummy_ids", "demo_attn_mask", "age_ids", "gender_ids",
         "ethnicity_ids", "insurance_ids", "lab_features", "text_embedding")


@dataclasses.dataclass
class EDDIFusionPipelineConfig:
    train: SimpleTrainConfig = dataclasses.field(default_factory=lambda: SimpleTrainConfig(
        lr=1e-4, num_epochs=20, batch_size=16, loss="focal", gamma=1.0,
        optimizer="adam"))
    beta: float = 0.3                  # 08:355
    reg_weight: float = 1.0            # the (mort_logit - 1)^2 term
    text_model: str = "emilyalsentzer/Bio_ClinicalBERT"
    text_max_length: int = 128
    text_batch_size: int = 32
    test_size: float = 0.20
    val_size: float = 0.05
    split_seed: int = 42
    hidden_size: int = 768
    demo_layers: int = 6               # 08:261-271
    demo_heads: int = 6
    lab_layers: int = 2
    lab_heads: int = 8
    dtype: str = "float32"
    # Single-task regime (FinalCode/Mechanical_Ventilation/
    # 07_Multimodal_EDDI_Fusion.py).  The (logit - 1)^2 regularizer then
    # applies to the single task's fused logit (it is the mortality quirk
    # 08:486-487 in the 3-task regime); set reg_weight=0 to drop it.
    task: Optional[str] = None


def batch_eddi_weights(tm_logits, labels, gender_ids, w_prev, beta: float,
                       weight=None, num_groups: int = 2):
    """Jit-safe per-batch EDDI weight update (08:348-402).

    Args:
      tm_logits: [B, T, M] task-modality logits.
      labels: [B, T]; gender_ids: [B]; w_prev: [T, M]; weight: [B] mask.

    Returns (w_new [T, M], eddi [T, M]).
    """
    import jax
    import jax.numpy as jnp

    probs = jax.nn.sigmoid(tm_logits)
    preds = (probs > 0.5).astype(jnp.float32)               # [B, T, M]
    y = labels[:, :, None]                                   # [B, T, 1]
    err = (preds != y).astype(jnp.float32)                   # [B, T, M]
    onehot = (gender_ids[:, None] == jnp.arange(num_groups)[None, :]).astype(
        jnp.float32)                                         # [B, G]
    if weight is not None:
        onehot = onehot * weight[:, None]
    counts = jnp.sum(onehot, axis=0)                         # [G]
    err_sums = jnp.einsum("btm,bg->tmg", err, onehot)        # [T, M, G]
    total = jnp.maximum(jnp.sum(counts), 1.0)
    overall = jnp.sum(err_sums, axis=-1) / total             # [T, M]
    present = counts > 0
    er_g = err_sums / jnp.maximum(counts, 1.0)[None, None, :]
    denom = jnp.maximum(overall, 1.0 - overall)              # max(err, 1-err)
    d = jnp.where(present[None, None, :],
                  (er_g - overall[..., None]) / jnp.maximum(denom[..., None], 1e-12),
                  0.0)
    n_present = jnp.maximum(jnp.sum(present), 1)
    eddi = jnp.sqrt(jnp.sum(d ** 2, axis=-1)) / n_present    # [T, M]
    e_max = jnp.max(eddi, axis=1, keepdims=True)
    w_new = w_prev + beta * (e_max - eddi)
    w_new = jax.lax.stop_gradient(w_new)
    return w_new, eddi


def make_eddi_fusion_loss(model, cfg: "EDDIFusionPipelineConfig",
                          pos_weight=None):
    """The 08 joint loss as a standalone callable (train_step semantics,
    08:454-490): per-batch EDDI weight nudge from DETACHED modality logits,
    ``fused = sum_m w_m * logit_m``, per-task FocalLoss(gamma, pos_weight)
    + ``reg_weight * mean((fused_mort - 1)^2)``.

    Module-level (rather than inline in the runner) so the end-to-end torch
    oracle (`tests/test_e2e_torch_parity.py`) exercises the exact loss the
    pipeline trains with.  Returns ``loss_fn(params, batch, w_prev, rng,
    train) -> (loss, (w_new, fused))``.
    """
    import jax.numpy as jnp

    from fairmultimodal_tpu.ops.losses import focal_loss

    pw = None if pos_weight is None else jnp.asarray(pos_weight, jnp.float32)

    def loss_fn(params, batch, w_prev, rng, train):
        out = model.apply({"params": params}, batch["model_inputs"],
                          deterministic=not train,
                          rngs={"dropout": rng} if train else None)
        tm = out["task_modality_logits"]                      # [B, T, M]
        # Effective fusion weights for THIS batch: w_prev + beta*(gap), with
        # w_prev fixed for the whole epoch (08:389-392,454-468).  w_new is
        # returned so the caller can persist the LAST val batch's weights.
        w_new, eddi = batch_eddi_weights(
            tm, batch["labels"], batch["model_inputs"]["gender_ids"],
            w_prev, cfg.beta, weight=batch["weight"])
        fused = jnp.einsum("btm,tm->bt", tm, w_new)
        per = focal_loss(fused, batch["labels"], gamma=cfg.train.gamma,
                         pos_weight=pw, reduction="none")
        w = batch["weight"][:, None]
        denom = jnp.maximum(jnp.sum(w), 1.0)
        loss = jnp.sum(jnp.sum(per * w, axis=0) / denom)
        # Reference quirk (08:486-487): (mortality fused logit - 1)^2 mean.
        reg = jnp.sum(((fused[:, 0] - 1.0) ** 2) * batch["weight"]) / denom
        return loss + cfg.reg_weight * reg, (w_new, fused)

    return loss_fn


def run_eddi_fusion_experiment(
    structured: pd.DataFrame,
    unstructured: pd.DataFrame,
    config: Optional[EDDIFusionPipelineConfig] = None,
    text_encoder: Optional[TextEncoder] = None,
    verbose: bool = True,
) -> Dict:
    import jax
    import jax.numpy as jnp
    import optax

    cfg = config or EDDIFusionPipelineConfig()
    task_names, task_index = resolve_task(cfg.task)
    prep = prepare_experiment(
        structured, unstructured, model_keys=_KEYS,
        batch_size=cfg.train.batch_size, text_encoder=text_encoder,
        text_model=cfg.text_model, text_max_length=cfg.text_max_length,
        text_batch_size=cfg.text_batch_size, test_size=cfg.test_size,
        val_size=cfg.val_size, split_seed=cfg.split_seed,
        split_method="iterstrat", pos_weight_mode="neg_over_pos_clip10_all",
        seed=cfg.train.seed, task_index=task_index, verbose=verbose)

    n_ages, n_gen, n_eth, n_ins = prep.vocab_sizes()
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = EDDIFusionFull(
        num_ages=n_ages, num_genders=n_gen, num_ethnicities=n_eth,
        num_insurances=n_ins, lab_token_count=prep.bundle.num_lab_features,
        hidden_size=cfg.hidden_size, demo_layers=cfg.demo_layers,
        demo_heads=cfg.demo_heads, lab_layers=cfg.lab_layers,
        lab_heads=cfg.lab_heads,
        # 3-task default keeps EDDIFusionFull's own task tuple (long
        # "mortality" head names) so per-path init RNG and trained params
        # stay loadable into a default-constructed model; only the
        # single-task regime maps to the short head names.
        tasks=(EDDIFusionFull.tasks if task_index is None
               else tuple(TASK_SHORT[t] for t in task_names)), dtype=dtype)

    tx = optax.adam(cfg.train.lr)
    # Typed threefry: a raw PRNGKey follows the process-global default
    # impl, so results would depend on whether an unsafe_rbg trainer ran
    # earlier in the process (utils/rng.py).
    rng = threefry_key(cfg.train.seed)
    loss_fn = make_eddi_fusion_loss(model, cfg, pos_weight=prep.pos_weight)

    @jax.jit
    def train_step(params, opt_state, batch, w_prev, rng):
        (loss, (w_new, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, w_prev, rng, True)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, w_new

    @jax.jit
    def eval_step(params, batch, w_prev):
        loss, (w_new, fused) = loss_fn(params, batch, w_prev,
                                       threefry_key(0), False)
        return loss, w_new, fused

    def put(b):
        return jax.tree_util.tree_map(jnp.asarray, b)

    example = put(next(iter(prep.loaders["train"])))
    rng, init_rng = jax.random.split(rng)
    params = model.init(init_rng, example["model_inputs"])["params"]
    opt_state = tx.init(params)
    # Reference base weight when no old weights exist yet is 0.33 (08:389-392).
    weights = jnp.full((len(task_names), 3), 0.33, jnp.float32)

    sched = PlateauScheduler(cfg.train.lr, cfg.train.scheduler_factor,
                             cfg.train.scheduler_patience)
    stopper = EarlyStopper(cfg.train.patience)
    best_params = jax.tree_util.tree_map(jnp.copy, params)
    history = []
    for epoch in range(cfg.train.num_epochs):
        # `weights` (= old_eddi_weights) stays FIXED for every batch of this
        # epoch; each step fuses with weights + beta*(batch EDDI gap).
        # Loss scalars stay on device until the epoch ends (a float() per
        # step blocks dispatch on a tunnel round-trip each); the final
        # float64 host sum matches per-step accumulation to the last ulp
        # (np.sum is pairwise — logging-only difference).
        losses = []
        for batch in prep.loaders["train"]:
            rng, step_rng = jax.random.split(rng)
            params, opt_state, loss, _ = train_step(
                params, opt_state, put(batch), weights, step_rng)
            losses.append(loss)
        nb = len(losses)
        total = (float(np.sum(np.asarray(jnp.stack(losses)), dtype=np.float64))
                 if nb else 0.0)
        val_losses, last_val_weights = [], None
        for batch in prep.loaders["val"]:
            vl, w_new, _ = eval_step(params, put(batch), weights)
            val_losses.append(vl)
            last_val_weights = w_new
        val_loss = (float(np.mean(np.asarray(jnp.stack(val_losses)),
                                  dtype=np.float64))
                    if val_losses else float("inf"))
        if verbose:
            print(f"[Epoch {epoch + 1}] Train Loss: {total / max(nb, 1):.4f} "
                  f"| Val Loss: {val_loss:.4f}")
        _ = sched.step(val_loss)
        stop = stopper.step(val_loss)
        if stopper.improved:
            best_params = jax.tree_util.tree_map(jnp.copy, params)
        history.append({"epoch": epoch + 1, "train_loss": total / max(nb, 1),
                        "val_loss": val_loss,
                        "weights": np.asarray(weights).tolist()})
        if stop:
            # The reference breaks BEFORE the weight update (08:908-916), so
            # the early-stop epoch does not persist its val-batch weights.
            if verbose:
                print("Early stopping triggered.")
            break
        if last_val_weights is not None:
            weights = last_val_weights
            if verbose:
                print("Updated old EDDI weights for next epoch:",
                      np.asarray(weights).round(4).tolist())

    logits_all, labels_all = [], []
    sens = {"age": [], "ethnicity": [], "insurance": []}
    for batch in prep.loaders["test"]:
        _, _, fused = eval_step(best_params, put(batch), weights)
        keep = batch["weight"] > 0
        logits_all.append(np.asarray(fused)[keep])
        labels_all.append(batch["labels"][keep])
        for a, k in (("age", "age_ids"), ("ethnicity", "ethnicity_ids"),
                     ("insurance", "insurance_ids")):
            sens[a].append(batch["model_inputs"][k][keep])
    logits = np.concatenate(logits_all)
    labels = np.concatenate(labels_all)
    sensitive = {k: np.concatenate(v) for k, v in sens.items()}
    metrics, fairness = evaluate_multitask(logits, labels, sensitive, 0.5,
                                           task_names=task_names,
                                           verbose=verbose)
    eddi = eddi_report(logits, labels, sensitive, 0.5, task_names=task_names,
                       verbose=verbose)
    return {"metrics": metrics, "fairness": fairness, "eddi": eddi,
            "history": history, "best_params": best_params,
            "weights": np.asarray(weights), "prep": prep}
