"""Adversarial debiasing engine (04_AdvDebias.py:559-789, stage 2).

A predictor MLP (X -> hidden -> 1, sigmoid) is trained jointly against an
adversary MLP that tries to recover the (binarized) sensitive attribute from
``(y_hat, y)``; the headline combined objective is

    L_pred - alpha * L_adv + L_pred / (L_adv + 1e-8)        (04:720)

**Exact update semantics (04:724-731), replicated here and pinned by the
end-to-end torch oracle**: the reference calls
``adv_loss_train.backward(retain_graph=True)`` and then
``combined_loss_train.backward()`` with NO ``detach()`` anywhere and no
``zero_grad`` in between, so both passes accumulate into BOTH models'
``.grad`` buffers; both ``optimizer.step()`` calls then consume the summed
buffers at the OLD parameters.  Net effect: each network takes one Adam step
on ``d(L_adv + combined)/d(own params)`` —

- predictor grad = ∇_p combined **+ ∇_p L_adv** (the adversary loss leaks
  into the predictor through the un-detached ``y_hat`` input), and
- adversary grad = ``(1 - alpha - L_pred/(L_adv+1e-8)^2) · ∇_a L_adv`` (the
  combined loss's two adversary-dependent terms stack on top of the plain
  ``L_adv`` step) — with ``alpha=1`` the adversary actually *ascends* its
  own loss whenever ``L_pred/(L_adv+eps)^2 > 0``.

This is not textbook min-max, but it IS what 04 trains; a clean alternating
scheme diverges from the reference trajectory from iteration 1 (caught by
``tests/test_e2e_torch_parity.py::test_adv_debias_step_matches_torch``).
Both grads are computed in one ``jax.value_and_grad(argnums=(0, 1))`` of the
summed scalar, so the min-max update is still ONE jitted XLA program per
iteration.  Dropout is live in the reference's training forward (the torch
modules are never put in eval mode) and is live here; the reference also
leaves dropout on for its per-iteration *validation* loss, which we do NOT
replicate (validation runs deterministic — documented deviation, PARITY.md).

The reference runs full-batch Adam for ``num_iters`` iterations over an
``itertools.product`` hyperparameter grid (04:569-585), after 1:20
case/control matching (04:677-692) and SMOTEENN resampling (04:694-702).
SMOTEENN runs host-side via imblearn when available; otherwise a documented
fallback (random minority oversampling) keeps the pipeline runnable.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from fairmultimodal_tpu.utils.rng import threefry_key

__all__ = ["AdvConfig", "AdvPredictor", "AdvAdversary", "train_adversarial",
           "adv_grid_search", "match_case_control", "resample_smoteenn",
           "adv_metrics", "REFERENCE_GRID", "REDUCED_GRID", "params_tostring",
           "save_adv_artifacts", "load_adv_artifact"]

# The reference stage-2 hyperparameter grid, verbatim (04_AdvDebias.py:
# 1081-1088): the full 2^6 itertools.product — 64 grid points.  This is the
# default so running 04 out of the box reproduces the reference experiment.
REFERENCE_GRID: Dict[str, List] = {
    "learning_rate": [1e-4, 5e-5],
    "num_iters": [1000, 2000],
    "num_nodes": [64, 128],
    "num_nodes_adv": [32, 64],
    "dropout_rate": [0.3, 0.5],
    "alpha": [1, 2],
}

# Single cheap point for tests/CI and --tiny runs (pre-round-5 default).
REDUCED_GRID: Dict[str, List] = {
    "learning_rate": [1e-3], "num_iters": [500], "num_nodes": [64],
    "num_nodes_adv": [32], "dropout_rate": [0.1], "alpha": [1.0],
}

# Reference grid-point naming order (04_AdvDebias.py:555,586-589).
_HYPERPARAMETER_LIST = ("learning_rate", "num_iters", "num_nodes",
                        "num_nodes_adv", "dropout_rate", "alpha")


def params_tostring(cfg: "AdvConfig") -> str:
    """Reference ``params_tostring`` (04:586-594): hyphen-joined
    ``name_value`` in hyperparameter_list order — used to label per-grid-point
    artifacts."""
    return "-".join(f"{k}_{getattr(cfg, k)}" for k in _HYPERPARAMETER_LIST)


@dataclasses.dataclass
class AdvConfig:
    """One grid point (reference hyperparameter_list, 04:569-585).  Defaults
    are the first value of each REFERENCE_GRID axis."""

    learning_rate: float = 1e-4
    num_iters: int = 1000
    num_nodes: int = 64
    num_nodes_adv: int = 32
    dropout_rate: float = 0.3
    alpha: float = 1.0
    adversarial: bool = True
    seed: int = 25


class AdvPredictor(nn.Module):
    """X -> num_nodes -> 1 logits (reference applies Sigmoid in-module and
    BCELoss; we keep logits + BCE-with-logits for numerical stability —
    identical math)."""

    num_nodes: int = 64
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.relu(nn.Dense(self.num_nodes, name="fc1")(x))
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(1, name="fc2")(h)


class AdvAdversary(nn.Module):
    """(y_hat, y) -> num_nodes_adv -> 1 logits (04:639-655)."""

    num_nodes_adv: int = 32
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.relu(nn.Dense(self.num_nodes_adv, name="fc1")(x))
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(1, name="fc2")(h)


def _bce(logits, y):
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))


def match_case_control(y: np.ndarray, match_number: int = 20,
                       seed: int = 0) -> np.ndarray:
    """1:``match_number`` case/control matching indices (04:677-692)."""
    rng = np.random.default_rng(seed)
    idx_case = np.flatnonzero(y == 1)
    idx_control = np.flatnonzero(y == 0)
    matched: List[int] = []
    for _ in idx_case:
        k = min(match_number, len(idx_control))
        matched.extend(rng.choice(idx_control, size=k, replace=False).tolist())
    return np.concatenate([np.asarray(matched, np.int64), idx_case])


def resample_smoteenn(X: np.ndarray, y: np.ndarray, z: np.ndarray,
                      seed: int = 25) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SMOTEENN over [X | z] as the reference does (04:694-702); falls back
    to random minority oversampling when imblearn is unavailable."""
    Xz = np.concatenate([X, z.reshape(-1, 1)], axis=1)
    try:
        from imblearn.combine import SMOTEENN
        from imblearn.under_sampling import EditedNearestNeighbours

        res = SMOTEENN(enn=EditedNearestNeighbours(sampling_strategy="majority"),
                       random_state=seed)
        Xz_r, y_r = res.fit_resample(Xz, y)
    except Exception:
        rng = np.random.default_rng(seed)
        pos = np.flatnonzero(y == 1)
        neg = np.flatnonzero(y == 0)
        if len(pos) == 0 or len(neg) == 0:
            Xz_r, y_r = Xz, y
        else:
            n_extra = max(len(neg) - len(pos), 0)
            extra = rng.choice(pos, size=n_extra, replace=True)
            keep = np.concatenate([np.arange(len(y)), extra])
            Xz_r, y_r = Xz[keep], y[keep]
    return Xz_r[:, :-1], np.asarray(y_r, np.float32), (Xz_r[:, -1] > 0).astype(np.float32)


def train_adversarial(
    X: np.ndarray, y: np.ndarray, z: np.ndarray,
    Xval: np.ndarray, yval: np.ndarray, zval: np.ndarray,
    cfg: AdvConfig,
    verbose: bool = True,
    log_every: int = 100,
) -> Dict:
    """Full-batch adversarial min-max training of one grid point.

    Returns dict with predictor/adversary params, loss curves and validation
    predictions.
    """
    pred = AdvPredictor(cfg.num_nodes, cfg.dropout_rate)
    adv = AdvAdversary(cfg.num_nodes_adv, cfg.dropout_rate)

    # Typed threefry: raw PRNGKeys follow the process-global default impl
    # (utils/rng.py) — results must not depend on flag history.
    key = threefry_key(cfg.seed)
    k1, k2 = jax.random.split(key)
    X_d = jnp.asarray(X, jnp.float32)
    y_d = jnp.asarray(y, jnp.float32).reshape(-1, 1)
    z_d = jnp.asarray(z, jnp.float32).reshape(-1, 1)
    p_params = pred.init(k1, X_d[:1])["params"]
    a_params = adv.init(k2, jnp.zeros((1, 2)))["params"]
    p_tx = optax.adam(cfg.learning_rate)
    a_tx = optax.adam(cfg.learning_rate)
    p_state = p_tx.init(p_params)
    a_state = a_tx.init(a_params)

    def joint_loss(pp, ap, dropout_key):
        """Scalar whose per-side gradients equal the reference's summed
        ``.grad`` buffers after both backward() calls (04:724-731): the
        predictor side sees ``combined + L_adv`` through the un-detached
        ``y_hat``, the adversary side sees ``L_adv + combined``."""
        train = dropout_key is not None
        kp = ka = None
        if train:
            kp, ka = jax.random.split(dropout_key)
        logits = pred.apply({"params": pp}, X_d, deterministic=not train,
                            rngs={"dropout": kp} if train else None)
        l_pred = _bce(logits, y_d)
        if not cfg.adversarial:
            return l_pred, (l_pred, l_pred, jnp.float32(0.0))
        yhat = jax.nn.sigmoid(logits)
        adv_in = jnp.concatenate([yhat, y_d], axis=1)
        l_adv = _bce(adv.apply({"params": ap}, adv_in,
                               deterministic=not train,
                               rngs={"dropout": ka} if train else None), z_d)
        combined = l_pred - cfg.alpha * l_adv + l_pred / (l_adv + 1e-8)
        return combined + l_adv, (combined, l_pred, l_adv)

    @jax.jit
    def step(pp, ps, ap, as_, dropout_key):
        # Both grads at the OLD params, both Adam steps applied after —
        # matching torch's backward/backward/step/step order (04:724-731).
        (_, (combined, l_pred, l_adv)), (p_grads, a_grads) = (
            jax.value_and_grad(joint_loss, argnums=(0, 1), has_aux=True)(
                pp, ap, dropout_key))
        p_updates, ps = p_tx.update(p_grads, ps, pp)
        pp = optax.apply_updates(pp, p_updates)
        if cfg.adversarial:
            a_updates, as_ = a_tx.update(a_grads, as_, ap)
            ap = optax.apply_updates(ap, a_updates)
        return pp, ps, ap, as_, combined, l_pred, l_adv

    train_curve, valid_curve = [], []
    Xv = jnp.asarray(Xval, jnp.float32)
    yv = jnp.asarray(yval, jnp.float32).reshape(-1, 1)
    zv = jnp.asarray((np.asarray(zval) > 0).astype(np.float32)).reshape(-1, 1)

    @jax.jit
    def valid_losses(pp, ap):
        # Deterministic — the reference leaves dropout ON here too (the
        # modules are never .eval()'d, 04:735-744); replicating that would
        # add pure noise to a logging-only value, so we don't (PARITY.md).
        logits = pred.apply({"params": pp}, Xv)
        l_pred = _bce(logits, yv)
        if not cfg.adversarial:
            return l_pred
        yhat = jax.nn.sigmoid(logits)
        l_adv = _bce(adv.apply({"params": ap}, jnp.concatenate([yhat, yv], 1)), zv)
        return l_pred - cfg.alpha * l_adv + l_pred / (l_adv + 1e-8)

    dropout_root = (threefry_key(cfg.seed + 1)
                    if cfg.dropout_rate > 0 else None)
    for t in range(cfg.num_iters):
        kt = (None if dropout_root is None
              else jax.random.fold_in(dropout_root, t))
        p_params, p_state, a_params, a_state, combined, l_pred, l_adv = step(
            p_params, p_state, a_params, a_state, kt)
        if t % log_every == 0:
            vl = float(valid_losses(p_params, a_params))
            train_curve.append(float(combined))
            valid_curve.append(vl)
            if verbose:
                print(f"Iteration: {t}, Train Loss: {float(combined):.4f}, "
                      f"Valid Loss: {vl:.4f}")

    yhat_val = np.asarray(jax.nn.sigmoid(pred.apply({"params": p_params}, Xv)))
    return {
        "predictor_params": p_params,
        "adversary_params": a_params,
        "train_curve": train_curve,
        "valid_curve": valid_curve,
        "yhat_valid": yhat_val,
    }


def adv_metrics(yhat: np.ndarray, y: np.ndarray, z: np.ndarray,
                threshold: float = 0.5, prevalence: float = 0.05) -> Dict[str, float]:
    """Reference get_metrics block (04:791-815): accuracy/recall/precision/
    specificity/PPV/NPV at an assumed prevalence, F1, AUROC, per-z-group
    recall gap."""
    from sklearn.metrics import roc_auc_score

    yhat = np.asarray(yhat).reshape(-1)
    y = np.asarray(y).reshape(-1)
    # Binarize the sensitive attribute like the reference eval (04:783):
    # group 0 vs everyone else.
    z = (np.asarray(z).reshape(-1) > 0).astype(np.float64)
    pred = (yhat > threshold).astype(int)
    tp = int(((pred == 1) & (y == 1)).sum())
    tn = int(((pred == 0) & (y == 0)).sum())
    fp = int(((pred == 1) & (y == 0)).sum())
    fn = int(((pred == 0) & (y == 1)).sum())
    sens = tp / (tp + fn) if tp + fn else 0.0
    spec = tn / (tn + fp) if tn + fp else 0.0
    ppv = (sens * prevalence) / max(
        sens * prevalence + (1 - spec) * (1 - prevalence), 1e-12)
    npv = (spec * (1 - prevalence)) / max(
        (1 - sens) * prevalence + spec * (1 - prevalence), 1e-12)
    prec = tp / (tp + fp) if tp + fp else 0.0
    f1 = 2 * prec * sens / max(prec + sens, 1e-12)
    try:
        auroc = float(roc_auc_score(y, yhat))
    except Exception:
        auroc = float("nan")
    gaps = []
    for g in (0.0, 1.0):
        m = z == g
        if m.any() and (y[m] == 1).any():
            gp = ((pred[m] == 1) & (y[m] == 1)).sum() / max((y[m] == 1).sum(), 1)
            gaps.append(float(gp))
    recall_gap = abs(gaps[0] - gaps[1]) if len(gaps) == 2 else float("nan")
    return {"accuracy": (tp + tn) / max(len(y), 1), "recall": sens,
            "precision": prec, "specificity": spec, "PPV": ppv, "NPV": npv,
            "f1": f1, "auroc": auroc, "recall_gap_z": recall_gap}


def save_adv_artifacts(out_dir: str, results: List[Dict],
                       num_features: int) -> List[str]:
    """Persist the stage-2 models under reference-shaped names.

    The reference saves the predictor and adversary per grid point under
    fixed filenames ``model/model-basic_final.pth`` / ``adv/model-adv_final.pth``
    (04_AdvDebias.py:758-761 — each grid point OVERWRITES them, so the files
    on disk after a full run are the last grid point's), and pre-creates the
    ``model``/``adv``/``metrics`` directories (04:1089-1091).  We keep both
    semantics and fix the information loss: every grid point is additionally
    saved under its ``params_tostring`` name so no model is lost to the
    overwrite.  npz analogue of torch.save; self-describing (metadata carries
    the grid-point config + feature width) so :func:`load_adv_artifact`
    reloads without external context.
    """
    import os

    from fairmultimodal_tpu.utils.checkpoint import save_params_npz

    for d in ("model", "adv", "metrics"):
        os.makedirs(os.path.join(out_dir, d), exist_ok=True)
    written: List[str] = []
    for r in results:
        tag = params_tostring(AdvConfig(**{
            k: r["config"][k] for k in _HYPERPARAMETER_LIST}))
        meta = {"config": r["config"], "num_features": int(num_features)}
        for kind, params, sub, stem in (
                ("predictor", r["predictor_params"], "model", "model-basic"),
                ("adversary", r["adversary_params"], "adv", "model-adv")):
            if kind == "adversary" and not r["config"].get("adversarial", True):
                continue
            for name in (f"{stem}_{tag}.npz", f"{stem}_final.npz"):
                path = os.path.join(out_dir, sub, name)
                save_params_npz(path, params, metadata=dict(meta, kind=kind))
                written.append(path)
    return written


def load_adv_artifact(path: str):
    """Reload a stage-2 artifact written by :func:`save_adv_artifacts`.

    Returns ``(module, params, config)`` — the Flax module is rebuilt from
    the embedded metadata, so ``module.apply({"params": params}, X)`` runs
    inference directly."""
    from fairmultimodal_tpu.utils.checkpoint import (load_metadata_npz,
                                                     load_params_npz)

    meta = load_metadata_npz(path)
    if not meta or "kind" not in meta:
        raise ValueError(f"{path} is not a stage-2 adversarial artifact")
    cfg = AdvConfig(**meta["config"])
    if meta["kind"] == "predictor":
        module = AdvPredictor(cfg.num_nodes, cfg.dropout_rate)
        example = jnp.zeros((1, int(meta["num_features"])), jnp.float32)
    else:
        module = AdvAdversary(cfg.num_nodes_adv, cfg.dropout_rate)
        example = jnp.zeros((1, 2), jnp.float32)
    like = module.init(threefry_key(0), example)["params"]
    return module, load_params_npz(path, like), cfg


def adv_grid_search(
    X, y, z, Xval, yval, zval,
    grid: Optional[Dict[str, List]] = None,
    adversarial: bool = True,
    match_number: int = 20,
    use_data_as_is: bool = False,
    verbose: bool = True,
) -> List[Dict]:
    """Reference two-stage protocol: matching + SMOTEENN once, then the
    hyperparameter product grid (04:569-585,664-702).  Returns one result
    dict (config, metrics, curves) per grid point.

    The default grid is the reference's full 2^6 product (REFERENCE_GRID,
    04:1081-1088) — 64 full-batch runs.  At reference scale (matched+resampled
    train set of a few thousand rows, 1000-2000 Adam iterations each) one
    point takes seconds on TPU/CPU, so the full grid is minutes, not hours;
    pass ``grid=REDUCED_GRID`` (or any dict) for CI-scale runs."""
    grid = grid or REFERENCE_GRID
    y = np.asarray(y, np.float32)
    z = (np.asarray(z) > 0).astype(np.float32)
    if not use_data_as_is:
        keep = match_case_control(y, match_number)
        X, y, z = X[keep], y[keep], z[keep]
    X, y, z = resample_smoteenn(X, y, z)

    results = []
    keys = list(grid)
    for values in itertools.product(*(grid[k] for k in keys)):
        cfg = AdvConfig(**dict(zip(keys, values)), adversarial=adversarial)
        out = train_adversarial(X, y, z, Xval, yval, zval, cfg, verbose=verbose)
        metrics = adv_metrics(out["yhat_valid"], yval, zval)
        results.append({"config": dataclasses.asdict(cfg), "metrics": metrics,
                        "train_curve": out["train_curve"],
                        "valid_curve": out["valid_curve"],
                        "predictor_params": out["predictor_params"],
                        "adversary_params": out["adversary_params"]})
        if verbose:
            print("Training complete for hyperparameter setting:",
                  dict(zip(keys, values)))
    return results
