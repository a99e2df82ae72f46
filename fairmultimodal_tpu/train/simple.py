"""Generic jitted multitask trainer for the baseline model family.

Every non-FAME training script in the reference shares one protocol
(01_BEHRT.py:204-305, 02:489-527, 03:555-760, 06:790-829, 07:531-640,
09:512-640): per-task criterion (BCE-with-logits pos_weight or FocalLoss)
summed over the three tasks, Adam/AdamW, ReduceLROnPlateau, early stopping on
best val loss, best-state capture.  :class:`MultitaskTrainer` is that protocol
as one jitted train step + host-side schedule objects.

TPU design: the step function is a single jit (forward + loss + backward +
update) over fixed-shape padded batches with a validity-mask ``weight``; the
per-task loss is a masked mean over the batch then a sum over tasks — exactly
the reference's ``loss_mort + loss_los + loss_vent`` of batch means.  Under a
mesh, batches arrive sharded over the "data" axis and GSPMD inserts gradient
psums.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fairmultimodal_tpu.ops.losses import bce_with_logits, focal_loss
from fairmultimodal_tpu.train.loop import EarlyStopper, PlateauScheduler

__all__ = ["SimpleTrainConfig", "MultitaskTrainer", "masked_task_loss"]


@dataclasses.dataclass
class SimpleTrainConfig:
    lr: float = 1e-4
    num_epochs: int = 20
    batch_size: int = 16
    weight_decay: float = 0.0
    loss: str = "focal"              # "focal" | "bce"
    gamma: float = 1.0               # focal gamma (02 uses 2, 03/06/07/09 use 1)
    optimizer: str = "adam"          # "adam" | "adamw"
    patience: int = 5
    scheduler_factor: float = 0.1
    scheduler_patience: int = 2
    grad_clip: Optional[float] = None
    seed: int = 42
    # "unsafe_rbg" = TPU hardware RBG for dropout masks (see utils/rng.py).
    rng_impl: str = "unsafe_rbg"
    # Test hook (float64 trajectory oracle): run the TRAIN forward with
    # dropout off so multi-step trajectories are deterministic and
    # comparable against torch.  Never set in production configs.
    deterministic_forward: bool = False


def masked_task_loss(logits, labels, weight, *, loss: str, gamma: float,
                     pos_weight=None) -> jax.Array:
    """Sum over tasks of the masked batch-mean per-task loss.

    Equals ``crit_mort(...) + crit_los(...) + crit_vent(...)`` with batch-mean
    criteria (the universal reference pattern, e.g. 01_BEHRT.py:233-236).
    """
    if loss == "bce":
        per = bce_with_logits(logits, labels, pos_weight=pos_weight,
                              reduction="none")
    else:
        per = focal_loss(logits, labels, gamma=gamma, pos_weight=pos_weight,
                         reduction="none")
    w = weight[:, None]
    denom = jnp.maximum(jnp.sum(w), 1.0)
    per_task_mean = jnp.sum(per * w, axis=0) / denom     # [T]
    return jnp.sum(per_task_mean)


class MultitaskTrainer:
    """Protocol driver for any Flax model whose apply returns
    ``{"logits": [B, T], ...}`` from a batch-dict input.

    Batches: ``{"model_inputs": {...}, "labels": [B, T], "weight": [B]}``.
    """

    def __init__(self, model, config: SimpleTrainConfig,
                 pos_weight: Optional[np.ndarray] = None,
                 mesh=None,
                 loss_extras: Optional[Callable] = None):
        self.model = model
        self.config = config
        self.pos_weight = (None if pos_weight is None
                           else jnp.asarray(pos_weight, jnp.float32))
        self.mesh = mesh
        self.loss_extras = loss_extras   # fn(params, out, batch) -> scalar
        opt = optax.adamw if config.optimizer == "adamw" else optax.adam
        kwargs = {"weight_decay": config.weight_decay} if config.optimizer == "adamw" else {}
        pieces = []
        if config.grad_clip:
            from fairmultimodal_tpu.ops.optim import clip_by_global_norm_torch

            # torch-exact clip semantics (+1e-6 denominator) — see ops/optim.
            pieces.append(clip_by_global_norm_torch(config.grad_clip))
        pieces.append(optax.inject_hyperparams(opt)(learning_rate=config.lr, **kwargs))
        self.tx = optax.chain(*pieces)
        from fairmultimodal_tpu.utils.rng import make_rng

        self._rng = make_rng(config.seed, config.rng_impl)
        self.history: List[Dict[str, Any]] = []
        self._build()

    def _loss(self, params, batch, rng, train: bool):
        train_fwd = train and not self.config.deterministic_forward
        out = self.model.apply(
            {"params": params}, batch["model_inputs"],
            deterministic=not train_fwd,
            rngs={"dropout": rng} if train_fwd else None)
        logits = out["logits"] if isinstance(out, dict) else out
        base = masked_task_loss(logits, batch["labels"], batch["weight"],
                                loss=self.config.loss, gamma=self.config.gamma,
                                pos_weight=self.pos_weight)
        if self.loss_extras is not None:
            base = base + self.loss_extras(params, out, batch)
        return base, logits

    def _build(self):
        def train_step(params, opt_state, batch, rng):
            (loss, _), grads = jax.value_and_grad(self._loss, has_aux=True)(
                params, batch, rng, True)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def eval_step(params, batch):
            loss, logits = self._loss(params, batch, jax.random.PRNGKey(0), False)
            return loss, logits

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_step = jax.jit(eval_step)

    def _put(self, batch):
        if self.mesh is not None:
            from fairmultimodal_tpu.parallel import shard_batch

            return shard_batch(batch, self.mesh)
        return jax.tree_util.tree_map(jnp.asarray, batch)

    def init_params(self, example_batch):
        # Threefry init regardless of the dropout rng_impl (reproducibility).
        from fairmultimodal_tpu.utils.rng import threefry_key

        return self.model.init(threefry_key(self.config.seed),
                               example_batch["model_inputs"])["params"]

    def set_lr(self, opt_state, lr: float):
        opt_state[-1].hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state

    def train_epoch(self, params, opt_state, loader):
        from fairmultimodal_tpu.data.prefetch import PrefetchLoader

        losses: List[jax.Array] = []
        # Batch N+1's host->device transfer overlaps step N's compute; loss
        # scalars stay on device until the epoch ends (a float() per step
        # blocks dispatch on a tunnel round-trip each).  The final float64
        # host sum matches per-step accumulation to last-ulp (np.sum is
        # pairwise, not strictly left-to-right; logging-only impact).
        for batch in PrefetchLoader(loader, size=2, mesh=self.mesh):
            rng, self._rng = jax.random.split(self._rng)
            params, opt_state, loss = self._train_step(
                params, opt_state, batch, rng)
            losses.append(loss)
        nb = len(losses)
        total = (float(np.sum(np.asarray(jnp.stack(losses)), dtype=np.float64))
                 if nb else 0.0)
        return params, opt_state, total / max(nb, 1)

    def _windowed_eval(self, loader, dispatch, drain, window: int = 8):
        """Bounded-window eval drive (same pattern as FAMETrainer): keep
        ``window`` eval dispatches in flight so the host only blocks on work
        that is already ~window steps old — a blocking pull per batch costs
        a tunnel round-trip (~33 ms) each; see CLAUDE.md."""
        import collections

        from fairmultimodal_tpu.data.prefetch import PrefetchLoader

        pending = collections.deque()
        for batch in PrefetchLoader(loader, size=2, mesh=self.mesh):
            pending.append(dispatch(batch))
            if len(pending) >= window:
                drain(pending.popleft())
        while pending:
            drain(pending.popleft())

    def evaluate_loss(self, params, loader) -> float:
        losses: List[float] = []
        self._windowed_eval(
            loader,
            lambda batch: self._eval_step(params, batch)[0],
            lambda loss: losses.append(float(loss)))
        return float(np.mean(losses)) if losses else float("inf")

    def predict(self, params, loader, extra_keys: Tuple[str, ...] = ()) -> Dict[str, np.ndarray]:
        """Collect logits/labels (+ any model_inputs keys) over a loader,
        dropping padded rows."""
        out: Dict[str, list] = {"logits": [], "labels": []}
        for k in extra_keys:
            out[k] = []

        def dispatch(batch):
            return self._eval_step(params, batch)[1], batch

        def drain(item):
            logits, batch = item
            keep = np.asarray(batch["weight"]) > 0
            out["logits"].append(np.asarray(logits)[keep])
            out["labels"].append(np.asarray(batch["labels"])[keep])
            for k in extra_keys:
                out[k].append(np.asarray(batch["model_inputs"][k])[keep])

        self._windowed_eval(loader, dispatch, drain)
        return {k: (np.concatenate(v) if v else np.zeros((0,)))
                for k, v in out.items()}

    def fit(self, params, train_loader, val_loader, verbose: bool = True,
            on_epoch_end: Optional[Callable] = None):
        cfg = self.config
        opt_state = self.tx.init(params)
        sched = PlateauScheduler(cfg.lr, cfg.scheduler_factor,
                                 cfg.scheduler_patience)
        stopper = EarlyStopper(cfg.patience)
        best_params = jax.tree_util.tree_map(jnp.copy, params)
        for epoch in range(cfg.num_epochs):
            params, opt_state, train_loss = self.train_epoch(
                params, opt_state, train_loader)
            val_loss = self.evaluate_loss(params, val_loader)
            lr = sched.step(val_loss)
            opt_state = self.set_lr(opt_state, lr)
            if verbose:
                print(f"[Epoch {epoch + 1}] Train Loss: {train_loss:.4f} | "
                      f"Val Loss: {val_loss:.4f}")
            stop = stopper.step(val_loss)
            if stopper.improved:
                best_params = jax.tree_util.tree_map(jnp.copy, params)
                if verbose:
                    print("Validation loss improved. Saving model...")
            self.history.append({"epoch": epoch + 1, "train_loss": train_loss,
                                 "val_loss": val_loss, "lr": lr})
            if on_epoch_end is not None:
                on_epoch_end(epoch, params)
            if stop:
                if verbose:
                    print("Early stopping triggered.")
                break
        return best_params, self.history
