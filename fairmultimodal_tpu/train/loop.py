"""Jitted training loop for the FAME model family.

Design vs the reference (``10_FAME.py:401-449,606-918``):

- The train step is one jitted function: forward + BCE(pos_weight) +
  λ_edd·(10·L_EDDI) + λ_l1·‖sig_weights‖₁, global-norm clip 1.0, AdamW.
  The reference's Python loop over ``torch.unique`` subgroups becomes the
  segment-sum L_EDDI (``fairness.loss``), so nothing leaves the device.
- Per-epoch dynamic EDDI weights are a plain ``[3, 3]`` array *input* to the
  step (task x modality) — updated on the host between epochs, never causing
  recompilation.
- The learning rate is an ``optax.inject_hyperparams`` hyperparameter so the
  plateau scheduler mutates it in the optimizer state without recompiles.
- Fixed-shape padded batches carry a validity mask threaded through the BCE,
  the L_EDDI and the weight-update statistics, making padding an exact no-op.
- Under a device mesh the same step is pjit-compiled with batch sharding
  (see ``fairmultimodal_tpu.parallel``); metric reductions are psums.

Host-side protocol objects (:class:`PlateauScheduler`, :class:`EarlyStopper`)
replicate torch ``ReduceLROnPlateau(factor, patience)`` and the reference's
best-val-loss early stop (patience 5, ``10_FAME.py:830-840``).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fairmultimodal_tpu import EXPECTED_AGE_CODES, EXPECTED_ETHNICITY_CODES, \
    EXPECTED_INSURANCE_CODES, TASKS
from fairmultimodal_tpu.fairness.eddi import combined_eddi, eddi_from_stats
from fairmultimodal_tpu.fairness.loss import eddi_loss
from fairmultimodal_tpu.ops.losses import bce_with_logits

__all__ = ["TrainConfig", "PlateauScheduler", "EarlyStopper", "FAMETrainer"]

MODALITIES = ("demo", "lab", "text")
GROUP_SIZES = (len(EXPECTED_AGE_CODES), len(EXPECTED_ETHNICITY_CODES),
               len(EXPECTED_INSURANCE_CODES))
# Param subtrees outside the reference's loss graph (see train_step): the
# per-modality classifier heads exist only to drive the dynamic-weight pass.
_LOSS_FREE_HEADS = frozenset(
    {"classifier_demo", "classifier_lab", "classifier_text"})


@dataclasses.dataclass
class TrainConfig:
    """Hyperparameters; defaults are the reference grid (10_FAME.py:921-924)."""

    lr: float = 1e-5
    num_epochs: int = 50
    lambda_edd: float = 0.8
    lambda_l1: float = 0.01
    batch_size: int = 16
    threshold: float = 0.5
    weight_decay: float = 0.01
    beta: float = 1.0
    patience: int = 5
    scheduler_factor: float = 0.1
    scheduler_patience: int = 2
    grad_clip: float = 1.0
    seed: int = 42
    # Dropout PRNG implementation: "unsafe_rbg" uses the TPU hardware RBG
    # (~35% faster train step than threefry at this model's dropout volume,
    # see utils/rng.py); "threefry" restores the JAX default.
    rng_impl: str = "unsafe_rbg"
    # Test hook: run the TRAIN forward with dropout disabled so multi-step
    # trajectories are deterministic and comparable against a torch oracle
    # (tests/test_e2e_torch_parity.py drives the trainer's real compiled
    # train_step with this on).  Never set in production configs.
    deterministic_forward: bool = False


class PlateauScheduler:
    """torch ReduceLROnPlateau(mode=min, threshold=1e-4 rel) semantics."""

    def __init__(self, lr: float, factor: float = 0.1, patience: int = 2,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, val_loss: float) -> float:
        if val_loss < self.best * (1.0 - self.threshold):
            self.best = val_loss
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


class EarlyStopper:
    """Best-val-loss early stopping (strict improvement, 10_FAME.py:830-840)."""

    def __init__(self, patience: int = 5):
        self.patience = patience
        self.best = float("inf")
        self.counter = 0
        self.improved = False

    def step(self, val_loss: float) -> bool:
        """Returns True when training should stop."""
        if val_loss < self.best:
            self.best = val_loss
            self.counter = 0
            self.improved = True
            return False
        self.improved = False
        self.counter += 1
        return self.counter >= self.patience


def _batch_to_device(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Nested batch dict -> device arrays (leaf-wise; batches are pytrees)."""
    return jax.tree_util.tree_map(jnp.asarray, batch)


class FAMETrainer:
    """Orchestrates the FAME training protocol.

    Args:
      model: a Flax module whose ``apply`` returns the FAME output dict
        (``fused_logits``, ``modality_logits``, ...).
      config: hyperparameters.
      pos_weight: [3] per-task positive weights.
      mesh/sharding: optional — when provided, steps are pjit-compiled with
        the batch dimension sharded over the mesh's data axis (see
        ``fairmultimodal_tpu.parallel.shard_train_step``).
    """

    def __init__(self, model, config: TrainConfig, pos_weight: np.ndarray,
                 rngs_seed: int = 0, mesh=None, dynamic_weights_csv: Optional[str] = None):
        self.model = model
        self.config = config
        self.pos_weight = jnp.asarray(pos_weight, jnp.float32)
        self.mesh = mesh
        self.dynamic_weights_csv = dynamic_weights_csv
        from fairmultimodal_tpu.ops.optim import clip_by_global_norm_torch

        # torch-exact clip (the +1e-6 denominator of clip_grad_norm_,
        # 10_FAME.py:446) so trajectories match the reference bit-for-bit
        # at f64 — see ops/optim.py and the trajectory oracle.
        self.tx = optax.chain(
            clip_by_global_norm_torch(config.grad_clip),
            optax.inject_hyperparams(optax.adamw)(
                learning_rate=config.lr, weight_decay=config.weight_decay),
        )
        from fairmultimodal_tpu.utils.rng import make_rng

        self._init_seed = rngs_seed
        self._rng = make_rng(rngs_seed, config.rng_impl)
        self._build_steps()
        # Initial dynamic weights: 0.33 per modality per task (10_FAME:792-796).
        # Host-side storage is FLOAT64 like the reference's python floats
        # (the fit-protocol oracle compares trajectories at 1e-8); the
        # device step still consumes the f32 downcast under normal mode.
        self.dynamic_weights = np.full((3, 3), 0.33)
        self.history: List[Dict[str, Any]] = []
        self.tracked_dynamic_weights = {t: [] for t in TASKS}
        self.tracked_sigmoid_weights: List[np.ndarray] = []

    # -- jitted step functions -------------------------------------------------

    def _loss_fn(self, params, batch, dyn_w, rng, train: bool,
                 axis_name: Optional[str] = None):
        train_fwd = train and not self.config.deterministic_forward
        out = self.model.apply(
            {"params": params}, batch["model_inputs"], dynamic_weights=dyn_w,
            deterministic=not train_fwd,
            rngs={"dropout": rng} if train_fwd else None)
        logits = out["fused_logits"]
        labels = batch["labels"]
        w = batch["weight"]
        bce = bce_with_logits(logits, labels, pos_weight=self.pos_weight,
                              weight=w, axis_name=axis_name)
        probs = jax.nn.sigmoid(logits)
        sens = [batch["model_inputs"]["age_ids"],
                batch["model_inputs"]["ethnicity_ids"],
                batch["model_inputs"]["insurance_ids"]]
        leddi = eddi_loss(probs, labels, sens, GROUP_SIZES, weight=w,
                          axis_name=axis_name)
        l1 = jnp.sum(jnp.abs(params["fusion"]["sig_weights"]))
        total = bce + self.config.lambda_edd * (10.0 * leddi) + self.config.lambda_l1 * l1
        return total, (bce, leddi, out)

    def _build_steps(self):
        cfg = self.config

        # Pure-DP meshes (no model-axis sharding) compile every step through
        # ``shard_map`` — manual SPMD over the "data" axis with explicit
        # psums.  This is the ONLY mesh mode that can run the Pallas
        # megakernels on real multi-chip TPU: Mosaic kernels cannot be
        # auto-partitioned by GSPMD (jax tpu_custom_call refuses with
        # "wrap the call in a shard_map"), which CPU-mesh tests never see
        # because the kernels gate off non-TPU backends.  Mixed data x model
        # (TP) meshes keep the GSPMD propagation path; on real TPU that mode
        # requires the XLA layer path (FMTPU_KERNELS=0 — see ops gates).
        dp = None
        if self.mesh is not None:
            shape = dict(self.mesh.shape)
            if "data" in shape and shape.get("model", 1) == 1:
                dp = "data"
            if dp is not None and cfg.batch_size % shape["data"]:
                raise ValueError(
                    f"batch_size {cfg.batch_size} must be divisible by the "
                    f"mesh's data axis ({shape['data']}) for the shard_map "
                    f"data-parallel path")
            if dp is None and jax.default_backend() == "tpu":
                # Mixed data x model mesh on real TPU: auto-fall back to the
                # XLA layer path instead of letting GSPMD trip over the
                # Mosaic custom calls at trace time.  Deliberate and
                # recorded — the kernels are NOT carried through TP (the
                # folded LN epilogue is invalid across the row-parallel psum
                # boundary, and TP is the wrong tool at this model scale);
                # full decision record in ops/gates.py.  Users who want the
                # kernels multi-chip should use a pure-DP mesh (--mesh Nx1).
                from fairmultimodal_tpu.ops import gates

                if gates.kernels_enabled():
                    import warnings

                    warnings.warn(
                        "mixed data×model mesh on TPU: Pallas kernels "
                        "disabled for this process (GSPMD cannot partition "
                        "Mosaic custom calls). Pure-DP meshes (--mesh Nx1) "
                        "keep the kernels via shard_map; see "
                        "fairmultimodal_tpu/ops/gates.py for the decision "
                        "record.", stacklevel=2)
                    gates.force_xla_path(
                        "mixed data×model mesh (GSPMD cannot partition "
                        "Mosaic custom calls)")
        self._dp_axis = dp

        def local_train_loss(params, batch, dyn_w, rng):
            if dp is not None:
                # Decorrelate dropout across shards; the fold is part of the
                # compiled step, so the host-side RNG protocol (one split per
                # step, checkpointed stream) is identical to single-device.
                rng = jax.random.fold_in(rng, jax.lax.axis_index(dp))
            total, (bce, leddi, _) = self._loss_fn(params, batch, dyn_w, rng,
                                                   True, dp)
            return total, (bce, leddi)

        if dp is not None:
            # shard_map wraps ONLY the loss; jax.value_and_grad differentiates
            # through it from OUTSIDE.  Grad-inside-the-shard_map would be
            # wrong here: with the loss psum'd to its global value, the psum
            # transpose sums the per-shard cotangent seeds, inflating every
            # gradient by exactly n_shards (measured 8x on the 8-device mesh;
            # tests/test_parallel_dp.py::test_dp_grads_match_single_device).
            # Differentiating the shard_map itself gives the exact global
            # gradient of the global masked-mean loss, with the grad psums
            # inserted by the transpose machinery; clip/AdamW then run on
            # replicated trees at the jit level.
            from jax.sharding import PartitionSpec as P

            loss_for_grad = jax.shard_map(
                local_train_loss, mesh=self.mesh,
                in_specs=(P(), P("data"), P(), P()),
                out_specs=(P(), (P(), P())))
        else:
            loss_for_grad = local_train_loss

        # The reference joint loss never touches the modality classifier
        # heads (10_FAME.py:401-449 uses fused_logits only), so torch
        # autograd leaves their .grad None and AdamW SKIPS them entirely
        # — frozen at init with NO weight decay (:786).  optax.adamw
        # would still apply the decoupled wd*p term to their exactly-
        # zero-gradient leaves; zero those updates so the heads stay
        # bit-frozen like the reference (their logits drive the dynamic-
        # weight pass, so slow decay would drift the weight trajectory).
        # Their Adam moments stay zero (zero grads), so this is the only
        # term to suppress.
        def _is_loss_free(path) -> bool:
            return any(getattr(k, "key", None) in _LOSS_FREE_HEADS
                       for k in path)

        # FMTPU_FUSED_OPT=1 selects the single-tree_map fused
        # clip+AdamW+mask+apply (ops/optim.py::fused_clip_adamw_apply).
        # NEGATIVE RESULT, default off: the same-session bench A/B measured
        # 2578 (chain) vs 2568 (fused) p/s — XLA already fuses the optax
        # elementwise chain into the same per-leaf HBM passes inside the
        # step jit, so hand-fusing buys nothing.  The path stays as a
        # bit-identical-under-jit alternative (tests/test_optim_fused.py)
        # and as the recorded probe of the 2.4 ms optimizer tail.
        fused_opt = os.environ.get("FMTPU_FUSED_OPT", "0") == "1"

        def train_step(params, opt_state, batch, dyn_w, rng):
            (total, (bce, leddi)), grads = jax.value_and_grad(
                loss_for_grad, has_aux=True)(params, batch, dyn_w, rng)
            if fused_opt:
                from fairmultimodal_tpu.ops.optim import fused_clip_adamw_apply

                params, opt_state = fused_clip_adamw_apply(
                    grads, opt_state, params, max_norm=cfg.grad_clip,
                    frozen_fn=_is_loss_free)
            else:
                updates, opt_state = self.tx.update(grads, opt_state, params)
                updates = jax.tree_util.tree_map_with_path(
                    lambda path, u: jnp.zeros_like(u)
                    if _is_loss_free(path) else u,
                    updates)
                params = optax.apply_updates(params, updates)
            return params, opt_state, total, bce

        def eval_step(params, batch, dyn_w):
            total, (bce, leddi, out) = self._loss_fn(
                params, batch, dyn_w, jax.random.PRNGKey(0), False, dp)
            return total, bce, out["fused_logits"]

        def modality_probs_step(params, batch, dyn_w):
            out = self.model.apply({"params": params}, batch["model_inputs"],
                                   dynamic_weights=dyn_w, deterministic=True)
            ml = out["modality_logits"]
            # [B, modality, task]
            return jax.nn.sigmoid(jnp.stack([ml["demo"], ml["lab"], ml["text"]], axis=1))

        def dyn_stats_step(params, batch, dyn_w, threshold):
            """Per-batch sufficient statistics for the dynamic-weight update.

            Device output is O(1): per sensitive attribute, group counts [G]
            and per-(modality, task) error counts [M, T, G] — replacing the
            reference's full-train-set logits-to-CPU pass (10_FAME.py:335-351)
            and round 1's per-batch [B, M, T] prob pulls.  ``threshold`` is a
            traced scalar input (like ``dyn_w``), so callers can vary it
            without a recompile — it is live, matching 10_FAME.py:315-399.
            """
            probs = modality_probs_step(params, batch, dyn_w)      # [B, M, T]
            preds = (probs > threshold).astype(jnp.float32)
            err = (preds != batch["labels"][:, None, :]).astype(jnp.float32)
            w = batch["weight"]
            mi = batch["model_inputs"]
            stats = []
            for key, g in (("age_ids", GROUP_SIZES[0]),
                           ("ethnicity_ids", GROUP_SIZES[1]),
                           ("insurance_ids", GROUP_SIZES[2])):
                onehot = (mi[key][:, None] == jnp.arange(g)[None, :]).astype(
                    jnp.float32) * w[:, None]                       # [B, G]
                counts = jnp.sum(onehot, axis=0)                    # [G]
                errors = jnp.einsum("bmt,bg->mtg", err, onehot)     # [M, T, G]
                if dp is not None:
                    # Exact small-integer sums in fp32 — the psum cannot
                    # change them, so DP stats stay bit-identical to the
                    # single-device pass.
                    counts = jax.lax.psum(counts, dp)
                    errors = jax.lax.psum(errors, dp)
                stats.append((counts, errors))
            return tuple(stats)

        if self.mesh is not None and dp is None:
            from jax.sharding import NamedSharding, PartitionSpec

            scan_batch_sharding = NamedSharding(self.mesh,
                                                PartitionSpec("data"))
        else:
            # Single device, or DP shard_map: in the latter each shard
            # gathers only its own index columns (idx_mat arrives sharded
            # [steps, B/n] per device) — no GSPMD constraint needed.
            scan_batch_sharding = None

        def dyn_stats_scan(params, data, labels_, idx_mat, valid_mat, dyn_w,
                           threshold):
            """Whole dynamic-weight pass as ONE dispatch.

            ``lax.scan`` over the epoch's [steps, B] index matrix against the
            DeviceLoader's parked arrays: gather + modality inference + stat
            accumulation all stay in the graph, so the host pays a single
            dispatch and a single O(1) pull per epoch instead of ~steps of
            each.  Bit-identical to the batchwise path: the statistics are
            exact small-integer sums in fp32, so accumulation order cannot
            change them.

            Under a mesh, each gathered batch is sharding-constrained on the
            data axis (parked arrays stay replicated — the full cohort is
            ~180 MB), so the modality inference inside the scan runs
            data-parallel and GSPMD reduces the [G]/[M,T,G] statistics with
            psums; the stats are the same exact integer sums, so the
            single-device and mesh paths agree bit for bit.
            """
            def gather_batch(idx, valid):
                def take(a):
                    b = jnp.take(a, idx, axis=0)
                    mask = valid.reshape((-1,) + (1,) * (b.ndim - 1))
                    b = jnp.where(mask, b, jnp.zeros((), b.dtype))
                    if scan_batch_sharding is not None:
                        b = jax.lax.with_sharding_constraint(
                            b, scan_batch_sharding)
                    return b

                weight = valid.astype(jnp.float32)
                if scan_batch_sharding is not None:
                    weight = jax.lax.with_sharding_constraint(
                        weight, scan_batch_sharding)
                return {"model_inputs": {k: take(v) for k, v in data.items()},
                        "labels": take(labels_),
                        "weight": weight}

            def body(carry, iv):
                idx, valid = iv
                stats = dyn_stats_step(params, gather_batch(idx, valid),
                                       dyn_w, threshold)
                return jax.tree_util.tree_map(jnp.add, carry, stats), None

            init = tuple((jnp.zeros(g, jnp.float32),
                          jnp.zeros((3, 3, g), jnp.float32))
                         for g in GROUP_SIZES)
            carry, _ = jax.lax.scan(body, init, (idx_mat, valid_mat))
            return carry

        def extract_step(params, batch, dyn_w):
            out = self.model.apply({"params": params}, batch["model_inputs"],
                                   dynamic_weights=dyn_w, deterministic=True)
            return out["fused_logits"], out["gated_vector"], out["fusion_pre_relu"]

        if dp is not None:
            # Manual SPMD: batch subtrees split on their leading axis over
            # "data" (PartitionSpec prefixes extend with None), everything
            # else replicated.  Per-row outputs reassemble to global arrays;
            # scalars/stats leave psum'd, hence replicated on every shard.
            from jax.sharding import PartitionSpec as P

            B, R = P("data"), P()
            sm = lambda f, i, o: jax.shard_map(f, mesh=self.mesh,
                                               in_specs=i, out_specs=o)
            # train_step already contains its shard_map (around the loss
            # only, so grads are taken from outside — see loss_for_grad).
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
            self._eval_step = jax.jit(sm(eval_step, (R, B, R), (R, R, B)))
            self._modality_step = jax.jit(sm(modality_probs_step,
                                             (R, B, R), B))
            self._dyn_stats_step = jax.jit(sm(dyn_stats_step,
                                              (R, B, R, R), R))
            # Parked arrays + labels stay replicated on every chip (the whole
            # cohort is small); the [steps, B] index/valid matrices shard on
            # the batch column so each chip gathers + scores its own rows.
            scan_sm = sm(dyn_stats_scan,
                         (R, R, R, P(None, "data"), P(None, "data"), R, R), R)
            self._dyn_stats_scan = jax.jit(scan_sm)
            self._extract_step = jax.jit(sm(extract_step, (R, B, R), (B, B, B)))
        else:
            # Single device, or mixed data x model mesh: batch leaves are
            # device_put with a "data" sharding (see _put_batch); jit + GSPMD
            # propagates shardings and inserts the gradient psums.
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
            self._eval_step = jax.jit(eval_step)
            self._modality_step = jax.jit(modality_probs_step)
            self._dyn_stats_step = jax.jit(dyn_stats_step)
            self._dyn_stats_scan = jax.jit(dyn_stats_scan)
            self._extract_step = jax.jit(extract_step)

    def _rng_data(self) -> np.ndarray:
        """Raw uint32 words of the dropout RNG stream (checkpointable)."""
        if jnp.issubdtype(self._rng.dtype, jax.dtypes.prng_key):
            return np.asarray(jax.random.key_data(self._rng))
        return np.asarray(self._rng)

    def _restore_rng(self, data) -> None:
        if jnp.issubdtype(self._rng.dtype, jax.dtypes.prng_key):
            self._rng = jax.random.wrap_key_data(
                jnp.asarray(data), impl=jax.random.key_impl(self._rng))
        else:
            self._rng = jnp.asarray(data)

    def _put_batch(self, batch):
        if self.mesh is not None:
            from fairmultimodal_tpu.parallel import shard_batch

            return shard_batch(batch, self.mesh)
        return _batch_to_device(batch)

    # -- protocol ---------------------------------------------------------------

    def init_params(self, example_batch: Dict[str, Any]):
        # Init always uses a typed threefry stream so parameter draws are
        # independent of the dropout rng_impl choice (reproducibility).
        from fairmultimodal_tpu.utils.rng import threefry_key

        variables = self.model.init(threefry_key(self._init_seed),
                                    example_batch["model_inputs"])
        return variables["params"]

    def init_opt_state(self, params):
        return self.tx.init(params)

    def set_lr(self, opt_state, lr: float):
        """Mutate the injected learning-rate hyperparameter in place."""
        opt_state[1].hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state

    def train_epoch(self, params, opt_state, loader, log_every: int = 0):
        from fairmultimodal_tpu.data.prefetch import PrefetchLoader

        totals: List[jax.Array] = []
        bces: List[jax.Array] = []
        dyn_w = jnp.asarray(self.dynamic_weights)
        # Batch N+1's host->device transfer overlaps step N's compute, and
        # the per-step loss scalars stay on device until the epoch ends: a
        # float() per step would block dispatch on every step's completion —
        # one tunnel round-trip (~33 ms here) x ~100 steps per epoch.
        for batch in PrefetchLoader(loader, size=2, mesh=self.mesh):
            rng, self._rng = jax.random.split(self._rng)
            params, opt_state, total, bce = self._train_step(
                params, opt_state, batch, dyn_w, rng)
            totals.append(total)
            bces.append(bce)
        nb = len(totals)
        if nb:
            # One pull for the whole epoch.  np.sum uses pairwise summation,
            # so vs the old per-step `total += float(loss)` the logged loss
            # can differ in the last float64 ulp (logging-only; the fp32
            # step losses themselves are unchanged).
            stacked = np.asarray(jnp.stack(totals + bces))
            total_sum = float(np.sum(stacked[:nb], dtype=np.float64))
            bce_sum = float(np.sum(stacked[nb:], dtype=np.float64))
        else:
            total_sum = bce_sum = 0.0
        return params, opt_state, total_sum / max(nb, 1), bce_sum / max(nb, 1)

    def _windowed_eval(self, loader, dispatch, drain, window: int = 8):
        """Bounded-window eval drive: ``dispatch(batch)`` enqueues device
        work, ``drain(item)`` pulls a completed item's results to host.

        The per-batch blocking pull is the epoch-loop enemy on the tunnel
        (~33 ms per round-trip; see CLAUDE.md): draining ``window`` batches
        behind the dispatch keeps the device pipeline full while the host
        only ever blocks on work that is already ~window steps old.  Window 8
        is the measured sweet spot on the axon tunnel (models/text.py:
        883 vs 412 chunks/s; unbounded queues degrade with depth).
        """
        import collections

        from fairmultimodal_tpu.data.prefetch import PrefetchLoader

        pending = collections.deque()
        for batch in PrefetchLoader(loader, size=2, mesh=self.mesh):
            pending.append(dispatch(batch))
            if len(pending) >= window:
                drain(pending.popleft())
        while pending:
            drain(pending.popleft())

    def validate(self, params, loader) -> Tuple[float, np.ndarray, np.ndarray]:
        """Average val loss (BCE only, matching 10_FAME.py:825) + logits."""
        dyn_w = jnp.asarray(self.dynamic_weights)
        losses: List[float] = []
        logits_all, labels_all = [], []

        def dispatch(batch):
            _, bce, logits = self._eval_step(params, batch, dyn_w)
            return bce, logits, batch["weight"], batch["labels"]

        def drain(item):
            bce, logits, weight, labels = item
            losses.append(float(bce))
            keep = np.asarray(weight) > 0
            logits_all.append(np.asarray(logits)[keep])
            labels_all.append(np.asarray(labels)[keep])

        self._windowed_eval(loader, dispatch, drain)
        return (float(np.mean(losses)) if losses else float("inf"),
                np.concatenate(logits_all) if logits_all else np.zeros((0, 3)),
                np.concatenate(labels_all) if labels_all else np.zeros((0, 3)))

    def predict_logits(self, params, loader) -> Dict[str, np.ndarray]:
        dyn_w = jnp.asarray(self.dynamic_weights)
        out = {"logits": [], "labels": [], "age": [], "ethnicity": [], "insurance": []}

        def dispatch(batch):
            _, _, logits = self._eval_step(params, batch, dyn_w)
            return logits, batch

        def drain(item):
            logits, batch = item
            keep = np.asarray(batch["weight"]) > 0
            out["logits"].append(np.asarray(logits)[keep])
            out["labels"].append(np.asarray(batch["labels"])[keep])
            mi = batch["model_inputs"]
            out["age"].append(np.asarray(mi["age_ids"])[keep])
            out["ethnicity"].append(np.asarray(mi["ethnicity_ids"])[keep])
            out["insurance"].append(np.asarray(mi["insurance_ids"])[keep])

        self._windowed_eval(loader, dispatch, drain)
        return {k: np.concatenate(v) if v else np.zeros(0) for k, v in out.items()}

    def update_dynamic_weights(self, params, loader, threshold: float = 0.5) -> np.ndarray:
        """Per-epoch EDDI-guided weight update (10_FAME.py:315-399).

        Runs modality-head inference over the full training set, computes per
        (task, modality) combined EDDI over the three sensitive attributes,
        and nudges each weight by clip(beta*(eddi_max - eddi_m), ±0.05) with
        floor 0.1 and renormalization.

        The whole pass stays on device: each batch reduces to per-attribute
        (counts [G], errors [M, T, G]) sufficient statistics (exact integer
        sums in fp32, N << 2^24), so the host receives O(1) floats per batch
        instead of the reference's full logits array (10_FAME.py:335-351).
        EDDI from those stats is bit-identical to ``compute_eddi`` with
        ``complete_groups`` (see ``fairness.eddi.eddi_from_stats``).
        ``threshold`` is live: it enters the jitted step as a traced scalar
        (10_FAME.py:315-399 semantics), so non-default values work and never
        recompile.
        """
        from fairmultimodal_tpu.data.prefetch import PrefetchLoader
        from fairmultimodal_tpu.fairness.eddi import eddi_from_stats

        dyn_w = jnp.asarray(self.dynamic_weights)
        thr = jnp.float32(threshold)
        counts_tot = [np.zeros(g, np.float64) for g in GROUP_SIZES]
        errors_tot = [np.zeros((3, 3, g), np.float64) for g in GROUP_SIZES]
        if hasattr(loader, "epoch_index_matrix") and hasattr(loader, "_data"):
            # DeviceLoader fast path: the whole pass is one scan dispatch
            # against the parked arrays (same permutation-protocol epoch
            # consumption; stats are exact integer sums, so bit-identical).
            # Mesh or not — under a mesh the scan's gathers are constrained
            # to the data axis and the stat reductions become psums.
            idx_mat, valid_mat = loader.epoch_index_matrix()
            summed = self._dyn_stats_scan(
                params, loader._data, loader._labels, jnp.asarray(idx_mat),
                jnp.asarray(valid_mat), dyn_w, thr)
        else:
            # Per-batch stats stay on device; one pull at the end of the pass
            # (a per-batch np.asarray costs a blocking tunnel round-trip each).
            per_batch = [self._dyn_stats_step(params, batch, dyn_w, thr)
                         for batch in PrefetchLoader(loader, size=2,
                                                     mesh=self.mesh)]
            summed = jax.tree_util.tree_map(
                lambda *xs: jnp.sum(jnp.stack(xs), axis=0),
                *per_batch) if per_batch else None
        if summed is not None:
            for a, (counts, errors) in enumerate(summed):
                counts_tot[a] += np.asarray(counts, np.float64)
                errors_tot[a] += np.asarray(errors, np.float64)

        new_w = np.zeros_like(self.dynamic_weights)
        for t in range(3):
            eddis = []
            for m in range(3):
                per_attr = [eddi_from_stats(counts_tot[a], errors_tot[a][m, t])
                            for a in range(3)]
                eddis.append(combined_eddi(*per_attr))
            e_max = max(eddis)
            prev = self.dynamic_weights[t]
            upd = np.clip(self.config.beta * (e_max - np.asarray(eddis)), -0.05, 0.05)
            w = np.maximum(prev + upd, 0.1)
            new_w[t] = w / w.sum()
        self.dynamic_weights = new_w       # f64, like the reference
        return self.dynamic_weights

    def extract_vectors(self, params, loader) -> Dict[str, np.ndarray]:
        """Extraction pass matching ``extract_and_save_vectors``
        (10_FAME.py:559-604): per test row, the 768-d ``gated_vectors`` and
        512-d ``fusion_pre_relu_vectors`` plus labels/age/ethnicity/insurance
        under the reference's exact npz key names."""
        dyn_w = jnp.asarray(self.dynamic_weights)
        out = {"gated_vectors": [], "fusion_pre_relu_vectors": [], "labels": [],
               "age": [], "ethnicity": [], "insurance": []}

        def dispatch(batch):
            _, gated, pre_relu = self._extract_step(params, batch, dyn_w)
            return gated, pre_relu, batch

        def drain(item):
            gated, pre_relu, batch = item
            keep = np.asarray(batch["weight"]) > 0
            out["gated_vectors"].append(np.asarray(gated)[keep])
            out["fusion_pre_relu_vectors"].append(np.asarray(pre_relu)[keep])
            out["labels"].append(np.asarray(batch["labels"])[keep])
            mi = batch["model_inputs"]
            out["age"].append(np.asarray(mi["age_ids"])[keep])
            out["ethnicity"].append(np.asarray(mi["ethnicity_ids"])[keep])
            out["insurance"].append(np.asarray(mi["insurance_ids"])[keep])

        self._windowed_eval(loader, dispatch, drain)
        return {k: np.concatenate(v) if v else np.zeros(0) for k, v in out.items()}

    def fit(self, params, train_loader, val_loader, verbose: bool = True,
            on_epoch_end: Optional[Callable] = None, checkpointer=None):
        """Full protocol: epochs + plateau LR + early stop + best-state capture
        + per-epoch dynamic weight updates.  Returns (best_params, history).

        ``checkpointer`` (a ``utils.checkpoint.Checkpointer``) enables
        restartable training — absent in the reference (SURVEY §5,
        save-best-only): the full train state (params, opt state, best
        params, dynamic weights, schedule counters, dropout RNG stream, and
        the tracked per-epoch histories) is saved per epoch and restored
        automatically when a checkpoint exists, so a resumed run continues
        bit-identically (the train loader's shuffle phase is re-aligned to
        the resumed epoch when the loader exposes one).
        """
        cfg = self.config
        opt_state = self.init_opt_state(params)
        sched = PlateauScheduler(cfg.lr, cfg.scheduler_factor, cfg.scheduler_patience)
        stopper = EarlyStopper(cfg.patience)
        # Copy: the live params buffers are donated into the first train step.
        best_params = jax.tree_util.tree_map(jnp.copy, params)
        csv_rows = [("Epoch", "Outcome", "demo_weight", "lab_weight", "text_weight")]
        start_epoch = 0

        if checkpointer is not None:
            latest = checkpointer.latest_step()
            if latest is not None:
                template = {
                    "params": params, "opt_state": opt_state,
                    "best_params": best_params,
                    "dynamic_weights": self.dynamic_weights,
                    "scalars": np.zeros(5, np.float64),
                }
                state = checkpointer.restore(latest, template)
                params = state["params"]
                opt_state = state["opt_state"]
                best_params = state["best_params"]
                self.dynamic_weights = np.asarray(state["dynamic_weights"],
                                                  np.float64)
                sched.lr, sched.best, sched.num_bad, stopper.best, \
                    stopper.counter = state["scalars"].tolist()
                sched.num_bad = int(sched.num_bad)
                stopper.counter = int(stopper.counter)
                opt_state = self.set_lr(opt_state, sched.lr)
                start_epoch = latest
                aux = checkpointer.load_aux(latest)
                if aux is not None:
                    self._restore_rng(aux["rng"])
                    self.history = list(aux["history"])
                    self.tracked_dynamic_weights = {
                        t: list(v) for t, v in aux["tracked_dynamic_weights"].items()}
                    self.tracked_sigmoid_weights = list(aux["tracked_sigmoid_weights"])
                    csv_rows = [tuple(r) for r in aux["csv_rows"]]
                if verbose:
                    print(f"Resumed from checkpoint at epoch {latest}.")

        # Re-align the train loader's shuffle phase so epoch k of a resumed
        # run draws the same (seed, epoch) permutation as an uninterrupted
        # run (BatchIterator seeds per (seed, epoch) and counts iterations).
        inner = getattr(train_loader, "it", train_loader)
        if hasattr(inner, "epoch"):
            inner.epoch = start_epoch

        for epoch in range(start_epoch, cfg.num_epochs):
            t0 = time.time()
            params, opt_state, train_loss, train_bce = self.train_epoch(
                params, opt_state, train_loader)
            val_loss, _, _ = self.validate(params, val_loader)
            prev_lr = sched.lr
            lr = sched.step(val_loss)
            opt_state = self.set_lr(opt_state, lr)
            if verbose and lr != prev_lr:
                # torch ReduceLROnPlateau(verbose=True)-style decay line so
                # golden transcripts pin the scheduler trajectory.
                print(f"Epoch {epoch + 1}: reducing learning rate to {lr:.4e}.")
            if verbose:
                print(f"[Epoch {epoch + 1}] Train Loss: {train_loss:.4f} | "
                      f"Val Loss: {val_loss:.4f} ({time.time() - t0:.1f}s)")
            stop = stopper.step(val_loss)
            if stopper.improved:
                # Real device copy: the live params buffers are donated into
                # the next train step, so an aliasing capture would be
                # invalidated (donate_argnums=(0, 1)).
                best_params = jax.tree_util.tree_map(jnp.copy, params)
                if verbose:
                    print("Validation loss improved. Saving model...")
            elif verbose:
                print(f"No improvement for {stopper.counter} consecutive epochs.")
            self.history.append({"epoch": epoch + 1, "train_loss": train_loss,
                                 "train_bce": train_bce, "val_loss": val_loss,
                                 "lr": lr})
            if stop:
                if verbose:
                    print("Early stopping triggered.")
                break

            new_w = self.update_dynamic_weights(params, train_loader, cfg.threshold)
            for ti, task in enumerate(TASKS):
                self.tracked_dynamic_weights[task].append(list(map(float, new_w[ti])))
                csv_rows.append((epoch + 1, task, *[f"{v:.6f}" for v in new_w[ti]]))
                if verbose:
                    # Reference's per-outcome update line (10_FAME.py:397) —
                    # puts the dynamic-weight trajectory into the transcript.
                    print(f"[{task} Weight Update] New dynamic weights: "
                          f"{{'demo': {new_w[ti][0]:.6f}, "
                          f"'lab': {new_w[ti][1]:.6f}, "
                          f"'text': {new_w[ti][2]:.6f}}}")
            sig = jax.nn.sigmoid(params["fusion"]["sig_weights"])
            self.tracked_sigmoid_weights.append(np.asarray(sig))
            if checkpointer is not None:
                checkpointer.save(epoch + 1, {
                    "params": params, "opt_state": opt_state,
                    "best_params": best_params,
                    "dynamic_weights": self.dynamic_weights,
                    "scalars": np.asarray([sched.lr, sched.best, sched.num_bad,
                                           stopper.best, stopper.counter],
                                          np.float64),
                })
                checkpointer.save_aux(epoch + 1, {
                    "rng": self._rng_data(),
                    "history": self.history,
                    "tracked_dynamic_weights": self.tracked_dynamic_weights,
                    "tracked_sigmoid_weights": self.tracked_sigmoid_weights,
                    "csv_rows": csv_rows,
                })
            if on_epoch_end is not None:
                on_epoch_end(epoch, params)

        if self.dynamic_weights_csv:
            import csv as _csv

            with open(self.dynamic_weights_csv, "w", newline="") as f:
                _csv.writer(f).writerows(csv_rows)
        return best_params, self.history
