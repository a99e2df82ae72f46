"""fused_clip_adamw_apply must be BIT-IDENTICAL to the optax chain it replaces.

The fused path (ops/optim.py::fused_clip_adamw_apply) collapses

    clip_by_global_norm_torch -> inject_hyperparams(adamw) -> freeze-mask
    -> optax.apply_updates

into one tree_map so XLA fuses the whole per-leaf update into a single HBM
pass.  Golden transcripts and the f64 trajectory oracles both run through
train_step, so the swap is only safe if the numerics are EXACTLY equal —
fp32 bitwise, not just allclose.  These tests pin that, plus the state
structure contract (checkpoints and set_lr interchangeable between paths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fairmultimodal_tpu.ops.optim import (clip_by_global_norm_torch,
                                          fused_clip_adamw_apply)

LR, WD, CLIP = 1e-3, 1e-5, 1.0
FROZEN = frozenset({"frozen_head"})


def _tx():
    return optax.chain(
        clip_by_global_norm_torch(CLIP),
        optax.inject_hyperparams(optax.adamw)(learning_rate=LR,
                                              weight_decay=WD),
    )


def _is_frozen(path) -> bool:
    return any(getattr(k, "key", None) in FROZEN for k in path)


def _params(dtype, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s), dtype)
    return {
        "dense": {"kernel": mk(16, 32), "bias": mk(32)},
        "frozen_head": {"kernel": mk(8, 3), "bias": mk(3)},
        "out": {"kernel": mk(32, 3)},
    }


def _grads_like(params, scale, seed):
    rng = np.random.default_rng(seed)
    g = jax.tree_util.tree_map(
        lambda p: jnp.asarray(scale * rng.normal(size=p.shape), p.dtype),
        params)
    # loss-free heads get EXACT-ZERO grads from autograd — replicate.
    g["frozen_head"] = jax.tree_util.tree_map(jnp.zeros_like,
                                              g["frozen_head"])
    return g


def _reference_step(tx, params, opt_state, grads):
    updates, opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map_with_path(
        lambda path, u: jnp.zeros_like(u) if _is_frozen(path) else u,
        updates)
    return optax.apply_updates(params, updates), opt_state


# The comparisons run UNDER JIT, matching production (train_step is always
# jitted).  Eager-vs-eager is NOT bitwise equal: optax's
# tree_bias_correction is itself a mini-jit, and XLA's f32 pow rounds
# differently inside vs outside a fused region (measured ~1 ulp at
# count>=3, amplified by the 1/(1-b2^n) cancellation) — a pow-context
# artifact, not an op-order divergence.  Inside one jit program both
# paths trace the identical op sequence and are bitwise equal.


@pytest.mark.parametrize("grad_scale", [0.01, 100.0],
                         ids=["unclipped", "clipped"])
def test_fused_bitwise_equals_optax_chain_fp32(grad_scale):
    tx = _tx()
    params_a = _params(jnp.float32)
    params_b = _params(jnp.float32)
    state_a = tx.init(params_a)
    state_b = tx.init(params_b)

    @jax.jit
    def step_chain(p, s, g):
        return _reference_step(tx, p, s, g)

    @jax.jit
    def step_fused(p, s, g):
        return fused_clip_adamw_apply(g, s, p, max_norm=CLIP,
                                      frozen_fn=_is_frozen)

    for step in range(6):
        grads = _grads_like(params_a, grad_scale, seed=step)
        params_a, state_a = step_chain(params_a, state_a, grads)
        params_b, state_b = step_fused(params_b, state_b, grads)

        for la, lb in zip(jax.tree_util.tree_leaves(params_a),
                          jax.tree_util.tree_leaves(params_b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        for la, lb in zip(jax.tree_util.tree_leaves(state_a),
                          jax.tree_util.tree_leaves(state_b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_fused_state_structure_and_set_lr_interchangeable():
    tx = _tx()
    params = _params(jnp.float32)
    state = tx.init(params)
    grads = _grads_like(params, 1.0, seed=7)

    _, fused_state = fused_clip_adamw_apply(
        grads, state, params, max_norm=CLIP, frozen_fn=_is_frozen)

    # Same treedef: checkpoints serialize/restore across paths.
    assert (jax.tree_util.tree_structure(state)
            == jax.tree_util.tree_structure(fused_state))
    # set_lr protocol (train/loop.py::set_lr) still works on fused output.
    fused_state[1].hyperparams["learning_rate"] = jnp.asarray(5e-4,
                                                              jnp.float32)
    # ...and the optax chain accepts the fused state unmodified.
    _reference_step(tx, params, fused_state, grads)
    # inject count advanced exactly once.
    assert int(fused_state[1].count) == int(state[1].count) + 1
    assert int(fused_state[1].inner_state[0].count) == 1


def test_fused_frozen_head_stays_bit_frozen():
    params = _params(jnp.float32)
    state = _tx().init(params)
    before = jax.tree_util.tree_map(np.asarray, params["frozen_head"])
    for step in range(3):
        grads = _grads_like(params, 1.0, seed=step)
        params, state = fused_clip_adamw_apply(
            grads, state, params, max_norm=CLIP, frozen_fn=_is_frozen)
    after = params["frozen_head"]
    np.testing.assert_array_equal(before["kernel"], np.asarray(after["kernel"]))
    np.testing.assert_array_equal(before["bias"], np.asarray(after["bias"]))


def test_fused_matches_chain_under_f64():
    # The f64 trajectory oracles (test_e2e_torch_parity) run train_step at
    # x64; the fused path must stay f64-clean (no silent f32 casts).
    with jax.enable_x64(True):
        tx = _tx()
        params_a = _params(jnp.float64, seed=3)
        params_b = _params(jnp.float64, seed=3)
        state_a = tx.init(params_a)
        state_b = tx.init(params_b)

        @jax.jit
        def step_chain(p, s, g):
            return _reference_step(tx, p, s, g)

        @jax.jit
        def step_fused(p, s, g):
            return fused_clip_adamw_apply(g, s, p, max_norm=CLIP,
                                          frozen_fn=_is_frozen)

        for step in range(4):
            grads = _grads_like(params_a, 10.0, seed=100 + step)
            params_a, state_a = step_chain(params_a, state_a, grads)
            params_b, state_b = step_fused(params_b, state_b, grads)
        for la, lb in zip(jax.tree_util.tree_leaves(params_a),
                          jax.tree_util.tree_leaves(params_b)):
            assert np.asarray(la).dtype == np.float64
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_fused_path_engaged_in_train_step_env_gate(monkeypatch):
    # The loop-level gate: FMTPU_FUSED_OPT=0 restores the optax chain and
    # both compile to the same numbers on a real compiled trainer step.
    from fairmultimodal_tpu.models.fusion import FAMEModel
    from fairmultimodal_tpu.pipelines.fame import make_loaders
    from fairmultimodal_tpu.train.loop import FAMETrainer, TrainConfig

    rng = np.random.default_rng(0)
    n, labs = 32, 6
    arrays = {
        "demo_dummy_ids": np.zeros((n, 1), np.int32),
        "demo_attn_mask": np.ones((n, 1), np.int32),
        "age_ids": rng.integers(0, 4, n).astype(np.int32),
        "gender_ids": rng.integers(0, 2, n).astype(np.int32),
        "ethnicity_ids": rng.integers(0, 5, n).astype(np.int32),
        "insurance_ids": rng.integers(0, 6, n).astype(np.int32),
        "lab_features": rng.normal(size=(n, labs)).astype(np.float32),
        "text_embedding": rng.normal(size=(n, 16)).astype(np.float32),
    }
    labels = rng.integers(0, 2, (n, 3)).astype(np.float32)

    def tiny_step(env_val):
        monkeypatch.setenv("FMTPU_FUSED_OPT", env_val)
        loaders = make_loaders(arrays, labels, {"train": np.arange(n)},
                               batch_size=16)
        model = FAMEModel(num_ages=4, num_genders=2, num_ethnicities=5,
                          num_insurances=6, lab_token_count=labs,
                          text_embed_size=16, hidden_size=16, demo_layers=1,
                          demo_heads=2, lab_layers=1, lab_heads=2,
                          fusion_hidden=8)
        trainer = FAMETrainer(model, TrainConfig(rng_impl="threefry"),
                              np.ones(3))
        batch = next(iter(loaders["train"]))
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        params = trainer.init_params(batch)
        opt_state = trainer.init_opt_state(params)
        dyn_w = jnp.asarray(trainer.dynamic_weights, jnp.float32)
        from fairmultimodal_tpu.utils.rng import threefry_key
        params2, _, total, _ = trainer._train_step(
            params, opt_state, batch, dyn_w, threefry_key(0))
        return jax.tree_util.tree_map(np.asarray, params2), float(total)

    p_fused, l_fused = tiny_step("1")
    p_chain, l_chain = tiny_step("0")
    assert l_fused == l_chain
    for la, lb in zip(jax.tree_util.tree_leaves(p_fused),
                      jax.tree_util.tree_leaves(p_chain)):
        np.testing.assert_array_equal(la, lb)
