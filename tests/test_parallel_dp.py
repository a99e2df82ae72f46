"""Pure data-parallel (shard_map) trainer path over the virtual 8-device mesh.

Pure-DP meshes (model axis size 1) compile every trainer step through
``jax.shard_map`` with explicit psums instead of GSPMD propagation — the only
mesh mode that can run the Pallas megakernels on real multi-chip TPU (Mosaic
custom calls cannot be auto-partitioned by GSPMD).  These tests pin the
manual-SPMD path's numerics against single-device execution:

- eval loss/logits identical (deterministic forward, global masked means),
- per-shard grad + psum == global grad (the train step's composition),
- dynamic-weight statistics bit-identical (exact integer sums in fp32),
- the full fit protocol (DeviceLoader, windowed eval, scan dyn-pass) runs.

The reference has no distribution layer (SURVEY §1); this is our
infrastructure, tested to the same numerics-parity standard as
``test_parallel.py``'s GSPMD path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

@pytest.fixture(scope="module", autouse=True)
def _fresh_caches():
    """Free every compiled executable accumulated by earlier suite modules.

    The reference-geometry (768/12L) 8-virtual-device steps here are the
    suite's largest compilations; after ~150 tests of cached executables a
    full-suite run died with an uncaught allocation abort inside
    block_until_ready (standalone the module passes in isolation).  Clearing
    jit caches at module entry trades a few recompiles for headroom."""
    import jax as _jax

    _jax.clear_caches()
    yield

from fairmultimodal_tpu.data.device import DeviceLoader
from fairmultimodal_tpu.models.fusion import FAMEModel
from fairmultimodal_tpu.parallel import get_mesh, shard_batch
from fairmultimodal_tpu.train.loop import FAMETrainer, TrainConfig

from tests.test_parallel import _batch, _tiny_model


def test_dp_mode_selection():
    """model=1 meshes select the shard_map DP path; mixed meshes stay GSPMD."""
    model = _tiny_model()
    cfg = TrainConfig(lr=1e-3, batch_size=8)
    pw = np.ones(3, np.float32)
    assert FAMETrainer(model, cfg, pw)._dp_axis is None
    assert FAMETrainer(model, cfg, pw,
                       mesh=get_mesh(data=8, model=1))._dp_axis == "data"
    assert FAMETrainer(model, cfg, pw,
                       mesh=get_mesh(data=4, model=2))._dp_axis is None


def _single_and_dp(batch_n=16, seed=0, with_pad=False):
    model = _tiny_model()
    cfg = TrainConfig(lr=1e-3, batch_size=batch_n)
    pw = np.asarray([1.0, 2.0, 0.5], np.float32)
    batch = _batch(batch_n, seed=seed)
    if with_pad:
        # Mask the tail so the global masked-mean denominators differ from
        # the plain batch size — catches a psum'd numerator over a local
        # denominator (or vice versa).
        batch["weight"][-5:] = 0.0
    single = FAMETrainer(model, cfg, pw, rngs_seed=0)
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    params = single.init_params(jb)
    mesh = get_mesh(data=8, model=1)
    dp = FAMETrainer(model, cfg, pw, rngs_seed=0, mesh=mesh)
    return single, dp, mesh, params, batch, jb


@pytest.mark.parametrize("with_pad", [False, True])
def test_dp_eval_matches_single_device(with_pad):
    single, dp, mesh, params, batch, jb = _single_and_dp(with_pad=with_pad)
    dyn = jnp.asarray(single.dynamic_weights)
    t_s, bce_s, logits_s = single._eval_step(params, jb, dyn)
    t_d, bce_d, logits_d = dp._eval_step(params, shard_batch(batch, mesh), dyn)
    np.testing.assert_allclose(float(t_s), float(t_d), rtol=2e-5)
    np.testing.assert_allclose(float(bce_s), float(bce_d), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(logits_d),
                               rtol=2e-5, atol=1e-6)


def test_dp_grads_match_single_device():
    """Grad-through-the-shard_map equals the global single-device grad —
    the composition the DP train step relies on (train/loop.py builds
    value_and_grad OUTSIDE a shard_map of the loss).  Grad INSIDE the
    shard_map would be wrong: the psum transpose sums the per-shard
    cotangent seeds, inflating every gradient by exactly n_shards
    (measured 8x here before the fix)."""
    single, dp, mesh, params, batch, jb = _single_and_dp(with_pad=True)
    dyn = jnp.asarray(single.dynamic_weights)
    rng = jax.random.PRNGKey(0)

    g_single = jax.jit(jax.grad(
        lambda p: single._loss_fn(p, jb, dyn, rng, False)[0]))(params)

    loss_sm = jax.shard_map(
        lambda p, b: dp._loss_fn(p, b, dyn, rng, False, "data")[0],
        mesh=mesh, in_specs=(P(), P("data")), out_specs=P())
    g_dp = jax.jit(jax.grad(loss_sm))(params, shard_batch(batch, mesh))
    flat_s = jax.tree_util.tree_leaves(g_single)
    flat_d = jax.tree_util.tree_leaves(g_dp)
    assert len(flat_s) == len(flat_d)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dp_train_step_runs_and_params_stay_replicated():
    single, dp, mesh, params, batch, jb = _single_and_dp()
    opt_state = dp.init_opt_state(params)
    dyn = jnp.asarray(dp.dynamic_weights)
    params, opt_state, total, bce = dp._train_step(
        params, opt_state, shard_batch(batch, mesh), dyn, jax.random.PRNGKey(1))
    params, opt_state, total, bce = dp._train_step(
        params, opt_state, shard_batch(batch, mesh), dyn, jax.random.PRNGKey(2))
    jax.block_until_ready(total)
    assert np.isfinite(float(total)) and np.isfinite(float(bce))
    # Replicated params must be bit-synchronized on every device after the
    # psum'd-grad update (a drifting shard corrupts the whole run silently).
    leaf = params["fusion"]["sig_weights"]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_dyn_stats_bit_identical_to_single_device():
    """Scan fast path AND per-batch fallback under pure DP: exact integer
    sums, so any deviation from single device is a sharding bug."""
    from tests.test_parallel import _NoFastPath

    model = _tiny_model()
    cfg = TrainConfig(lr=1e-3, batch_size=8)
    pw = np.ones(3, np.float32)
    raw = _batch(20, seed=3)   # ragged: final batch zero-padded + masked

    def fresh_loader(mesh):
        return DeviceLoader(raw["model_inputs"], raw["labels"], batch_size=8,
                            shuffle=True, seed=7, mesh=mesh)

    single = FAMETrainer(model, cfg, pw, rngs_seed=0)
    jb = jax.tree_util.tree_map(jnp.asarray, _batch(8))
    params = single.init_params(jb)
    w_single = single.update_dynamic_weights(params, fresh_loader(None))

    mesh = get_mesh(data=8, model=1)
    dp = FAMETrainer(model, cfg, pw, rngs_seed=0, mesh=mesh)
    w_dp = dp.update_dynamic_weights(params, fresh_loader(mesh))

    dp2 = FAMETrainer(model, cfg, pw, rngs_seed=0, mesh=mesh)
    w_fb = dp2.update_dynamic_weights(params, _NoFastPath(fresh_loader(mesh)))

    np.testing.assert_array_equal(w_single, w_dp)
    np.testing.assert_array_equal(w_single, w_fb)


def test_dp_full_fit_with_deviceloader():
    """fit() end-to-end on a DP mesh with device-resident data: train epochs,
    windowed validation, scan dynamic-weight pass, early-stop bookkeeping."""
    model = _tiny_model()
    cfg = TrainConfig(lr=1e-3, num_epochs=2, batch_size=8)
    mesh = get_mesh(data=8, model=1)
    trainer = FAMETrainer(model, cfg, np.ones(3, np.float32), mesh=mesh)
    raw = _batch(24, seed=5)
    loader = DeviceLoader(raw["model_inputs"], raw["labels"], batch_size=8,
                          shuffle=True, seed=1, mesh=mesh)
    val_raw = _batch(8, seed=6)
    val_loader = DeviceLoader(val_raw["model_inputs"], val_raw["labels"],
                              batch_size=8, mesh=mesh)
    jb = jax.tree_util.tree_map(jnp.asarray, _batch(8))
    params = trainer.init_params(jb)
    best, history = trainer.fit(params, loader, val_loader, verbose=False)
    assert len(history) == 2
    assert all(np.isfinite(h["val_loss"]) for h in history)
    np.testing.assert_allclose(trainer.dynamic_weights.sum(axis=1), 1.0,
                               atol=1e-5)
    # The eval/extract drains reassemble global per-row outputs.
    preds = trainer.predict_logits(best, val_loader)
    assert preds["logits"].shape == (8, 3)
    vecs = trainer.extract_vectors(best, val_loader)
    assert vecs["gated_vectors"].shape[0] == 8


@pytest.mark.slow
def test_reference_geometry_dp_train_step():
    """The REAL 768/12L/12H FAME geometry compiles and steps through the
    pure-DP shard_map path on the virtual 8-device mesh (the toy geometry
    can't catch per-shard shape or VMA-typing issues at production dims)."""
    model = FAMEModel(num_ages=4, num_genders=2, num_ethnicities=5,
                      num_insurances=6, lab_token_count=549,
                      dtype=jnp.bfloat16)
    mesh = get_mesh(data=8, model=1)
    cfg = TrainConfig(lr=1e-4, batch_size=8)
    trainer = FAMETrainer(model, cfg, pos_weight=np.ones(3, np.float32),
                          mesh=mesh)
    assert trainer._dp_axis == "data"
    batch = _batch(8, labs=549, hidden=768)
    example = jax.tree_util.tree_map(jnp.asarray, batch)
    params = trainer.init_params(example)
    opt_state = trainer.init_opt_state(params)
    dyn_w = jnp.asarray(trainer.dynamic_weights)
    params, opt_state, total, bce = trainer._train_step(
        params, opt_state, shard_batch(batch, mesh), dyn_w,
        jax.random.PRNGKey(0))
    jax.block_until_ready(total)
    assert np.isfinite(float(total))
    assert np.isfinite(float(bce))


def test_dp_text_encode_matches_single_device():
    """encode_note_chunks under a pure-DP mesh (shard_map over chunk rows)
    matches the single-device path to last-ulp (per-shard matmul tiling
    reassociates; measured max 5e-7 abs on CPU), including the
    odd-batch-size round-up and zero vectors for note-less patients."""
    from fairmultimodal_tpu.models.bert import BertConfig
    from fairmultimodal_tpu.models.text import TextEncoder, encode_note_chunks

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=16)
    chunks = [["alpha beta", "gamma"], [], ["delta epsilon zeta"],
              ["eta", "theta iota", "kappa"], ["lambda"]]

    single = TextEncoder.from_pretrained("x/offline", fallback_config=cfg, seed=3)
    mesh = get_mesh(data=8, model=1)
    sharded = TextEncoder.from_pretrained("x/offline", fallback_config=cfg,
                                          seed=3, mesh=mesh)
    assert sharded._dp_size == 8

    # batch_size 6 is not divisible by 8: the encoder rounds it up with pad
    # rows only.
    ref = encode_note_chunks(single, chunks, max_length=16, batch_size=6)
    got = encode_note_chunks(sharded, chunks, max_length=16, batch_size=6)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    # mixed data x model meshes keep the plain replicated jit path
    mixed = TextEncoder.from_pretrained("x/offline", fallback_config=cfg,
                                        seed=3, mesh=get_mesh(data=4, model=2))
    assert mixed._dp_size == 1
    np.testing.assert_array_equal(
        encode_note_chunks(mixed, chunks, max_length=16, batch_size=6), ref)
    assert np.all(ref[1] == 0.0)  # note-less patient keeps the zero vector
