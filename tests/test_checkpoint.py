"""Checkpoint/resume tests: npz round-trip and orbax full-state resume of
the FAME trainer (new capability vs the reference's save-best-only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairmultimodal_tpu.models.fusion import FAMEModel
from fairmultimodal_tpu.train.loop import FAMETrainer, TrainConfig
from fairmultimodal_tpu.utils.checkpoint import (
    Checkpointer,
    load_params_npz,
    save_params_npz,
)


def _setup(labs=6, hidden=8, n=24):
    rng = np.random.default_rng(0)
    model = FAMEModel(num_ages=4, num_genders=2, num_ethnicities=5,
                      num_insurances=6, lab_token_count=labs,
                      text_embed_size=hidden, hidden_size=hidden,
                      demo_layers=1, demo_heads=2, lab_layers=1, lab_heads=2,
                      fusion_hidden=8)
    batch = {
        "model_inputs": {
            "demo_dummy_ids": np.zeros((n, 1), np.int32),
            "demo_attn_mask": np.ones((n, 1), np.int32),
            "age_ids": rng.integers(0, 4, n).astype(np.int32),
            "gender_ids": rng.integers(0, 2, n).astype(np.int32),
            "ethnicity_ids": rng.integers(0, 5, n).astype(np.int32),
            "insurance_ids": rng.integers(0, 6, n).astype(np.int32),
            "lab_features": rng.normal(0, 1, (n, labs)).astype(np.float32),
            "text_embedding": rng.normal(0, 1, (n, hidden)).astype(np.float32),
        },
        "labels": rng.integers(0, 2, (n, 3)).astype(np.float32),
        "weight": np.ones(n, np.float32),
    }
    return model, batch


class _OneBatchLoader:
    def __init__(self, batch):
        self.batch = batch

    def __len__(self):
        return 1

    def __iter__(self):
        yield self.batch


def test_npz_roundtrip(tmp_path):
    model, batch = _setup()
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    params = model.init(jax.random.PRNGKey(0), jb["model_inputs"])["params"]
    path = str(tmp_path / "params.npz")
    save_params_npz(path, params)
    restored = load_params_npz(path, params)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(restored)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_fame_fit_resume(tmp_path):
    """Interrupting after 2 epochs and resuming must continue from epoch 3
    with the same dynamic weights and schedule state."""
    model, batch = _setup()
    loader = _OneBatchLoader(batch)
    ckdir = str(tmp_path / "ck")

    cfg = TrainConfig(lr=1e-3, num_epochs=2, batch_size=24)
    t1 = FAMETrainer(model, cfg, np.ones(3, np.float32), rngs_seed=0)
    params = t1.init_params(jax.tree_util.tree_map(jnp.asarray, batch))
    ck = Checkpointer(ckdir)
    t1.fit(params, loader, loader, verbose=False, checkpointer=ck)
    assert ck.latest_step() == 2
    w_after_2 = t1.dynamic_weights.copy()

    cfg2 = TrainConfig(lr=1e-3, num_epochs=4, batch_size=24)
    t2 = FAMETrainer(model, cfg2, np.ones(3, np.float32), rngs_seed=0)
    params2 = t2.init_params(jax.tree_util.tree_map(jnp.asarray, batch))
    ck2 = Checkpointer(ckdir)
    best2, history = t2.fit(params2, loader, loader, verbose=False,
                            checkpointer=ck2)
    # Resumed: epochs 3..4 were run, and the aux sidecar restored the
    # pre-resume history so artifacts cover ALL epochs, not just post-resume.
    assert [h["epoch"] for h in history] == [1, 2, 3, 4]
    assert history[:2] == t1.history[:2]
    assert len(t2.tracked_sigmoid_weights) == 4
    assert all(len(v) == 4 for v in t2.tracked_dynamic_weights.values())
    assert np.isfinite(t2.dynamic_weights).all()
    assert ck2.latest_step() == 4

    # Bit-identical continuation: an uninterrupted 4-epoch run (same seeds,
    # fresh checkpoint dir) must produce the same dynamic weights and history
    # — the RNG stream is checkpointed, so resume is exact, not approximate.
    t3 = FAMETrainer(model, cfg2, np.ones(3, np.float32), rngs_seed=0)
    params3 = t3.init_params(jax.tree_util.tree_map(jnp.asarray, batch))
    _, history3 = t3.fit(params3, loader, loader, verbose=False,
                         checkpointer=Checkpointer(str(tmp_path / "ck3")))
    np.testing.assert_array_equal(t2.dynamic_weights, t3.dynamic_weights)
    assert [h["val_loss"] for h in history] == [h["val_loss"] for h in history3]


def test_npz_metadata_roundtrip(tmp_path):
    from fairmultimodal_tpu.utils.checkpoint import load_metadata_npz

    model, batch = _setup()
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    params = model.init(jax.random.PRNGKey(0), jb["model_inputs"])["params"]
    path = str(tmp_path / "with_meta.npz")
    meta = {"model": {"hidden_size": 8}, "thresholds": {"mortality": 0.4},
            "dynamic_weights": [[0.3, 0.3, 0.4]] * 3}
    save_params_npz(path, params, metadata=meta)
    assert load_metadata_npz(path) == meta
    # params load unaffected by the metadata entry
    restored = load_params_npz(path, params)
    np.testing.assert_array_equal(
        np.asarray(restored["fusion"]["sig_weights"]),
        np.asarray(params["fusion"]["sig_weights"]))
    # files without metadata return None
    path2 = str(tmp_path / "plain.npz")
    save_params_npz(path2, params)
    assert load_metadata_npz(path2) is None
