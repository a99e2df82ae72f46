"""DeviceLoader equivalence: on-device gathered batches must be bit-identical
to the host BatchIterator path (same shuffle protocol, same zero padding, same
weight mask) — that equivalence is what lets the device path be the default
without moving the golden transcripts."""

import jax
import jax.numpy as jnp
import numpy as np

from fairmultimodal_tpu.data.device import DeviceLoader
from fairmultimodal_tpu.data.loader import BatchIterator
from fairmultimodal_tpu.pipelines.fame import _NestingLoader


def _arrays(n=37, seed=0):
    rng = np.random.default_rng(seed)
    model_inputs = {
        "demo_dummy_ids": np.zeros((n, 1), np.int32),
        "demo_attn_mask": np.ones((n, 1), np.int32),
        "age_ids": rng.integers(0, 4, n).astype(np.int32),
        "gender_ids": rng.integers(0, 2, n).astype(np.int32),
        "ethnicity_ids": rng.integers(0, 5, n).astype(np.int32),
        "insurance_ids": rng.integers(0, 6, n).astype(np.int32),
        "lab_features": rng.normal(0, 1, (n, 6)).astype(np.float32),
        "text_embedding": rng.normal(0, 1, (n, 8)).astype(np.float32),
    }
    labels = rng.integers(0, 2, (n, 3)).astype(np.float32)
    return model_inputs, labels


def _host_loader(model_inputs, labels, bsz, shuffle, seed):
    flat = dict(model_inputs)
    flat["labels"] = labels
    return _NestingLoader(BatchIterator(flat, bsz, shuffle=shuffle, seed=seed))


def _assert_batches_equal(host_batches, dev_batches):
    assert len(host_batches) == len(dev_batches)
    for hb, db in zip(host_batches, dev_batches):
        np.testing.assert_array_equal(hb["labels"], np.asarray(db["labels"]))
        np.testing.assert_array_equal(hb["weight"], np.asarray(db["weight"]))
        for k in hb["model_inputs"]:
            np.testing.assert_array_equal(
                hb["model_inputs"][k], np.asarray(db["model_inputs"][k]),
                err_msg=k)


def test_unshuffled_batches_bit_identical():
    model_inputs, labels = _arrays()
    host = list(_host_loader(model_inputs, labels, 8, False, 42))
    dev = list(DeviceLoader(model_inputs, labels, 8, shuffle=False, seed=42))
    _assert_batches_equal(host, dev)


def test_shuffled_epochs_follow_batchiterator_protocol():
    """Two consecutive epochs: permutations must match per (seed, epoch)."""
    model_inputs, labels = _arrays(seed=1)
    host_it = _host_loader(model_inputs, labels, 16, True, 7)
    dev_it = DeviceLoader(model_inputs, labels, 16, shuffle=True, seed=7)
    for _ in range(2):
        _assert_batches_equal(list(host_it), list(dev_it))


def test_epoch_resume_alignment():
    """Setting .epoch (as FAMETrainer.fit does on resume) realigns draws."""
    model_inputs, labels = _arrays(seed=2)
    a = DeviceLoader(model_inputs, labels, 16, shuffle=True, seed=3)
    list(a)  # epoch 0 consumed
    ref = list(a)  # epoch 1
    b = DeviceLoader(model_inputs, labels, 16, shuffle=True, seed=3)
    b.epoch = 1
    _assert_batches_equal(ref, list(b))


def test_pad_rows_zeroed_and_masked():
    model_inputs, labels = _arrays(n=10)
    (batch,) = list(DeviceLoader(model_inputs, labels, 16, shuffle=False))
    w = np.asarray(batch["weight"])
    assert w[:10].all() and not w[10:].any()
    assert not np.asarray(batch["model_inputs"]["lab_features"][10:]).any()
    assert not np.asarray(batch["labels"][10:]).any()


def test_dynamic_weight_update_scan_matches_batchwise():
    """The one-dispatch lax.scan dyn pass must produce the same weights as
    the host-loader batchwise pass (stats are exact integer sums)."""
    from fairmultimodal_tpu.models.fusion import FAMEModel
    from fairmultimodal_tpu.train.loop import FAMETrainer, TrainConfig

    model_inputs, labels = _arrays(n=50, seed=4)
    model = FAMEModel(num_ages=4, num_genders=2, num_ethnicities=5,
                      num_insurances=6, lab_token_count=6, text_embed_size=8,
                      hidden_size=16, demo_layers=1, demo_heads=2,
                      lab_layers=1, lab_heads=2, fusion_hidden=8)
    cfg = TrainConfig(batch_size=16, rng_impl="threefry")
    trainer = FAMETrainer(model, cfg, np.ones(3, np.float32))
    host = _host_loader(model_inputs, labels, 16, True, 5)
    dev = DeviceLoader(model_inputs, labels, 16, shuffle=True, seed=5)
    params = trainer.init_params(next(iter(host)))

    w_host = trainer.update_dynamic_weights(params, host).copy()
    trainer.dynamic_weights = np.full((3, 3), 0.33)   # f64, like the trainer init
    w_dev = trainer.update_dynamic_weights(params, dev)
    np.testing.assert_allclose(w_host, w_dev, rtol=0, atol=0)
    assert dev.epoch == 1  # the scan path consumed the epoch like iteration


def test_under_mesh_batch_sharded_over_data_axis():
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    model_inputs, labels = _arrays(n=64)
    loader = DeviceLoader(model_inputs, labels, 16, shuffle=False, mesh=mesh)
    (b0, *_rest) = list(loader)
    sh = b0["model_inputs"]["lab_features"].sharding
    assert sh.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
        ndim=2)
    host = list(_host_loader(model_inputs, labels, 16, False, 42))
    _assert_batches_equal(host, [b0, *_rest])
