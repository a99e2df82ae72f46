"""Device-resident training data: batches gathered in HBM, not shipped per step.

At reference scale the host batch path dominates the epoch: a full-geometry
FAME epoch over 24,934 synthetic patients measured ~35 s wall while its
train-step compute is ~12 s at the benched 2100 patients/sec/chip — the other
~2/3 is numpy fancy-indexing batch assembly on the single host core plus ~100
per-batch transfers through the axon TPU tunnel (the reference has the same
structure: a torch DataLoader feeding ``.to(device)`` copies every batch,
``10_FAME.py:409-410``).

:class:`DeviceLoader` removes that path entirely.  The split's feature arrays
are ``device_put`` into HBM **once** (the full 33.7k-patient cohort is ~180 MB
— trivial next to 16 GB), and each batch is produced by a tiny jitted gather:
the host sends only a ``[B]`` int32 index vector per step (~1 KB).  Pad rows
are zeroed and weight-masked, making every yielded batch **bit-identical** to
the host :class:`~fairmultimodal_tpu.data.loader.BatchIterator` path — the
same ``np.random.default_rng((seed, epoch))`` permutation protocol, the same
zero-padded final batch — so golden transcripts and resume alignment are
unchanged (``tests/test_device_data.py`` pins the equivalence).

Under a ``Mesh`` the parked arrays are replicated and the gathered batch is
constrained to the data axis, matching ``parallel.shard_batch`` placement.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DeviceLoader"]


class DeviceLoader:
    """Shuffled fixed-shape batches gathered on device from parked arrays.

    Drop-in for the pipelines' ``_NestingLoader(BatchIterator(...))`` stack:
    yields ``{"model_inputs": {...}, "labels": ..., "weight": ...}`` nested
    batches that are already device-resident (``device_resident = True`` makes
    ``PrefetchLoader`` pass them through untouched).

    Args:
      model_inputs: flat dict of per-patient arrays (leading dim N).
      labels: [N, T] float labels.
      batch_size: fixed batch size; the final batch is padded and masked.
      shuffle: per-epoch reshuffle with the BatchIterator RNG protocol.
      seed: shuffle seed (permutation = default_rng((seed, epoch))).
      mesh: optional device mesh — parks data replicated, shards batches on
        the mesh's "data" axis.
    """

    device_resident = True

    def __init__(self, model_inputs: Dict[str, np.ndarray], labels: np.ndarray,
                 batch_size: int, shuffle: bool = False, seed: int = 42,
                 mesh=None):
        sizes = {k: len(v) for k, v in model_inputs.items()}
        sizes["labels"] = len(labels)
        if len(set(sizes.values())) != 1:
            raise ValueError(f"ragged arrays: {sizes}")
        self.n = len(labels)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.mesh = mesh

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(mesh, PartitionSpec())
            self._batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
            put = lambda a: jax.device_put(jnp.asarray(a), replicated)  # noqa: E731
        else:
            self._batch_sharding = None
            put = lambda a: jax.device_put(jnp.asarray(a))  # noqa: E731
        self._put = put
        self._data = {k: put(v) for k, v in model_inputs.items()}
        self._labels = put(labels)

        batch_sharding = self._batch_sharding

        def gather(data, labels_, idx, valid):
            def take(a):
                b = jnp.take(a, idx, axis=0)
                # Zero pad rows so device batches equal BatchIterator's
                # zero-padded host batches bit for bit.
                mask = valid.reshape((-1,) + (1,) * (b.ndim - 1))
                b = jnp.where(mask, b, jnp.zeros((), b.dtype))
                if batch_sharding is not None:
                    b = jax.lax.with_sharding_constraint(b, batch_sharding)
                return b

            batch = {
                "model_inputs": {k: take(v) for k, v in data.items()},
                "labels": take(labels_),
                "weight": valid.astype(jnp.float32),
            }
            return batch

        self._gather = jax.jit(gather)

    def add_arrays(self, extra: Dict[str, np.ndarray]) -> None:
        """Park additional per-patient arrays; they appear under
        ``model_inputs`` in every subsequent batch (used by e.g. the
        FairEHR-CLP contrastive mode's precomputed synthetic views).  The
        gather re-traces automatically for the new pytree structure."""
        for k, v in extra.items():
            if len(v) != self.n:
                raise ValueError(f"{k}: length {len(v)} != {self.n}")
            self._data[k] = self._put(v)

    def __len__(self) -> int:
        return (self.n + self.batch_size - 1) // self.batch_size

    def epoch_index_matrix(self):
        """One epoch's batching as matrices: ([steps, B] int32, [steps, B] bool).

        Exactly ``__iter__``'s permutation protocol (same RNG draw, same
        zero-index padding, same epoch-counter consumption) — lets a caller
        run a whole epoch-shaped pass as ONE jitted ``lax.scan`` over the
        parked arrays instead of ~steps separate dispatches, while staying
        interchangeable with batchwise iteration (any reduction over the
        epoch that is permutation-exact — e.g. integer-count statistics —
        is bit-identical on either path).
        """
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(idx)
            self.epoch += 1
        steps = len(self)
        pad = steps * self.batch_size - self.n
        valid = np.ones(steps * self.batch_size, bool)
        if pad:
            idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
            valid[-pad:] = False
        return (idx.reshape(steps, self.batch_size).astype(np.int32),
                valid.reshape(steps, self.batch_size))

    def __iter__(self) -> Iterator[Dict]:
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(idx)
            self.epoch += 1
        bsz = self.batch_size
        for b in range(len(self)):
            sel = idx[b * bsz:(b + 1) * bsz]
            valid = np.ones(len(sel), bool)
            if len(sel) < bsz:
                pad = bsz - len(sel)
                sel = np.concatenate([sel, np.zeros(pad, sel.dtype)])
                valid = np.concatenate([valid, np.zeros(pad, bool)])
            sel_dev = jnp.asarray(sel, jnp.int32)
            valid_dev = jnp.asarray(valid)
            if self._batch_sharding is not None:
                sel_dev = jax.device_put(sel_dev, self._batch_sharding)
                valid_dev = jax.device_put(valid_dev, self._batch_sharding)
            yield self._gather(self._data, self._labels, sel_dev, valid_dev)
