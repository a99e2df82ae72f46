"""Host→device batch prefetching.

The reference's torch DataLoader blocks the training loop on every batch
copy; here each batch is `device_put` one step ahead of its use, so the
host-side assembly and the PCIe/tunnel transfer of batch N+1 overlap with
the device computing step N (JAX transfers are async: `device_put` returns
immediately and the arrays materialize in the background).

Usage::

    for batch in prefetch_to_device(loader, size=2):
        params, ... = train_step(params, ..., batch, ...)

Works with any iterable of (nested) numpy batch dicts, including
:class:`~fairmultimodal_tpu.data.loader.BatchIterator` and the pipelines'
``NestedLoader``.  Under a mesh, pass ``sharding`` to place each leaf
batch-sharded over the data axis instead of on the default device.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional

import jax

__all__ = ["prefetch_to_device", "PrefetchLoader"]


def prefetch_to_device(iterable: Iterable, size: int = 2,
                       sharding=None) -> Iterator:
    """Yield device-resident batches, keeping ``size`` transfers in flight."""
    if sharding is not None:
        put = lambda leaf: jax.device_put(leaf, sharding)  # noqa: E731
    else:
        put = jax.device_put
    queue = collections.deque()
    it = iter(iterable)

    def enqueue(n):
        for _ in range(n):
            try:
                batch = next(it)
            except StopIteration:
                return
            queue.append(jax.tree_util.tree_map(put, batch))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)


class PrefetchLoader:
    """Re-iterable wrapper: ``iter()`` returns a fresh prefetching pass."""

    def __init__(self, loader, size: int = 2, mesh=None):
        self.loader = loader
        self.size = size
        self._mesh = mesh   # leaves are batch-major; shard axis 0 over "data"

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        if getattr(self.loader, "device_resident", False):
            # DeviceLoader batches are already in HBM (gathered on device);
            # re-putting them would only add tunnel round-trips.  The loader
            # must have been parked under the same mesh, or a mesh trainer
            # would silently receive unsharded single-device batches.
            if self._mesh is not None and getattr(self.loader, "mesh",
                                                  None) is not self._mesh:
                raise ValueError(
                    "device-resident loader was built without the trainer's "
                    "mesh; pass mesh=... when constructing DeviceLoader "
                    "(e.g. prepare_experiment(..., mesh=mesh)).")
            return iter(self.loader)
        if self._mesh is not None:
            from fairmultimodal_tpu.parallel import shard_batch

            def gen():
                queue = collections.deque()
                it = iter(self.loader)

                def enqueue(n):
                    for _ in range(n):
                        try:
                            b = next(it)
                        except StopIteration:
                            return
                        queue.append(shard_batch(b, self._mesh))

                enqueue(self.size)
                while queue:
                    yield queue.popleft()
                    enqueue(1)

            return gen()
        return prefetch_to_device(self.loader, self.size)
