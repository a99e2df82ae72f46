"""Parallelism: device meshes, batch/param shardings, TP rules.

The reference is strictly single-device (SURVEY §1: no DDP/NCCL/AMP anywhere);
scale-out here is new TPU-first design:

- 1-D ``data`` axis over ICI for batch parallelism (the dominant axis for
  these model sizes), via ``NamedSharding`` on batch leading dims — XLA/GSPMD
  inserts the gradient psums.
- optional ``model`` axis for tensor parallelism of the BERT trunks: dense
  kernels are sharded column-wise (qkv/intermediate) and row-wise (output
  projections) by path-pattern rules, so activations flow sharded through
  each layer with a single all-reduce per block pair.
"""

from fairmultimodal_tpu.parallel.sharding import (
    get_mesh,
    shard_batch,
    replicate,
    shard_params_tp,
    DEFAULT_TP_RULES,
)

__all__ = [
    "get_mesh",
    "shard_batch",
    "replicate",
    "shard_params_tp",
    "DEFAULT_TP_RULES",
]
