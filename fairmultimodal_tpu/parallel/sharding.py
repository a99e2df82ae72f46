"""Mesh construction and sharding rules.

Layout reasoning (v5e-8 target): the FAME trainable graph is ~100M params
(demo-BERT dominates).  At batch 16-512 the arithmetic-intensity sweet spot
is pure data parallelism — gradients psum over ICI — so the default mesh is
1-D ``("data",)``.  Tensor parallelism over a second ``model`` axis is
available for the BERT trunks (hidden 768 / 12 heads shard cleanly up to 4
ways, intermediate 3072 up to 8) when per-chip memory or latency matters;
rules below shard qkv + FFN-in column-wise and attn-out + FFN-out row-wise,
the classic Megatron pairing that needs one all-reduce per block pair, which
GSPMD inserts automatically from these param shardings.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["get_mesh", "shard_batch", "replicate", "shard_params_tp",
           "DEFAULT_TP_RULES"]


def get_mesh(data: Optional[int] = None, model: int = 1,
             devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("data", "model") mesh over available devices.

    ``data=None`` uses all devices divided by ``model``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def shard_batch(batch, mesh: Mesh):
    """device_put every leaf with its leading axis split over "data"."""

    def put(x):
        spec = P("data", *([None] * (np.ndim(x) - 1))) if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params, opt state, scalars) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


# Path-pattern -> PartitionSpec for tensor parallelism of BERT-style trunks.
# Kernels are [in, out]; embeddings [vocab, hidden].
DEFAULT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # column-parallel: split the output features
    (r".*(query|key|value|qkv)/kernel$", P(None, "model")),
    (r".*(intermediate|ffn_in)/kernel$", P(None, "model")),
    # row-parallel: split the input features (all-reduce after)
    (r".*attention/output_dense/kernel$", P("model", None)),
    (r".*attn_out/kernel$", P("model", None)),
    (r".*layer_\d+/output/kernel$", P("model", None)),
    (r".*ffn_out/kernel$", P("model", None)),
    # column-parallel biases
    (r".*(query|key|value|qkv)/bias$", P("model")),
    (r".*(intermediate|ffn_in)/bias$", P("model")),
)


def shard_params_tp(params, mesh: Mesh, rules=DEFAULT_TP_RULES):
    """device_put params according to TP rules; everything else replicated.

    Divisibility guard: a rule only applies when the sharded dim divides by
    the mesh's model-axis size (e.g. 768 % 4 == 0); otherwise the param is
    replicated, so odd head counts degrade gracefully instead of crashing.
    """
    m = mesh.shape["model"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    out = []
    for path, leaf in flat:
        key = "/".join(getattr(k, "key", str(k)) for k in path)
        spec = P()
        for pattern, candidate in rules:
            if re.match(pattern, key):
                ok = True
                for axis_i, name in enumerate(candidate):
                    if name == "model" and leaf.shape[axis_i] % m != 0:
                        ok = False
                if ok:
                    spec = candidate
                break
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)
