"""Multi-head attention with a Pallas fused kernel on TPU.

The encoders in this framework (BioClinicalBERT over 512-token note chunks,
BEHRT-Lab over ~550 lab-bin tokens) spend their attention FLOPs on sequence
lengths where a fused flash-style kernel avoids materializing the [B, H, S, S]
score tensor in HBM.  ``multi_head_attention`` dispatches:

- TPU + seq/head shapes aligned to the hardware tiles -> Pallas kernel
  (``fairmultimodal_tpu.ops.flash_attention``)
- anything else (CPU tests, tiny shapes, interpret mode) -> jnp einsum path
  that XLA fuses adequately.

Both paths compute identical math: softmax(QK^T/sqrt(d) + mask_bias) V with
fp32 softmax accumulation regardless of input dtype.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["multi_head_attention", "attention_reference"]


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """XLA attention: q,k,v [B, H, S, D]; mask [B, S] (1 = attend).

    Softmax in AT LEAST fp32 (bf16 inputs drift otherwise; f64 inputs — the
    float64 trajectory oracle — keep full precision); output cast back to
    the input dtype.
    """
    dtype = q.dtype
    acc = jnp.promote_types(dtype, jnp.float32)
    depth = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=acc)
    scores = scores / jnp.sqrt(jnp.asarray(depth, acc))
    if mask is not None:
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9).astype(acc)
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v,
                     preferred_element_type=acc)
    return out.astype(dtype)


def _can_use_pallas(q: jax.Array) -> bool:
    if jax.default_backend() not in ("tpu",):
        return False
    from fairmultimodal_tpu.ops import gates

    if not gates.kernels_enabled():
        # Force the XLA path — FMTPU_KERNELS=0, or force_xla_path() when
        # attention runs under a mixed data x model (TP) mesh on real TPU,
        # where GSPMD cannot partition Mosaic custom calls (pure-DP meshes
        # use shard_map instead and keep the kernels; decision record in
        # ops/gates.py, see train/loop.py).
        return False
    b, h, s, d = q.shape
    # Whole-S blocks are legal whenever the sublane tile divides S (16 covers
    # bf16 and fp32); head dims are the validated set (96 = the reference lab
    # encoder's 768/8 geometry — sub-128 lanes lower fine through Mosaic).
    return s % 16 == 0 and d in (32, 64, 96, 128) and 256 <= s <= 1024


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Dispatching MHA. Shapes: q,k,v [B, H, S, D]; mask [B, S]."""
    if q.shape[2] == 1:
        # One token attending to itself: softmax over a single key is 1, so
        # the output IS v and the Q/K projections are dead code XLA then
        # eliminates — the demo-BERT branch runs on a 1-token dummy input
        # (10_FAME.py:715-716), making this exact and free.
        return v
    if use_pallas is None:
        use_pallas = _can_use_pallas(q)
    if use_pallas:
        from fairmultimodal_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask)
    return attention_reference(q, k, v, mask)
