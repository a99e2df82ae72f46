"""Pallas TPU fused attention (forward + backward).

Replaces the reference's torch ``nn.MultiheadAttention``/HF BERT attention
(e.g. 10_FAME.py:214, HF BioClinicalBERT) on the TPU compute path.  The
encoders here run at S in {512 (note chunks), 640 (padded lab bins)}, so an
entire (batch, head) slice of K/V — and even the S x S score tile — fits in
VMEM.  The kernel therefore uses one grid cell per (b, h, q-block) and keeps
the whole softmax in fp32 registers/VMEM, never materializing the
``[B, H, S, S]`` score tensor in HBM.  That is the bandwidth win over the
unfused path; at these sizes it is equivalent to flash attention with a
single K/V tile.

Backward is a second Pallas kernel per (b, h): recomputes P = softmax(S) from
Q/K (cheaper than storing it), then

    dV = P^T dO
    dP = dO V^T
    dS = P * (dP - rowsum(dP * P))          # softmax VJP
    dQ = dS K * scale,  dK = dS^T Q * scale

wired up via ``jax.custom_vjp`` so ``jax.grad`` through the encoders uses it
transparently.  Numerical contract: softmax and all matmul accumulation in
fp32 regardless of input dtype; outputs cast back to the input dtype.

Padding mask is a per-key ``[B, S]`` 0/1 array (encoder-style bidirectional
attention; the reference never uses causal masks).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

NEG_INF = -1e9


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    """One (b, h, q-block) cell: O = softmax(Q K^T * scale + bias) V.

    Matmul operands stay in the input dtype (bf16 keeps the MXU at full
    rate); accumulation and the softmax run in fp32.
    """
    q = q_ref[0, 0]                                # [BQ, D], input dtype
    k = k_ref[0, 0]                                # [S, D]
    v = v_ref[0, 0]                                # [S, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    # mask_ref holds the whole [B, S] mask (a 1-row block would violate the
    # (8, 128) tiling); slice this batch row dynamically.
    row = mask_ref[pl.ds(pl.program_id(0), 1), :]  # [1, S]
    s = s + jnp.where(row > 0, 0.0, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)                    # bf16 operand for the MXU
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    """One (b, h) cell: full-S softmax VJP.

    Matmul operands stay in the input dtype (full-rate MXU for bf16); all
    accumulation in fp32.  P and dS are cast back to the operand dtype
    before re-entering the MXU — the standard mixed-precision flash-bwd
    recipe.
    """
    q = q_ref[0, 0]                               # [S, D], input dtype
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    row = mask_ref[pl.ds(pl.program_id(0), 1), :]  # [1, S]
    s = s + jnp.where(row > 0, 0.0, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)    # [S, S] fp32
    p_b = p.astype(q.dtype)

    dv = jax.lax.dot_general(p_b, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [S, D]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [S, S]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_b = (ds * scale).astype(q.dtype)
    dq = jnp.dot(ds_b, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds_b, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pick_block_q(s: int) -> int:
    # Whole-S q blocks up to 1024: the S x S fp32 score tile still fits VMEM
    # (1024^2 * 4B = 4 MB) and K/V are loaded once per (b, h) instead of
    # once per q block.
    if s <= 1024:
        return s
    # Above 1024 the whole-K/V-in-VMEM contract breaks: even with a blocked
    # forward, the BACKWARD kernel has no q-blocking and would materialize an
    # S x S fp32 score tile (> 4 MB) plus 7 [S, D] residents — OOM-prone in
    # VMEM.  Refuse loudly; multi_head_attention's gate falls back to the
    # XLA reference path for such shapes.
    raise ValueError(
        f"flash_attention: unsupported sequence length {s} (> 1024); the "
        f"single-K/V-tile kernel requires S <= 1024 — use attention_reference")


def _fwd_impl(q, k, v, mask, *, interpret: bool = False):
    b, h, s, d = q.shape
    bq = _pick_block_q(s)
    scale = 1.0 / (d ** 0.5)
    if mask is None:
        mask = jnp.ones((b, s), jnp.int32)
    grid = (b, h, s // bq)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda i, j, n: (i, j, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda i, j, n: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda i, j, n: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole [B, S] mask
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda i, j, n: (i, j, n, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=(3 * b * h * s * d + b * h * s * d) * q.dtype.itemsize,
            transcendentals=b * h * s * s,
        ),
        interpret=interpret,
    )(q, k, v, mask)


def _bwd_impl(q, k, v, mask, do, *, interpret: bool = False):
    b, h, s, d = q.shape
    scale = 1.0 / (d ** 0.5)
    if mask is None:
        mask = jnp.ones((b, s), jnp.int32)
    grid = (b, h)
    spec = pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    shapes = jax.ShapeDtypeStruct((b, h, s, d), q.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(shapes, shapes, shapes),
        grid=grid,
        in_specs=[spec, spec, spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM),  # whole [B, S] mask
                  spec],
        out_specs=(spec, spec, spec),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * s * s * d,
            bytes_accessed=7 * b * h * s * d * q.dtype.itemsize,
            transcendentals=b * h * s * s,
        ),
        interpret=interpret,
    )(q, k, v, mask, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, mask: Optional[jax.Array] = None,
                    interpret: bool = False):
    """Fused attention. q,k,v: [B, H, S, D]; mask: [B, S] (1 = attend).

    ``interpret=True`` runs the kernels in the Pallas interpreter (CPU
    parity tests).
    """
    return _fwd_impl(q, k, v, mask, interpret=interpret)


def _vjp_fwd(q, k, v, mask, interpret):
    out = _fwd_impl(q, k, v, mask, interpret=interpret)
    return out, (q, k, v, mask)


def _vjp_bwd(interpret, residuals, g):
    q, k, v, mask = residuals
    dq, dk, dv = _bwd_impl(q, k, v, mask, g, interpret=interpret)
    return dq, dk, dv, None


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
