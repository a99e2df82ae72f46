"""Fused transformer-FFN Pallas TPU kernels (forward + single-kernel backward).

Replaces the XLA lowering of the torch-style FFN block

    h   = relu(x @ W1 + b1)
    h_d = dropout(h)                     # train only
    out = h_d @ W2 + b2

used by ``TorchEncoderLayer`` (the reference's
``nn.TransformerEncoderLayer(d_model, nhead)`` FFN, 10_FAME.py:214 — ReLU,
dim_feedforward 2048, dropout 0.1).

Why a kernel: at the FAME bench geometry (rows R = B*S = 256*560, H = 768,
F = 2048) the [R, F] intermediate is 587 MB in bf16.  XLA cannot fuse through
two matmuls, so the unfused forward writes it once and reads it once
(1.17 GB of HBM round-trips), and the unfused backward materializes dh
([R, F]) again.  Here:

- **Forward** keeps the whole [block, F] intermediate in VMEM: one kernel does
  matmul1 -> bias -> ReLU -> dropout -> matmul2 -> bias, emitting only ``out``
  and the post-dropout activation ``h_d`` (the single residual the backward
  needs).  The dropout mask is generated on-core with ``pltpu.prng_seed`` /
  ``prng_random_bits`` (hardware RBG) — no mask tensor ever touches HBM.
- **Backward** is ONE kernel over row blocks producing all five gradients:
      dh  = (g @ W2^T) * s          s = 1[h_d > 0] / keep_prob
      dx  = dh @ W1^T               (per-block output)
      dW1 += x^T @ dh,  db1 += sum(dh)      (fp32 VMEM accumulators)
      dW2 += h_d^T @ g, db2 += sum(g)
  The mask needs no RNG replay: ``h_d = relu(h) * mask / keep`` is zero
  exactly where the ReLU or the mask zeroed it, so ``s = 1[h_d > 0]/keep`` is
  the complete ReLU+dropout VJP factor.  Accumulating the four weight/bias
  grads as constant-index output blocks across sequential grid steps keeps
  them in VMEM for the whole pass (~26 MB of fp32 accumulators + bf16
  weights — fine on v5e, whose physical VMEM measured 128 MB; the round-1
  ROADMAP's 16 MB assumption was the Mosaic *default* limit, raised here via
  ``vmem_limit_bytes``).

HBM traffic per layer at bench geometry: forward 1.03 GB vs ~1.6 GB unfused;
backward 1.26 GB vs ~3.8 GB — about 3.1 GB saved per layer-pass with zero
recompute FLOPs.

Numerical contract: all matmuls accumulate in fp32 (``preferred_element_type``)
with operands in the input dtype (full-rate MXU for bf16); ``h_d`` is stored
in the input dtype, exactly like XLA's residual; weight grads are accumulated
in fp32 and cast to the operand dtype on return (>= XLA's precision, which
accumulates per-row-block in fp32 but round-trips partials through bf16).

Dropout parity: keep-with-prob-(1-rate), scale by 1/(1-rate) — the same
distribution as ``nn.Dropout``/torch, but a different stream (per-block
hardware-RBG seeds).  Training draws therefore differ from the ``nn.Dropout``
path; deterministic/eval outputs are bitwise-independent of the choice.
"""

from __future__ import annotations

import os
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_ffn", "fused_ffn_ln", "fused_ffn_ln_infer", "can_use_fused_ffn"]

_LN_EPS = 1e-6   # flax nn.LayerNorm default (the XLA path's epsilon)

_VMEM_LIMIT = 100 * 1024 * 1024  # measured physical VMEM on v5e: 128 MB

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf, |abs err| <= 1.5e-7.

    Mosaic has no ``erf`` lowering (probed on v5e); this is exp-based and
    fully vectorizable.  The error is ~100x below bf16 resolution and two
    decades below the 1e-5 parity tolerance of the exact-gelu XLA path.
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu(u):
    """Exact (erf-based) gelu on fp32, matching ``nn.gelu(approximate=False)``
    — the BERT activation (models/bert.py:110)."""
    return 0.5 * u * (1.0 + _erf_approx(u * _INV_SQRT2))


def _dgelu(u):
    """gelu'(u) = Phi(u) + u * phi(u)."""
    phi = _INV_SQRT2PI * jnp.exp(-0.5 * u * u)
    cdf = 0.5 * (1.0 + _erf_approx(u * _INV_SQRT2))
    return cdf + u * phi


def _pick_block(r: int) -> int:
    # 512 rows keeps the dW contraction dim (= block) MXU-efficient and the
    # backward's working set ~48 MB; small inputs drop to the 128-row tile.
    return 512 if r >= 4096 else 128


def _pad_rows(x: jax.Array, rp: int) -> jax.Array:
    r = x.shape[0]
    if rp == r:
        return x
    return jnp.pad(x, ((0, rp - r), (0, 0)))


# -- forward --------------------------------------------------------------------


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, hd_ref, *, keep_threshold: int, inv_keep: float,
                apply_dropout: bool, activation: str):
    x = x_ref[:]                                             # [BR, H]
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)                    # [BR, F] fp32
    if activation == "relu":
        h = jnp.maximum(h, 0.0)
        if apply_dropout:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            bits = pltpu.bitcast(pltpu.prng_random_bits(h.shape), jnp.uint32)
            keep = bits < jnp.uint32(keep_threshold)
            h = jnp.where(keep, h * inv_keep, 0.0)
        hd = h.astype(hd_ref.dtype)       # post-relu/post-dropout residual
        hd_ref[:] = hd
        a = hd
    else:                                 # gelu: no inner dropout (BERT FFN)
        hd_ref[:] = h.astype(hd_ref.dtype)           # PRE-activation residual
        a = _gelu(h).astype(hd_ref.dtype)
    out = jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (out + b2_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def _fwd_impl(x, w1, b1, w2, b2, seed, *, rate: float, deterministic: bool,
              interpret: bool,
              activation: str = "relu") -> Tuple[jax.Array, jax.Array]:
    r, hdim = x.shape
    fdim = w1.shape[1]
    block = _pick_block(r)
    rp = pl.cdiv(r, block) * block
    xp = _pad_rows(x, rp)
    apply_dropout = (not deterministic) and rate > 0.0
    if activation != "relu":
        assert activation == "gelu", activation
        # BERT's FFN has no inner dropout (models/bert.py:109-111); the gelu
        # residual strategy (store pre-activation) cannot recover a mask.
        assert not apply_dropout, "gelu FFN supports no inner dropout"
    keep_prob = 1.0 - rate
    kernel = functools.partial(
        _fwd_kernel,
        keep_threshold=min(int(keep_prob * 2 ** 32), 2 ** 32 - 1),
        inv_keep=1.0 / keep_prob if apply_dropout else 1.0,
        apply_dropout=apply_dropout, activation=activation)
    # index maps receive (grid idx, scalar-prefetch ref) under
    # PrefetchScalarGridSpec — hence the extra unused argument.
    row = lambda i, s: (i, 0)
    const = lambda i, s: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rp // block,),
        in_specs=[
            pl.BlockSpec((block, hdim), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, fdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((fdim, hdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, hdim), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, fdim), row, memory_space=pltpu.VMEM),
        ),
    )
    out, hd = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((rp, hdim), x.dtype),
                   jax.ShapeDtypeStruct((rp, fdim), x.dtype)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * rp * hdim * fdim,
            bytes_accessed=(rp * hdim * 2 + rp * fdim + 2 * hdim * fdim)
            * x.dtype.itemsize,
            transcendentals=rp * fdim if activation == "gelu" else 0,
        ),
        interpret=interpret,
    )(seed, xp, w1, b1.reshape(1, fdim), w2, b2.reshape(1, hdim))
    # hd stays padded (it is only a backward residual); out is user-visible.
    return out[:r] if rp != r else out, hd


# -- backward (single kernel: dx + dW1 + db1 + dW2 + db2) ------------------------


def _bwd_kernel(x_ref, g_ref, hd_ref, w1_ref, w2_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                inv_keep: float, activation: str):
    i = pl.program_id(0)
    g = g_ref[:]                                             # [BR, H]
    hd = hd_ref[:]                                           # [BR, F]
    # dh = (g @ W2^T) * s.  relu: s is the combined ReLU+dropout VJP factor
    # recovered from the stored post-dropout activation (see module doc) and
    # the matmul2 operand IS hd.  gelu: hd stores the pre-activation u, so
    # s = gelu'(u) and the matmul2 operand a = gelu(u) is recomputed (VPU
    # work, no extra residual traffic).
    dh = jax.lax.dot_general(g, w2_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if activation == "relu":
        # Compare in fp32: Mosaic has no bf16 vector cmpf on this target.
        s = (hd.astype(jnp.float32) > 0).astype(jnp.float32) * inv_keep
        a = hd
    else:
        u = hd.astype(jnp.float32)
        s = _dgelu(u)
        a = _gelu(u).astype(hd.dtype)
    dh = dh * s
    dh_b = dh.astype(g.dtype)
    dx = jax.lax.dot_general(dh_b, w1_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    dw1_c = jax.lax.dot_general(x_ref[:], dh_b, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [H, F]
    dw2_c = jax.lax.dot_general(a, g, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [F, H]
    db1_c = jnp.sum(dh, axis=0, keepdims=True)                       # [1, F]
    db2_c = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)    # [1, H]

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = dw1_c
        dw2_ref[:] = dw2_c
        db1_ref[:] = db1_c
        db2_ref[:] = db2_c

    @pl.when(i > 0)
    def _():
        dw1_ref[:] += dw1_c
        dw2_ref[:] += dw2_c
        db1_ref[:] += db1_c
        db2_ref[:] += db2_c


def _bwd_impl(xp, w1, w2, hd, g, *, rate: float, deterministic: bool,
              interpret: bool, activation: str = "relu"):
    rp, hdim = xp.shape
    fdim = w1.shape[1]
    block = _pick_block(rp)
    assert rp % block == 0, (rp, block)  # xp/hd were padded by the forward
    apply_dropout = (not deterministic) and rate > 0.0
    kernel = functools.partial(
        _bwd_kernel, inv_keep=1.0 / (1.0 - rate) if apply_dropout else 1.0,
        activation=activation)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        kernel,
        grid=(rp // block,),
        in_specs=[
            pl.BlockSpec((block, hdim), row, memory_space=pltpu.VMEM),   # x
            pl.BlockSpec((block, hdim), row, memory_space=pltpu.VMEM),   # g
            pl.BlockSpec((block, fdim), row, memory_space=pltpu.VMEM),   # h_d
            pl.BlockSpec((hdim, fdim), const, memory_space=pltpu.VMEM),  # W1
            pl.BlockSpec((fdim, hdim), const, memory_space=pltpu.VMEM),  # W2
        ],
        out_specs=(
            pl.BlockSpec((block, hdim), row, memory_space=pltpu.VMEM),   # dx
            pl.BlockSpec((hdim, fdim), const, memory_space=pltpu.VMEM),  # dW1
            pl.BlockSpec((1, fdim), const, memory_space=pltpu.VMEM),     # db1
            pl.BlockSpec((fdim, hdim), const, memory_space=pltpu.VMEM),  # dW2
            pl.BlockSpec((1, hdim), const, memory_space=pltpu.VMEM),     # db2
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rp, hdim), g.dtype),
            jax.ShapeDtypeStruct((hdim, fdim), jnp.float32),
            jax.ShapeDtypeStruct((1, fdim), jnp.float32),
            jax.ShapeDtypeStruct((fdim, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=8 * rp * hdim * fdim,
            bytes_accessed=(3 * rp * hdim + rp * fdim) * g.dtype.itemsize
            + 2 * hdim * fdim * (g.dtype.itemsize + 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, g, hd, w1, w2)
    return dx, dw1, db1, dw2, db2


# -- custom-vjp wiring ------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_ffn(x, w1, b1, w2, b2, seed, rate: float = 0.1,
              deterministic: bool = True, interpret: bool = False,
              activation: str = "relu"):
    """Fused FFN: ``dropout(act(x @ w1 + b1)) @ w2 + b2``.

    Args:
      x: [R, H] activations (bf16 or fp32).
      w1/b1/w2/b2: FFN weights in the compute dtype ([H, F], [F], [F, H], [H]).
      seed: [1] int32 dropout seed (ignored when deterministic or rate == 0).
      rate: dropout probability after the ReLU (static).
      deterministic: disables dropout (static).
      interpret: run the kernels in the Pallas interpreter (CPU tests).
      activation: "relu" (torch TransformerEncoderLayer) or "gelu" (exact,
        BERT intermediate; inner dropout must be off — BERT has none).

    Returns [R, H] in ``x.dtype``.  Differentiable via a single-kernel
    backward (see module docstring); ``seed`` gets a zero cotangent.
    """
    out, _ = _fwd_impl(x, w1, b1, w2, b2, seed, rate=rate,
                       deterministic=deterministic, interpret=interpret,
                       activation=activation)
    return out


def _vjp_fwd(x, w1, b1, w2, b2, seed, rate, deterministic, interpret,
             activation):
    out, hd = _fwd_impl(x, w1, b1, w2, b2, seed, rate=rate,
                        deterministic=deterministic, interpret=interpret,
                        activation=activation)
    block = _pick_block(x.shape[0])
    xp = _pad_rows(x, pl.cdiv(x.shape[0], block) * block)
    return out, (xp, w1, w2, hd)


def _vjp_bwd(rate, deterministic, interpret, activation, residuals, g):
    xp, w1, w2, hd = residuals
    r = g.shape[0]
    gp = _pad_rows(g, xp.shape[0])
    dx, dw1, db1, dw2, db2 = _bwd_impl(
        xp, w1, w2, hd, gp, rate=rate, deterministic=deterministic,
        interpret=interpret, activation=activation)
    dseed = np.zeros((1,), jax.dtypes.float0)
    return (dx[:r] if xp.shape[0] != r else dx,
            dw1.astype(w1.dtype), db1.reshape(-1).astype(w1.dtype),
            dw2.astype(w2.dtype), db2.reshape(-1).astype(w2.dtype), dseed)


fused_ffn.defvjp(_vjp_fwd, _vjp_bwd)


# -- LN-epilogue variant: LayerNorm(x + dropout(ffn(x))) --------------------------
#
# Folds the ENTIRE torch post-LN FFN half-layer —
#
#     y   = dropout(relu(x @ W1 + b1)) @ W2 + b2     (inner dropout)
#     out = LayerNorm(x + dropout(y))                (outer dropout + norm2)
#
# — into the same one-forward/one-backward kernel pair.  This removes the
# remaining per-layer XLA glue after the round-2 kernels: the [R, H] outer
# dropout mask generation, the residual add, and the LayerNorm each
# round-tripped the [R, H] activation through HBM (~3 reads + 2 writes at
# bench geometry ≈ 1.1 GB/layer) and are now VMEM-resident epilogue math.
#
# Residual strategy: the backward needs the LN input; we store it as ``z``
# in the input dtype and recompute mean/rstd from the STORED (rounded)
# value in both passes, so forward and backward see bit-identical
# statistics — and the information content matches the XLA path exactly
# (there the residual add produces a bf16 tensor before LN too).
#
# Dropout replay: the inner mask still needs no RNG in the backward
# (recovered from h_d); the OUTER mask cannot be recovered from stored
# tensors, so the backward replays it — ``pltpu.prng_seed(seed2 + i)`` with
# the same per-block seed and draw shape reproduces the forward's bits
# exactly (the on-core PRNG is deterministic per seed).  ``seed`` is [2]
# int32: stream 0 = inner mask, stream 1 = outer mask.


def _ln_fwd_math(x32, y32, gamma_ref, beta_ref, z_ref, eps=_LN_EPS,
                 store=True):
    """Shared epilogue: z = x + y (stored rounded), LN(z) in fp32."""
    z = (x32 + y32).astype(z_ref.dtype)
    if store:
        z_ref[:] = z
    zz = z.astype(jnp.float32)
    mu = jnp.mean(zz, axis=-1, keepdims=True)
    var = jnp.mean((zz - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (zz - mu) * rstd
    return xhat * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)


def _ln_bwd_math(g32, z, gamma_ref, eps=_LN_EPS):
    """LN VJP from the stored z: returns (dz [BR,H], dgamma_c, dbeta_c)."""
    hdim = z.shape[-1]
    zz = z.astype(jnp.float32)
    mu = jnp.mean(zz, axis=-1, keepdims=True)
    var = jnp.mean((zz - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (zz - mu) * rstd
    gg = g32 * gamma_ref[:].astype(jnp.float32)
    m1 = jnp.sum(gg, axis=-1, keepdims=True) / hdim
    m2 = jnp.sum(gg * xhat, axis=-1, keepdims=True) / hdim
    dz = rstd * (gg - m1 - xhat * m2)
    dgamma_c = jnp.sum(g32 * xhat, axis=0, keepdims=True)
    dbeta_c = jnp.sum(g32, axis=0, keepdims=True)
    return dz, dgamma_c, dbeta_c


def _fwd_ln_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   gamma_ref, beta_ref, out_ref, hd_ref, z_ref, *,
                   keep_threshold: int, inv_keep: float, apply_dropout: bool,
                   activation: str, ln_eps: float, store: bool = True):
    x = x_ref[:]
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    if activation == "relu":
        h = jnp.maximum(h, 0.0)
        if apply_dropout:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            bits = pltpu.bitcast(pltpu.prng_random_bits(h.shape), jnp.uint32)
            h = jnp.where(bits < jnp.uint32(keep_threshold), h * inv_keep, 0.0)
        hd = h.astype(hd_ref.dtype)
        if store:                # residual exists only for the backward
            hd_ref[:] = hd
        a = hd
    else:                                 # gelu: no inner dropout (BERT FFN)
        if store:
            hd_ref[:] = h.astype(hd_ref.dtype)
        a = _gelu(h).astype(hd_ref.dtype)
    y = jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[:].astype(jnp.float32)
    if apply_dropout:
        pltpu.prng_seed(seed_ref[1] + pl.program_id(0))
        obits = pltpu.bitcast(pltpu.prng_random_bits(y.shape), jnp.uint32)
        y = jnp.where(obits < jnp.uint32(keep_threshold), y * inv_keep, 0.0)
    out = _ln_fwd_math(x.astype(jnp.float32), y, gamma_ref, beta_ref, z_ref,
                       ln_eps, store=store)
    out_ref[:] = out.astype(out_ref.dtype)


def _fwd_ln_impl(x, w1, b1, w2, b2, gamma, beta, seed, *, rate: float,
                 deterministic: bool, interpret: bool,
                 activation: str = "relu", ln_eps: float = _LN_EPS,
                 store_residuals: bool = True):
    r, hdim = x.shape
    fdim = w1.shape[1]
    block = _pick_block(r)
    rp = pl.cdiv(r, block) * block
    xp = _pad_rows(x, rp)
    apply_dropout = (not deterministic) and rate > 0.0
    if activation != "relu":
        assert activation == "gelu", activation
    keep_prob = 1.0 - rate
    kernel = functools.partial(
        _fwd_ln_kernel,
        keep_threshold=min(int(keep_prob * 2 ** 32), 2 ** 32 - 1),
        inv_keep=1.0 / keep_prob if apply_dropout else 1.0,
        apply_dropout=apply_dropout, activation=activation, ln_eps=ln_eps,
        store=store_residuals)
    row = lambda i, s: (i, 0)
    const = lambda i, s: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rp // block,),
        in_specs=[
            pl.BlockSpec((block, hdim), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, fdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((fdim, hdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, hdim), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, fdim), row, memory_space=pltpu.VMEM)
            if store_residuals else
            pl.BlockSpec((8, 128), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, hdim), row, memory_space=pltpu.VMEM)
            if store_residuals else
            pl.BlockSpec((8, 128), const, memory_space=pltpu.VMEM),
        ),
    )
    out, hd, z = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((rp, hdim), x.dtype),
                   jax.ShapeDtypeStruct((rp, fdim), x.dtype)
                   if store_residuals else
                   jax.ShapeDtypeStruct((8, 128), x.dtype),
                   jax.ShapeDtypeStruct((rp, hdim), x.dtype)
                   if store_residuals else
                   jax.ShapeDtypeStruct((8, 128), x.dtype)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * rp * hdim * fdim,
            bytes_accessed=(rp * hdim * 3 + rp * fdim + 2 * hdim * fdim)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seed, xp, w1, b1.reshape(1, fdim), w2, b2.reshape(1, hdim),
      gamma.reshape(1, hdim), beta.reshape(1, hdim))
    return out[:r] if rp != r else out, hd, z


def fused_ffn_ln_infer(x, w1, b1, w2, b2, gamma, beta,
                       interpret: bool = False, activation: str = "relu",
                       ln_eps: float = _LN_EPS):
    """Inference-only FFN half-layer: identical math to :func:`fused_ffn_ln`
    with dropout off, but the post-activation residual (``[R, F]`` — 4x the
    output payload) and the pre-LN ``z`` are never written; they exist only
    for the backward.  Wall-clock neutral on the real chip (the stores
    overlap compute — see fused_attention_block_ln_infer); saves ~500 MB of
    dead HBM writes per BERT layer per 128x512 batch.  NOT differentiable —
    use the training entry point wherever gradients may be requested.
    """
    out, _, _ = _fwd_ln_impl(
        x, w1, b1, w2, b2, gamma, beta, jnp.zeros((2,), jnp.int32),
        rate=0.0, deterministic=True, interpret=interpret,
        activation=activation, ln_eps=ln_eps, store_residuals=False)
    return out


def _bwd_ln_kernel(seed_ref, x_ref, g_ref, hd_ref, z_ref, w1_ref, w2_ref,
                   gamma_ref,
                   dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                   dgamma_ref, dbeta_ref, *, inv_keep: float,
                   keep_threshold: int, apply_dropout: bool,
                   activation: str, ln_eps: float):
    i = pl.program_id(0)
    g32 = g_ref[:].astype(jnp.float32)                        # [BR, H]
    dz, dgamma_c, dbeta_c = _ln_bwd_math(g32, z_ref[:], gamma_ref, ln_eps)

    # Outer-dropout mask replay (stream 1, same per-block seed as forward).
    dy = dz
    if apply_dropout:
        pltpu.prng_seed(seed_ref[1] + i)
        obits = pltpu.bitcast(pltpu.prng_random_bits(dz.shape), jnp.uint32)
        dy = jnp.where(obits < jnp.uint32(keep_threshold), dz * inv_keep, 0.0)

    hd = hd_ref[:]                                            # [BR, F]
    dy_b = dy.astype(g_ref.dtype)
    dh = jax.lax.dot_general(dy_b, w2_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if activation == "relu":
        s = (hd.astype(jnp.float32) > 0).astype(jnp.float32) * inv_keep
        a = hd
    else:                                 # gelu: hd is the pre-activation
        u = hd.astype(jnp.float32)
        s = _dgelu(u)
        a = _gelu(u).astype(hd.dtype)
    dh = dh * s
    dh_b = dh.astype(g_ref.dtype)
    dx = dz + jax.lax.dot_general(dh_b, w1_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    dw1_c = jax.lax.dot_general(x_ref[:], dh_b, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dw2_c = jax.lax.dot_general(a, dy_b, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    db1_c = jnp.sum(dh, axis=0, keepdims=True)
    db2_c = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = dw1_c
        dw2_ref[:] = dw2_c
        db1_ref[:] = db1_c
        db2_ref[:] = db2_c
        dgamma_ref[:] = dgamma_c
        dbeta_ref[:] = dbeta_c

    @pl.when(i > 0)
    def _():
        dw1_ref[:] += dw1_c
        dw2_ref[:] += dw2_c
        db1_ref[:] += db1_c
        db2_ref[:] += db2_c
        dgamma_ref[:] += dgamma_c
        dbeta_ref[:] += dbeta_c


def _bwd_ln_impl(xp, w1, w2, gamma, hd, z, g, seed, *, rate: float,
                 deterministic: bool, interpret: bool,
                 activation: str = "relu", ln_eps: float = _LN_EPS):
    rp, hdim = xp.shape
    fdim = w1.shape[1]
    block = _pick_block(rp)
    assert rp % block == 0, (rp, block)
    apply_dropout = (not deterministic) and rate > 0.0
    keep_prob = 1.0 - rate
    kernel = functools.partial(
        _bwd_ln_kernel,
        inv_keep=1.0 / keep_prob if apply_dropout else 1.0,
        keep_threshold=min(int(keep_prob * 2 ** 32), 2 ** 32 - 1),
        apply_dropout=apply_dropout, activation=activation, ln_eps=ln_eps)
    row = lambda i, s: (i, 0)
    const = lambda i, s: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rp // block,),
        in_specs=[
            pl.BlockSpec((block, hdim), row, memory_space=pltpu.VMEM),   # x
            pl.BlockSpec((block, hdim), row, memory_space=pltpu.VMEM),   # g
            pl.BlockSpec((block, fdim), row, memory_space=pltpu.VMEM),   # h_d
            pl.BlockSpec((block, hdim), row, memory_space=pltpu.VMEM),   # z
            pl.BlockSpec((hdim, fdim), const, memory_space=pltpu.VMEM),  # W1
            pl.BlockSpec((fdim, hdim), const, memory_space=pltpu.VMEM),  # W2
            pl.BlockSpec((1, hdim), const, memory_space=pltpu.VMEM),     # gamma
        ],
        out_specs=(
            pl.BlockSpec((block, hdim), row, memory_space=pltpu.VMEM),   # dx
            pl.BlockSpec((hdim, fdim), const, memory_space=pltpu.VMEM),  # dW1
            pl.BlockSpec((1, fdim), const, memory_space=pltpu.VMEM),     # db1
            pl.BlockSpec((fdim, hdim), const, memory_space=pltpu.VMEM),  # dW2
            pl.BlockSpec((1, hdim), const, memory_space=pltpu.VMEM),     # db2
            pl.BlockSpec((1, hdim), const, memory_space=pltpu.VMEM),     # dgamma
            pl.BlockSpec((1, hdim), const, memory_space=pltpu.VMEM),     # dbeta
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rp, hdim), g.dtype),
            jax.ShapeDtypeStruct((hdim, fdim), jnp.float32),
            jax.ShapeDtypeStruct((1, fdim), jnp.float32),
            jax.ShapeDtypeStruct((fdim, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=8 * rp * hdim * fdim,
            bytes_accessed=(4 * rp * hdim + rp * fdim) * g.dtype.itemsize
            + 2 * hdim * fdim * (g.dtype.itemsize + 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(seed, xp, g, hd, z, w1, w2, gamma.reshape(1, hdim))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def fused_ffn_ln(x, w1, b1, w2, b2, gamma, beta, seed, rate: float = 0.1,
                 deterministic: bool = True, interpret: bool = False,
                 activation: str = "relu", ln_eps: float = _LN_EPS):
    """Fused FFN half-layer: ``LayerNorm(x + dropout(ffn(x)))``.

    The complete torch post-LN FFN block of ``TorchEncoderLayer``
    (10_FAME.py:214 semantics): inner dropout after the ReLU, outer dropout
    on the FFN output, residual add, LayerNorm.  ``seed`` is [2] int32
    (inner/outer streams); both ignored when deterministic.  With
    ``activation="gelu"`` it is the BERT FFN half-layer instead (exact gelu,
    no inner dropout — BERT has none; pass ``ln_eps=1e-12``).  Returns
    [R, H] in ``x.dtype``.
    """
    out, _, _ = _fwd_ln_impl(x, w1, b1, w2, b2, gamma, beta, seed,
                             rate=rate, deterministic=deterministic,
                             interpret=interpret, activation=activation,
                             ln_eps=ln_eps)
    return out


def _vjp_ln_fwd(x, w1, b1, w2, b2, gamma, beta, seed, rate, deterministic,
                interpret, activation, ln_eps):
    out, hd, z = _fwd_ln_impl(x, w1, b1, w2, b2, gamma, beta, seed,
                              rate=rate, deterministic=deterministic,
                              interpret=interpret, activation=activation,
                              ln_eps=ln_eps)
    block = _pick_block(x.shape[0])
    xp = _pad_rows(x, pl.cdiv(x.shape[0], block) * block)
    return out, (xp, w1, w2, gamma, hd, z, seed)


def _vjp_ln_bwd(rate, deterministic, interpret, activation, ln_eps,
                residuals, g):
    xp, w1, w2, gamma, hd, z, seed = residuals
    r = g.shape[0]
    gp = _pad_rows(g, xp.shape[0])
    dx, dw1, db1, dw2, db2, dgamma, dbeta = _bwd_ln_impl(
        xp, w1, w2, gamma, hd, z, gp, seed, rate=rate,
        deterministic=deterministic, interpret=interpret,
        activation=activation, ln_eps=ln_eps)
    dseed = np.zeros((2,), jax.dtypes.float0)
    return (dx[:r] if xp.shape[0] != r else dx,
            dw1.astype(w1.dtype), db1.reshape(-1).astype(w1.dtype),
            dw2.astype(w2.dtype), db2.reshape(-1).astype(w2.dtype),
            dgamma.reshape(-1).astype(gamma.dtype),
            dbeta.reshape(-1).astype(gamma.dtype), dseed)


fused_ffn_ln.defvjp(_vjp_ln_fwd, _vjp_ln_bwd)


def can_use_fused_ffn(x: jax.Array, hdim: int, fdim: int) -> bool:
    """Gate for the Pallas FFN path: TPU backend + tile-aligned dims.

    Lane-dim alignment (128) for H and F keeps every matmul and the [., F]
    accumulators on natural MXU/VPU tiles; rows are padded internally.
    """
    if jax.default_backend() != "tpu":
        return False
    from fairmultimodal_tpu.ops import gates

    if not gates.kernels_enabled():
        # XLA layer path: FMTPU_KERNELS=0, or force_xla_path() under a mixed
        # data x model (TP) mesh where GSPMD cannot partition Mosaic custom
        # calls (decision record in ops/gates.py; see train/loop.py).
        return False
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    return hdim % 128 == 0 and fdim % 128 == 0
