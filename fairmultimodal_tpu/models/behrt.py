"""BEHRT-style structured-data encoders.

- :class:`BEHRTDemo` — BERT over a single dummy token plus four demographic
  embedding tables averaged onto the CLS vector (10_FAME.py:175-206).
- :class:`BEHRTLab` — every z-scored 2h-bin lab scalar becomes a token via a
  Linear(1, H) embedding plus a learned positional embedding, encoded by a
  torch-style post-LN transformer (ReLU FFN, dim 2048) and mean-pooled
  (10_FAME.py:208-224).
- :class:`BEHRTCombined` — the 01_BEHRT structured-only baseline: lab encoder
  + fusion FC + three single-logit heads (01_BEHRT.py:132-149).

TPU notes: the lab sequence (~550 tokens) is right-padded to a multiple of
16 (the bf16 sublane tile) inside :class:`BEHRTLab`; padded positions are
masked out of both attention and the mean-pool.  549 -> 560 wastes 12.5%
less than rounding to 128 and measured +12% train throughput.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fairmultimodal_tpu.models.bert import (
    BertConfig,
    BertEncoderModel,
    _DenseParams,
    _LayerNormParams,
)
from fairmultimodal_tpu.ops.attention import multi_head_attention
from fairmultimodal_tpu.ops.fused_attention_block import (
    can_use_fused_attention_block,
    fused_attention_block,
    fused_attention_block_ln,
)
from fairmultimodal_tpu.ops.fused_ffn import (
    can_use_fused_ffn,
    fused_ffn,
    fused_ffn_ln,
)

__all__ = ["BEHRTDemo", "BEHRTLab", "BEHRTCombined", "TorchEncoderLayer"]


class TorchEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer matching torch defaults.

    torch ``nn.TransformerEncoderLayer(d_model, nhead)``: post-norm, ReLU,
    dim_feedforward=2048, dropout=0.1 (10_FAME.py:214).  Behavioral parity
    matters because the lab encoder's convergence depends on the post-LN
    placement.
    """

    hidden_size: int
    num_heads: int
    ffn_size: int = 2048
    dropout: float = 0.1
    dtype: Any = jnp.float32
    # One [H, 3H] GEMM instead of three [H, H]: measured SLOWER on v5e
    # (1582 vs 1692 patients/sec — the 5-D split transpose outweighs the
    # GEMM merge), so separate projections stay the default.
    fused_qkv: bool = False
    # Pallas fused-FFN kernel (ops/fused_ffn.py): None = auto (TPU +
    # tile-aligned dims), True/False forces it (tests/A-B). The fused path
    # draws its in-FFN dropout from the on-core hardware RBG instead of
    # nn.Dropout — same distribution, different stream (see PARITY.md).
    ffn_kernel: Optional[bool] = None
    # Pallas attention megakernel (ops/fused_attention_block.py): folds the
    # qkv projections, the head-split/merge transposes, softmax attention,
    # and the output projection into one fwd + one bwd kernel.  None = auto.
    attn_kernel: Optional[bool] = None
    # Fold the post-attention / post-FFN dropout + residual + LayerNorm into
    # the Pallas kernels' epilogues (fused_attention_block_ln / fused_ffn_ln)
    # whenever the respective kernel is active: the whole encoder layer is
    # then exactly TWO Pallas calls with no XLA glue between half-layers.
    # None = auto (fold when the kernel runs); False = round-2 behavior
    # (kernels + XLA dropout/add/LN) for A/B.
    fold_ln: Optional[bool] = None
    # torch nn.TransformerEncoderLayer's layer_norm_eps default — NOT flax's
    # 1e-6.  The float64 trajectory oracle resolves the difference clearly
    # (~4e-6 relative per LN at unit variance).
    layer_norm_eps: float = 1e-5

    def _dropout_seed(self, n: int, deterministic: bool) -> jax.Array:
        if not deterministic and self.dropout > 0:
            key = self.make_rng("dropout")
            return jax.random.randint(key, (n,), 0, np.iinfo(np.int32).max,
                                      dtype=jnp.int32)
        return jnp.zeros((n,), jnp.int32)

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        h, nh = self.hidden_size, self.num_heads
        d = h // nh
        b, s, _ = x.shape
        interpret = jax.default_backend() != "tpu"
        # FMTPU_FOLD_LN=0 flips the auto default off — bench A/B knob only
        # (read at trace time; jit caches per-HLO so both variants coexist).
        fold = (self.fold_ln if self.fold_ln is not None
                else os.environ.get("FMTPU_FOLD_LN", "1") != "0")
        c = lambda a: a.astype(self.dtype)

        use_mega = self.attn_kernel
        if use_mega is None:
            use_mega = (not self.fused_qkv
                        and can_use_fused_attention_block(x, nh))
        if use_mega:
            wq, bq = _DenseParams(h, h, name="query")()
            wk, bk = _DenseParams(h, h, name="key")()
            wv, bv = _DenseParams(h, h, name="value")()
            wo, bo = _DenseParams(h, h, name="attn_out")()
            if fold:
                gamma1, beta1 = _LayerNormParams(h, name="norm1")()
                x = fused_attention_block_ln(
                    x.astype(self.dtype), c(wq), c(bq), c(wk), c(bk), c(wv),
                    c(bv), c(wo), c(bo), gamma1, beta1, mask,
                    self._dropout_seed(1, deterministic), nh, self.dropout,
                    deterministic, interpret, self.layer_norm_eps)
            else:
                attn = fused_attention_block(
                    x.astype(self.dtype), c(wq), c(bq), c(wk), c(bk), c(wv),
                    c(bv), c(wo), c(bo), mask, nh, interpret)
                attn = nn.Dropout(self.dropout)(attn,
                                                deterministic=deterministic)
                x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                             name="norm1")(x + attn)
        else:
            if self.fused_qkv:
                qkv = nn.Dense(3 * h, dtype=self.dtype, name="qkv")(x)
                qkv = qkv.reshape(b, s, 3, nh, d).transpose(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
            else:
                def heads(name):
                    y = nn.Dense(h, dtype=self.dtype, name=name)(x)
                    return y.reshape(b, s, nh, d).transpose(0, 2, 1, 3)

                q, k, v = heads("query"), heads("key"), heads("value")
            attn = multi_head_attention(q, k, v, mask)
            attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h)
            attn = nn.Dense(h, dtype=self.dtype, name="attn_out")(attn)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                             name="norm1")(x + attn)

        use_fused = self.ffn_kernel
        if use_fused is None:
            use_fused = can_use_fused_ffn(x, h, self.ffn_size)
        if use_fused:
            w1, b1 = _DenseParams(h, self.ffn_size, name="ffn_in")()
            w2, b2 = _DenseParams(self.ffn_size, h, name="ffn_out")()
            if fold:
                gamma2, beta2 = _LayerNormParams(h, name="norm2")()
                return fused_ffn_ln(
                    x.reshape(b * s, h).astype(self.dtype),
                    c(w1), c(b1), c(w2), c(b2), gamma2, beta2,
                    self._dropout_seed(2, deterministic), self.dropout,
                    deterministic, interpret, "relu", self.layer_norm_eps,
                ).reshape(b, s, h)
            y = fused_ffn(
                x.reshape(b * s, h).astype(self.dtype),
                c(w1), c(b1), c(w2), c(b2),
                self._dropout_seed(1, deterministic), self.dropout,
                deterministic, interpret,
            ).reshape(b, s, h)
        else:
            y = nn.Dense(self.ffn_size, dtype=self.dtype, name="ffn_in")(x)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            y = nn.Dense(h, dtype=self.dtype, name="ffn_out")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                            name="norm2")(x + y)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class BEHRTLab(nn.Module):
    """Scalar-token lab encoder (10_FAME.py:208-224).

    Input: [B, L] z-scored lab features. Each scalar is embedded with a
    shared Linear(1, H), gets a learned per-position embedding, runs through
    ``num_layers`` post-LN encoder layers, and mean-pools over the L real
    tokens.  The sequence is padded to a 16 multiple (sublane tile); pad
    tokens are masked everywhere.
    """

    lab_token_count: int
    hidden_size: int = 768
    num_heads: int = 8
    num_layers: int = 2
    dropout: float = 0.1
    dtype: Any = jnp.float32
    # Sequence pad granularity: 16 satisfies the bf16 sublane tile and wastes
    # 12.5% less than 128 at the reference's 549 lab bins (549 -> 560 vs 640);
    # the whole-S Pallas attention block is legal at any multiple of 16.
    pad_to: int = 16

    @nn.compact
    def __call__(self, lab_features, deterministic: bool = True):
        b, L = lab_features.shape
        S = _round_up(L, self.pad_to)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (self.lab_token_count, self.hidden_size))
        # Pad the [B, L] SCALARS (and the pos table) before embedding rather
        # than the [B, S, H] activation after it: the padded-activation
        # materialization was 0.66 ms/step of pure HBM writes at bench
        # geometry (device profile, round 5).  Real-token values and grads
        # are bit-identical — the embedding is per-position, pad keys are
        # masked out of attention, per-token ops keep the pad lanes' zero
        # cotangent to themselves, and the mean still reduces over x[:, :L]
        # only.  Pad lanes now carry the embedding bias instead of zeros;
        # nothing downstream reads them.
        if S != L:
            lab_features = jnp.pad(lab_features, ((0, 0), (0, S - L)))
            pos = jnp.pad(pos, ((0, S - L), (0, 0)))
        x = lab_features[..., None].astype(self.dtype)  # [B, S, 1]
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="token_embedding")(x)
        x = x + pos[None, :, :].astype(self.dtype)

        mask = (jnp.arange(S) < L)[None, :].astype(jnp.int32)
        mask = jnp.broadcast_to(mask, (b, S))

        # No remat: the step is compute-bound at this size — dots_saveable
        # remat measured 1468 vs 2013 patients/sec (-27%).
        for i in range(self.num_layers):
            x = TorchEncoderLayer(self.hidden_size, self.num_heads,
                                  dropout=self.dropout, dtype=self.dtype,
                                  name=f"layer_{i}")(x, mask, deterministic)
        # Mean over the L real tokens only.
        x = x[:, :L, :]
        return jnp.mean(x, axis=1)


class BEHRTDemo(nn.Module):
    """Demographic encoder (10_FAME.py:175-206).

    BERT (12L/12H by default) over a [B, 1] dummy token; CLS plus the mean of
    four demographic embeddings.  Ids are clipped into each table like the
    reference (torch.clamp at :195-198).
    """

    num_ages: int
    num_genders: int
    num_ethnicities: int
    num_insurances: int
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    dtype: Any = jnp.float32
    # The FAME pipelines feed the SAME dummy token to every row
    # (torch.zeros, 10_FAME.py:715-716), so the BERT CLS is row-constant:
    # compute it once on a single row and broadcast — a 12-layer BERT over 1
    # row instead of B.  Exact whenever dummy_ids/attn_mask are
    # row-constant; set False for per-row token inputs.
    broadcast_dummy: bool = True

    @nn.compact
    def __call__(self, dummy_ids, attn_mask, age_ids, gender_ids,
                 ethnicity_ids, insurance_ids, deterministic: bool = True):
        vocab = self.num_ages + self.num_genders + self.num_ethnicities + self.num_insurances + 2
        cfg = BertConfig(
            vocab_size=vocab,
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=self.intermediate_size,
        )
        bert = BertEncoderModel(cfg, dtype=self.dtype, name="bert")
        if self.broadcast_dummy:
            # Dropout would de-constify rows; BERT here runs deterministic
            # (its own regularization is irrelevant to a constant input).
            # Deviation note: the reference's demo-BERT does apply dropout in
            # training (see PARITY.md) — irrelevant for a constant token but
            # a real difference if a caller feeds per-row tokens.
            one = bert(dummy_ids[:1], attn_mask[:1], deterministic=True,
                       pool="cls")
            cls = jnp.broadcast_to(one, (dummy_ids.shape[0], one.shape[-1]))
            # Guard: broadcasting is exact ONLY for row-constant inputs.  A
            # caller passing per-row tokens would otherwise get silently
            # wrong outputs; poison them with NaN instead (O(B) int compare —
            # free next to the 12-layer BERT; caught by finite-tree checks).
            # All-zero rows are admitted: BatchIterator pads partial batches
            # with zeros (ids 0, attn 0) and those rows are weight-masked
            # downstream, so their CLS value is irrelevant.
            row_eq = jnp.all((dummy_ids == dummy_ids[:1])
                             & (attn_mask == attn_mask[:1]), axis=1)
            row_pad = jnp.all((dummy_ids == 0) & (attn_mask == 0), axis=1)
            cls = jnp.where(jnp.all(row_eq | row_pad), cls, jnp.nan)
        else:
            cls = bert(dummy_ids, attn_mask, deterministic=deterministic,
                       pool="cls")

        def emb(ids, n, name):
            ids = jnp.clip(ids, 0, n - 1)
            return nn.Embed(n, self.hidden_size, dtype=self.dtype, name=name)(ids)

        extra = (emb(age_ids, self.num_ages, "age_embedding")
                 + emb(gender_ids, self.num_genders, "gender_embedding")
                 + emb(ethnicity_ids, self.num_ethnicities, "ethnicity_embedding")
                 + emb(insurance_ids, self.num_insurances, "insurance_embedding")) / 4.0
        return cls + extra


class BEHRTCombined(nn.Module):
    """01_BEHRT structured-only baseline (01_BEHRT.py:132-149): lab encoder
    -> fusion FC -> dropout -> one single-logit head per task, returned
    [B, len(tasks)].  The default task tuple preserves the three named heads;
    a single-element tuple reproduces the Mechanical_Ventilation generation's
    single-task training regime (FinalCode/Mechanical_Ventilation/02_BEHRT)."""

    lab_token_count: int
    hidden_size: int = 768
    dtype: Any = jnp.float32
    tasks: Tuple[str, ...] = ("mort", "los", "mech")

    @nn.compact
    def __call__(self, lab_features, deterministic: bool = True):
        x = BEHRTLab(self.lab_token_count, self.hidden_size, dtype=self.dtype,
                     name="lab_model")(lab_features, deterministic)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fusion_fc")(x)
        x = nn.Dropout(0.1)(x, deterministic=deterministic)
        logits = jnp.concatenate([
            nn.Dense(1, dtype=self.dtype, name=f"classifier_{t}")(x)
            for t in self.tasks
        ], axis=-1)
        return logits.astype(jnp.float32)
