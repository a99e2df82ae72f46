"""Config-parametric Flax BERT encoder.

One implementation serves every BERT in the framework:

- BEHRT-Demo's 12L/12H BERT over a 1-token dummy input (10_FAME.py:175-206)
- DfC's demographics-free BERT (03_DfC.py:156-184)
- BioClinicalBERT (emilyalsentzer/Bio_ClinicalBERT) for note encoding, with a
  converter from HF torch weights when they are available locally.

Architecture is standard post-LN BERT (embeddings + L transformer layers with
GELU intermediate), matching HF ``BertModel`` so converted weights are
numerically equivalent.  Attention goes through
``fairmultimodal_tpu.ops.multi_head_attention`` (Pallas on TPU for aligned
shapes).  Matmuls run in ``dtype`` (bf16 on TPU by default at call sites);
layernorm statistics and softmax accumulate in fp32.

Megakernel path (round 3): in deterministic mode on TPU with aligned
geometry (256 <= S <= 1024, d_head <= 128 — i.e. the [128, 512] note-encode
batches, NOT the S=1 demo or S=128 DfC shapes), each layer runs as exactly
two Pallas calls: ``fused_attention_block_ln`` (qkv + softmax + out-proj +
residual + LN, ln_eps 1e-12) and ``fused_ffn_ln(activation="gelu")`` (exact
erf-gelu FFN + residual + LN).  Param trees are bit-identical to the XLA
path (parameter-only stand-in modules), so HF-converted weights load
unchanged.  Training mode always takes the XLA path — the text encoder is
frozen everywhere in the reference (02:405-470, 10_FAME.py:100-150).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fairmultimodal_tpu.ops.attention import multi_head_attention
from fairmultimodal_tpu.ops.fused_attention_block import (
    can_use_fused_attention_block,
    fused_attention_block_ln,
    fused_attention_block_ln_infer,
)
from fairmultimodal_tpu.ops.fused_ffn import (
    can_use_fused_ffn,
    fused_ffn_ln,
    fused_ffn_ln_infer,
)

__all__ = ["BertConfig", "BertEncoderModel", "bio_clinical_bert_config",
           "load_hf_bert_params"]


class _LayerNormParams(nn.Module):
    """Parameter-only stand-in for ``nn.LayerNorm`` (scale/bias, same names,
    shapes, and initializers), used when the LN is folded into a Pallas
    epilogue — checkpoints stay interchangeable with the XLA path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return scale, bias


class _DenseParams(nn.Module):
    """Parameter-only stand-in for ``nn.Dense``.

    Declares ``kernel``/``bias`` with nn.Dense's exact initializers, shapes,
    and param names so the param tree (and the per-param init RNG folding,
    which depends only on the module path + param name) is bit-identical to a
    real ``nn.Dense`` — checkpoints are interchangeable between the XLA and
    Pallas paths.
    """

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.linear.default_kernel_init,
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12


def bio_clinical_bert_config() -> BertConfig:
    """emilyalsentzer/Bio_ClinicalBERT = bert-base-cased geometry."""
    return BertConfig(vocab_size=28996)


class BertEmbeddings(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic=True):
        c = self.config
        seq = input_ids.shape[1]
        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(seq)[None, :]
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=self.dtype,
                       name="position_embeddings")(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=self.dtype,
                       name="token_type_embeddings")(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm")(x)
        x = nn.Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)
        return x


class BertSelfAttention(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32
    # None = auto (deterministic + TPU + aligned geometry); True/False forces
    # the Pallas megakernel path (tests force True with the interpreter).
    fused: Optional[bool] = None
    # Frozen-trunk fast path: skip the backward-only residual streams in the
    # fused kernels (NOT differentiable — only set where no grad is taken,
    # e.g. the frozen text encoder).
    infer_fast: bool = False

    @nn.compact
    def __call__(self, hidden, mask, deterministic=True):
        c = self.config
        h, nh = c.hidden_size, c.num_attention_heads
        d = h // nh
        b, s, _ = hidden.shape

        use_fused = self.fused
        if use_fused is None:
            use_fused = (deterministic
                         and can_use_fused_attention_block(
                             hidden.astype(self.dtype), nh))
        if use_fused:
            wq, bq = _DenseParams(h, h, name="query")()
            wk, bk = _DenseParams(h, h, name="key")()
            wv, bv = _DenseParams(h, h, name="value")()
            wo, bo = _DenseParams(h, h, name="output_dense")()
            gamma, beta = _LayerNormParams(h, name="output_layer_norm")()
            cst = lambda a: a.astype(self.dtype)
            if self.infer_fast:
                return fused_attention_block_ln_infer(
                    hidden.astype(self.dtype), cst(wq), cst(bq), cst(wk),
                    cst(bk), cst(wv), cst(bv), cst(wo), cst(bo), gamma, beta,
                    mask, nh, jax.default_backend() != "tpu",
                    c.layer_norm_eps)
            return fused_attention_block_ln(
                hidden.astype(self.dtype), cst(wq), cst(bq), cst(wk), cst(bk),
                cst(wv), cst(bv), cst(wo), cst(bo), gamma, beta, mask,
                jnp.zeros((1,), jnp.int32), nh, c.hidden_dropout_prob,
                True, jax.default_backend() != "tpu", c.layer_norm_eps)

        def heads(name):
            y = nn.Dense(h, dtype=self.dtype, name=name)(hidden)
            return y.reshape(b, s, nh, d).transpose(0, 2, 1, 3)

        q, k, v = heads("query"), heads("key"), heads("value")
        out = multi_head_attention(q, k, v, mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h)
        out = nn.Dense(h, dtype=self.dtype, name="output_dense")(out)
        out = nn.Dropout(c.hidden_dropout_prob)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                           name="output_layer_norm")(out + hidden)
        return out


class BertLayer(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32
    fused: Optional[bool] = None
    infer_fast: bool = False

    @nn.compact
    def __call__(self, hidden, mask, deterministic=True):
        c = self.config
        h = c.hidden_size
        x = BertSelfAttention(c, dtype=self.dtype, fused=self.fused,
                              infer_fast=self.infer_fast,
                              name="attention")(hidden, mask, deterministic)

        use_fused = self.fused
        if use_fused is None:
            # The attention-geometry gate (S >= 256) is applied to the FFN
            # too so the fused path engages ONLY on note-encode shapes —
            # the S=1 demo-BERT and S=128 DfC forwards keep their measured
            # XLA lowering (tiny-row Pallas dispatches lose there).
            use_fused = (deterministic
                         and can_use_fused_ffn(x.astype(self.dtype), h,
                                               c.intermediate_size)
                         and can_use_fused_attention_block(
                             x.astype(self.dtype), c.num_attention_heads))
        if use_fused:
            b, s, _ = x.shape
            w1, b1 = _DenseParams(h, c.intermediate_size, name="intermediate")()
            w2, b2 = _DenseParams(c.intermediate_size, h, name="output")()
            gamma, beta = _LayerNormParams(h, name="output_layer_norm")()
            cst = lambda a: a.astype(self.dtype)
            if self.infer_fast:
                return fused_ffn_ln_infer(
                    x.reshape(b * s, h).astype(self.dtype), cst(w1), cst(b1),
                    cst(w2), cst(b2), gamma, beta,
                    jax.default_backend() != "tpu", "gelu",
                    c.layer_norm_eps).reshape(b, s, h)
            return fused_ffn_ln(
                x.reshape(b * s, h).astype(self.dtype), cst(w1), cst(b1),
                cst(w2), cst(b2), gamma, beta, jnp.zeros((2,), jnp.int32),
                c.hidden_dropout_prob, True, jax.default_backend() != "tpu",
                "gelu", c.layer_norm_eps).reshape(b, s, h)

        y = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(y)
        y = nn.Dropout(c.hidden_dropout_prob)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="output_layer_norm")(y + x)


class BertEncoderModel(nn.Module):
    """BERT trunk: (input_ids, attention_mask) -> last_hidden_state.

    ``pool="cls"`` returns the [CLS] vector (the reference always uses
    ``last_hidden_state[:, 0, :]`` — 10_FAME.py:141,200 — never the tanh
    pooler, so no pooler weights are created unless requested).
    """

    config: BertConfig
    dtype: Any = jnp.float32
    add_pooler: bool = False
    fused: Optional[bool] = None   # None = auto per-layer (see BertLayer)
    infer_fast: bool = False       # frozen-trunk fast path (see BertLayer)

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic: bool = True, pool: Optional[str] = None):
        c = self.config
        x = BertEmbeddings(c, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic)
        for i in range(c.num_hidden_layers):
            x = BertLayer(c, dtype=self.dtype, fused=self.fused,
                          infer_fast=self.infer_fast,
                          name=f"layer_{i}")(x, attention_mask, deterministic)
        if pool == "cls":
            return x[:, 0, :]
        if pool == "pooler" or self.add_pooler:
            cls = x[:, 0, :]
            pooled = nn.tanh(nn.Dense(c.hidden_size, dtype=self.dtype,
                                      name="pooler")(cls))
            if pool == "pooler":
                return pooled
        return x


# --- HF weight conversion -----------------------------------------------------

def load_hf_bert_params(model_name_or_path: str,
                        config: Optional[BertConfig] = None,
                        return_config: bool = False):
    """Convert a HF torch BertModel checkpoint into this module's param tree.

    Works offline from a local directory or the HF cache; raises a clear
    error when weights are unavailable (no network egress in CI) — callers
    fall back to random init for tests.

    With ``return_config=True`` returns ``(params, config)`` where the
    config is derived from the loaded checkpoint's ``hf.config`` — callers
    must build their module from it rather than assuming bert-base geometry
    (a hardcoded ``bio_clinical_bert_config()`` breaks any non-bert-base
    checkpoint with a module/params shape mismatch).
    """
    import numpy as np

    try:
        import transformers

        try:
            # Local cache first — avoids 5x retry backoff on no-egress boxes.
            hf = transformers.BertModel.from_pretrained(
                model_name_or_path, local_files_only=True)
        except Exception:
            hf = transformers.BertModel.from_pretrained(model_name_or_path)
    except Exception as e:  # pragma: no cover - environment dependent
        raise FileNotFoundError(
            f"Cannot load HF weights for {model_name_or_path!r} "
            f"(offline environment?): {e}"
        ) from e

    sd = {k: np.asarray(v) for k, v in hf.state_dict().items()}
    cfg = config or BertConfig(
        vocab_size=hf.config.vocab_size,
        hidden_size=hf.config.hidden_size,
        num_hidden_layers=hf.config.num_hidden_layers,
        num_attention_heads=hf.config.num_attention_heads,
        intermediate_size=hf.config.intermediate_size,
        max_position_embeddings=hf.config.max_position_embeddings,
        type_vocab_size=hf.config.type_vocab_size,
        hidden_dropout_prob=hf.config.hidden_dropout_prob,
        attention_probs_dropout_prob=hf.config.attention_probs_dropout_prob,
        layer_norm_eps=hf.config.layer_norm_eps,
    )

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params: Dict = {
        "embeddings": {
            "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
            "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"]},
            "token_type_embeddings": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
            "layer_norm": ln("embeddings.LayerNorm"),
        }
    }
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{p}.attention.self.query"),
                "key": dense(f"{p}.attention.self.key"),
                "value": dense(f"{p}.attention.self.value"),
                "output_dense": dense(f"{p}.attention.output.dense"),
                "output_layer_norm": ln(f"{p}.attention.output.LayerNorm"),
            },
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "output_layer_norm": ln(f"{p}.output.LayerNorm"),
        }
    if "pooler.dense.weight" in sd:
        params["pooler"] = dense("pooler.dense")
    if return_config:
        return params, cfg
    return params
