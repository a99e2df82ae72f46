"""FairEHR-CLP contrastive-debiasing components (06_FairEHR-CLP.py).

The reference defines the full stack — DemographicEncoder MLP (:280-289),
LongitudinalEncoder Conv1d+Transformer (:291-309), NotesEncoder (:311-323),
FusionModule (:325-334), DynamicRelevance sigmoid gate (:336-342),
FairEHR_CLP (:439-470), InfoNCE-style contrastive loss with a
synthetic-embedding variance regularizer (:472-487), and synthetic-sample
generators (:221-233) — but its ``train_pipeline`` actually trains the plain
two-branch fusion model (:790-829).  We reproduce both: the components here
(with a *working* contrastive mode), and the pipeline default matching the
reference behavior (average-fusion training).

Deviations, documented:

- The reference ``LongitudinalEncoder`` only shape-checks when
  ``embed_dim == conv_out_channels`` (its transformer consumes the conv
  channel axis as d_model); we implement the clearly-intended architecture —
  conv over the feature sequence, transformer over features, mean-pool —
  which is shape-correct for any sizes.
- ``NotesEncoder`` wraps our Flax BERT instead of roberta-large (no egress);
  it consumes precomputed note embeddings by default.
- The InfoNCE loop (:479-483) is a vectorized ``logsumexp`` here — identical
  math, one kernel.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "DemographicEncoder",
    "LongitudinalEncoder",
    "NotesProjector",
    "FusionModule",
    "DynamicRelevance",
    "FairEHRCLP",
    "contrastive_loss",
    "synthesize_demographics",
    "synthesize_longitudinal",
]


class DemographicEncoder(nn.Module):
    """MLP in -> hidden -> hidden (06:280-289)."""

    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x))
        return nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(x)


class LongitudinalEncoder(nn.Module):
    """Per-feature scalar embed -> Conv over the feature sequence ->
    transformer -> mean-pool -> proj (06:291-309, shape-corrected)."""

    embed_dim: int = 256
    conv_out: int = 256
    num_heads: int = 8
    num_layers: int = 2
    ffn: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from fairmultimodal_tpu.models.behrt import TorchEncoderLayer

        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="feature_embedding")(
            x[..., None])                                   # [B, F, E]
        h = nn.Conv(self.conv_out, kernel_size=(3,), padding="SAME",
                    dtype=self.dtype, name="conv")(h)        # [B, F, C]
        for i in range(self.num_layers):
            h = TorchEncoderLayer(self.conv_out, self.num_heads, ffn_size=self.ffn,
                                  dtype=self.dtype, name=f"layer_{i}")(
                h, None, deterministic)
        h = jnp.mean(h, axis=1)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(h)


class NotesProjector(nn.Module):
    """Projection head over (precomputed) note embeddings (06:311-323)."""

    out: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, emb):
        return nn.relu(nn.Dense(self.out, dtype=self.dtype, name="proj")(emb))


class FusionModule(nn.Module):
    """MLP concat -> fusion_dim -> fusion_dim (06:325-334)."""

    fusion_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.fusion_dim, dtype=self.dtype, name="fc1")(x))
        return nn.Dense(self.fusion_dim, dtype=self.dtype, name="fc2")(x)


class DynamicRelevance(nn.Module):
    """Learnable sigmoid gate (06:336-342)."""

    dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weights", nn.initializers.ones, (self.dim,))
        return nn.sigmoid(w).astype(x.dtype) * x


class FairEHRCLP(nn.Module):
    """Full FairEHR-CLP model (06:439-470): encodes real and synthetic views
    of (demographics, longitudinal, notes), fuses, gates, classifies.

    Batch keys: ``demo_features`` [B, Dd], ``lab_features`` [B, F],
    ``text_embedding`` [B, H], and optional ``*_syn`` counterparts (absent ->
    deterministic synthetic views are generated from an rng collection).
    Returns ``{"logits": [B, T], "e_adj": ..., "e_adj_syn": ...}``.
    """

    num_tasks: int = 3
    demo_hidden: int = 128
    embed_dim: int = 256
    fusion_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], deterministic: bool = True):
        demo_enc = DemographicEncoder(self.demo_hidden, self.dtype, name="demo_encoder")
        long_enc = LongitudinalEncoder(embed_dim=self.embed_dim, dtype=self.dtype,
                                       name="long_encoder")
        notes_enc = NotesProjector(self.embed_dim, self.dtype, name="notes_encoder")
        fusion = FusionModule(self.fusion_dim, self.dtype, name="fusion")
        gate = DynamicRelevance(self.fusion_dim, self.dtype, name="dr")

        def fuse(demo, lab, text, det):
            return fusion(jnp.concatenate([
                demo_enc(demo), long_enc(lab, det), notes_enc(text)], axis=-1))

        demo = batch["demo_features"].astype(self.dtype)
        lab = batch["lab_features"].astype(self.dtype)
        text = batch["text_embedding"].astype(self.dtype)
        demo_syn = batch.get("demo_features_syn", demo)
        lab_syn = batch.get("lab_features_syn", lab)
        text_syn = batch.get("text_embedding_syn", text)

        e_adj = gate(fuse(demo, lab, text, deterministic))
        e_adj_syn = gate(fuse(demo_syn, lab_syn, text_syn, deterministic))
        # Reference Classifier (06:344-353): Linear(d, d//2) -> ReLU ->
        # Dropout(0.1) -> Linear(d//2, C).  The hidden layer was missing
        # before round 3 (single Dense) — caught by the torch oracle, same
        # class of bug as 09's classifier_hidden (PARITY.md).
        h = nn.relu(nn.Dense(self.fusion_dim // 2, dtype=self.dtype,
                             name="classifier_hidden")(e_adj))
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        logits = nn.Dense(self.num_tasks, dtype=self.dtype, name="classifier")(h)
        return {"logits": logits.astype(jnp.float32),
                "e_adj": e_adj.astype(jnp.float32),
                "e_adj_syn": e_adj_syn.astype(jnp.float32)}


def contrastive_loss(e_real, e_syn, tau: float = 0.5, gamma: float = 0.1,
                     weight=None):
    """InfoNCE over (real, synthetic) pairs + synthetic variance regularizer
    (06:472-487), vectorized.

    ``weight`` masks padded rows out of both the positives and the
    denominator columns.
    """
    r = e_real / jnp.maximum(jnp.linalg.norm(e_real, axis=1, keepdims=True), 1e-12)
    s = e_syn / jnp.maximum(jnp.linalg.norm(e_syn, axis=1, keepdims=True), 1e-12)
    sim = (r @ s.T) / tau                                     # [B, B]
    if weight is not None:
        col_bias = jnp.where(weight[None, :] > 0, 0.0, -1e9)
        sim = sim + col_bias
    log_denom = jax.nn.logsumexp(sim, axis=1)
    nce = -(jnp.diag(sim) - log_denom)
    if weight is not None:
        denom = jnp.maximum(jnp.sum(weight), 1.0)
        nce = jnp.sum(nce * weight) / denom
        mean_syn = jnp.sum(e_syn * weight[:, None], axis=0, keepdims=True) / denom
        reg = jnp.sum(((e_syn - mean_syn) ** 2) * weight[:, None]) / (
            denom * e_syn.shape[1])
    else:
        nce = jnp.mean(nce)
        reg = jnp.mean((e_syn - jnp.mean(e_syn, axis=0, keepdims=True)) ** 2)
    return nce + gamma * reg


def synthesize_demographics(rng, demo, scale: float = 0.05):
    """Gaussian-perturbed synthetic demographics (06:227-229)."""
    return demo + scale * jax.random.normal(rng, demo.shape, demo.dtype)


def synthesize_longitudinal(rng, lab, scale: float = 0.01):
    """Gaussian-perturbed synthetic longitudinal view (06:231-233)."""
    return lab + scale * jax.random.normal(rng, lab.shape, lab.dtype)
