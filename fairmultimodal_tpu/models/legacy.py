"""Legacy-generation model families (SURVEY §2.4 inventory).

The reference's earlier eras contain two architectures that the Final
pipeline superseded but which remain part of the public surface:

- :class:`BEHRTSequence` — the only *true sequence* BEHRT in the repo
  (FinalCode/New/02_BEHRT.py:175-240): per-admission disease-ID sequences
  through BERT, with seven per-position embedding tables (age, segment,
  admission/discharge ward, gender, ethnicity, insurance) summed onto the
  sequence output, CLS-position single-logit heads for the three tasks.
- :class:`EDDIEnhancementLayer` / :class:`EDDIDotFusion` — the early
  EDDI-layer experiments (FinalCode/Code/EDDI.py:203-261): each modality's
  256-d projection passes through a sigmoid x learnable-weight enhancement,
  the dot product of original and enhanced projections yields ONE scalar per
  branch, and the three scalars feed the classifier.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from fairmultimodal_tpu.models.fusion import _out_dtype

from fairmultimodal_tpu.models.behrt import BEHRTDemo, BEHRTLab
from fairmultimodal_tpu.models.bert import BertConfig, BertEncoderModel
from fairmultimodal_tpu.models.fusion import _Projector

__all__ = ["BEHRTSequence", "EDDIEnhancementLayer", "EDDIDotFusion",
           "LegacyEDDIFull"]


class BEHRTSequence(nn.Module):
    """Sequence BEHRT over per-admission disease-ID tokens.

    Batch keys (each [B, S] int32 unless noted): ``disease_ids`` (0 = pad,
    doubling as the attention mask like the reference's
    ``input_ids != 0`` — New/02_BEHRT.py:208-209), ``age_ids``,
    ``segment_ids``, ``adm_loc_ids``, ``disch_loc_ids``, ``gender_ids``,
    ``ethnicity_ids``, ``insurance_ids``.

    Returns ``{"logits": [B, 3]}`` from the CLS (first) position of the
    embedding-summed sequence output.
    """

    num_diseases: int
    num_ages: int
    num_segments: int = 2
    num_admission_locs: int = 100
    num_discharge_locs: int = 100
    num_genders: int = 2
    num_ethnicities: int = 6
    num_insurances: int = 6
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    num_tasks: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], deterministic: bool = True):
        vocab = (self.num_diseases + self.num_ages + self.num_segments
                 + self.num_admission_locs + self.num_discharge_locs + 2)
        cfg = BertConfig(vocab_size=vocab, hidden_size=self.hidden_size,
                         num_hidden_layers=self.num_hidden_layers,
                         num_attention_heads=self.num_attention_heads,
                         intermediate_size=self.hidden_size * 4)
        ids = batch["disease_ids"]
        mask = (ids != 0).astype(jnp.int32)
        seq = BertEncoderModel(cfg, dtype=self.dtype, name="bert")(
            ids, mask, deterministic=deterministic)          # [B, S, H]

        def emb(key, n, name):
            x = jnp.clip(batch[key], 0, n - 1)
            return nn.Embed(n, self.hidden_size, dtype=self.dtype, name=name)(x)

        combined = (seq
                    + emb("age_ids", self.num_ages, "age_embedding")
                    + emb("segment_ids", self.num_segments, "segment_embedding")
                    + emb("adm_loc_ids", self.num_admission_locs,
                          "admission_loc_embedding")
                    + emb("disch_loc_ids", self.num_discharge_locs,
                          "discharge_loc_embedding")
                    + emb("gender_ids", self.num_genders, "gender_embedding")
                    + emb("ethnicity_ids", self.num_ethnicities,
                          "ethnicity_embedding")
                    + emb("insurance_ids", self.num_insurances,
                          "insurance_embedding"))
        cls = combined[:, 0, :]
        logits = jnp.concatenate([
            nn.Dense(1, dtype=self.dtype, name="classifier_mortality")(cls),
            nn.Dense(1, dtype=self.dtype, name="classifier_los")(cls),
            nn.Dense(1, dtype=self.dtype, name="classifier_mech")(cls),
        ], axis=-1)
        return {"logits": logits.astype(_out_dtype(self.dtype))}


class EDDIEnhancementLayer(nn.Module):
    """sigmoid(x) * learnable weight vector, ones-initialized
    (FinalCode/Code/EDDI.py:203-221)."""

    dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("eddi_weight", nn.initializers.ones, (self.dim,))
        return nn.sigmoid(x) * w.astype(x.dtype)


class EDDIDotFusion(nn.Module):
    """Early EDDI fusion head: per-branch projection -> enhancement ->
    dot(original, enhanced) scalar; the three scalars feed the classifier
    (FinalCode/Code/EDDI.py:225-261)."""

    proj_dim: int = 256
    fusion_hidden: int = 512
    num_tasks: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, demo_emb, lab_emb, text_emb, deterministic: bool = True):
        scalars = []
        for name, x in (("demo", demo_emb), ("lab", lab_emb), ("text", text_emb)):
            proj = _Projector(self.proj_dim, self.dtype,
                              name=f"{name}_projector")(x)
            enhanced = EDDIEnhancementLayer(self.proj_dim, self.dtype,
                                            name=f"eddi_{name}")(proj)
            scalars.append(jnp.sum(proj * enhanced, axis=-1, keepdims=True))
        fused = jnp.concatenate(scalars, axis=-1)            # [B, 3]
        h = nn.relu(nn.Dense(self.fusion_hidden, dtype=self.dtype,
                             name="dense1")(fused))
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        logits = nn.Dense(self.num_tasks, dtype=self.dtype, name="dense2")(h)
        return {"logits": logits.astype(_out_dtype(self.dtype)),
                "branch_scalars": fused.astype(_out_dtype(self.dtype))}


class LegacyEDDIFull(nn.Module):
    """Full legacy EDDI-dot experiment model (FinalCode/Code/EDDI.py:225-322):
    BEHRT-Demo + BEHRT-Lab encoders + precomputed text embedding through
    :class:`EDDIDotFusion`, TWO logits (mortality, readmission-within-30d —
    the legacy task era; EDDI.py:319-322 splits ``logits[:, 0]/[:, 1]``)."""

    num_ages: int
    num_genders: int
    num_ethnicities: int
    num_insurances: int
    lab_token_count: int
    hidden_size: int = 768
    demo_layers: int = 12
    demo_heads: int = 12
    lab_layers: int = 2
    lab_heads: int = 8
    num_tasks: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], deterministic: bool = True):
        demo = BEHRTDemo(self.num_ages, self.num_genders, self.num_ethnicities,
                         self.num_insurances, hidden_size=self.hidden_size,
                         num_hidden_layers=self.demo_layers,
                         num_attention_heads=self.demo_heads,
                         dtype=self.dtype, name="behrt_demo")(
            batch["demo_dummy_ids"], batch["demo_attn_mask"], batch["age_ids"],
            batch["gender_ids"], batch["ethnicity_ids"], batch["insurance_ids"],
            deterministic)
        lab = BEHRTLab(self.lab_token_count, self.hidden_size,
                       num_heads=self.lab_heads, num_layers=self.lab_layers,
                       dtype=self.dtype, name="behrt_lab")(
            batch["lab_features"], deterministic)
        return EDDIDotFusion(num_tasks=self.num_tasks, dtype=self.dtype,
                             name="fusion")(
            demo, lab, batch["text_embedding"], deterministic)
