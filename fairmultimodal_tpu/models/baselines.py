"""Baseline model family (batch-dict wrappers around the encoder zoo).

Each wrapper takes one ``model_inputs`` dict and returns ``{"logits": [B, 3],
...}`` so every baseline trains under the same
:class:`~fairmultimodal_tpu.train.simple.MultitaskTrainer` protocol.

Reference models covered:

- :class:`BEHRTFull` — full-demographics BERT-over-dummy-token with seven
  extra embedding tables averaged onto CLS (04_AdvDebias.py:254-301, shared
  by 06/07).
- :class:`StructTextModel` — the two-branch struct+text fusion used by
  04/06/07 (04_AdvDebias.py:303-338, 07_multimodal_average_fusion.py:205-238).
- :class:`TextOnlyClassifier` — 02's 768->256->3 MLP head over frozen
  BioClinicalBERT embeddings (02_BioClinicalBERT.py:122-134).
- :class:`SigmoidFusionFull` — 09's three-encoder model with learnable
  per-modality sigmoid gates (09_multimodal_sigmoid_fusion.py:106-222).
- :class:`EDDIFusionFull` — 08's nine single-logit heads over 6L/6H demo +
  lab + text encoders, returning ``[B, tasks, modalities]`` logits for the
  batch-EDDI logit-level weighting in the pipeline
  (08_multimodal_eddi_fusion.py:261-402).
- :class:`BEHRTLabOnlyModel` — 01's structured-only baseline as a batch-dict
  wrapper (01_BEHRT.py:112-149).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fairmultimodal_tpu.models.behrt import BEHRTCombined, BEHRTDemo, BEHRTLab
from fairmultimodal_tpu.models.bert import BertConfig, BertEncoderModel
from fairmultimodal_tpu.models.fusion import (
    AverageFusionModel,
    SigmoidFusionModel,
    _Projector,
)

__all__ = [
    "BEHRTFull",
    "StructTextModel",
    "TextOnlyClassifier",
    "SigmoidFusionFull",
    "EDDIFusionFull",
    "BEHRTLabOnlyModel",
]


class BEHRTFull(nn.Module):
    """Full-demographics structured encoder (04_AdvDebias.py:254-301).

    BERT CLS over a dummy token + mean of seven demographic/ward embedding
    lookups (age, segment, admission loc, discharge loc, gender, ethnicity,
    insurance), each id clipped into its table.
    """

    num_ages: int
    num_segments: int = 2
    num_admission_locs: int = 10
    num_discharge_locs: int = 10
    num_genders: int = 2
    num_ethnicities: int = 5
    num_insurances: int = 6
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], deterministic: bool = True):
        vocab = (self.num_ages + self.num_segments + self.num_admission_locs
                 + self.num_discharge_locs + 2)
        cfg = BertConfig(vocab_size=max(vocab, 4), hidden_size=self.hidden_size,
                         num_hidden_layers=self.num_hidden_layers,
                         num_attention_heads=self.num_attention_heads)
        cls = BertEncoderModel(cfg, dtype=self.dtype, name="bert")(
            batch["demo_dummy_ids"], batch["demo_attn_mask"],
            deterministic=deterministic, pool="cls")

        def emb(key, n, name):
            ids = jnp.clip(batch[key], 0, n - 1)
            return nn.Embed(n, self.hidden_size, dtype=self.dtype, name=name)(ids)

        extra = (emb("age_ids", self.num_ages, "age_embedding")
                 + emb("segment_ids", self.num_segments, "segment_embedding")
                 + emb("adm_loc_ids", self.num_admission_locs,
                       "admission_loc_embedding")
                 + emb("disch_loc_ids", self.num_discharge_locs,
                       "discharge_loc_embedding")
                 + emb("gender_ids", self.num_genders, "gender_embedding")
                 + emb("ethnicity_ids", self.num_ethnicities, "ethnicity_embedding")
                 + emb("insurance_ids", self.num_insurances, "insurance_embedding")
                 ) / 7.0
        return cls + extra


class StructTextModel(nn.Module):
    """04/06/07 two-branch fusion: BEHRTFull struct embedding + precomputed
    text embedding -> :class:`AverageFusionModel` (exposes the pre-ReLU fused
    embedding for 07's extraction artifact)."""

    num_ages: int
    num_ethnicities: int = 5
    num_insurances: int = 6
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    fusion_hidden: int = 512
    num_tasks: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], deterministic: bool = True):
        struct = BEHRTFull(
            num_ages=self.num_ages, num_ethnicities=self.num_ethnicities,
            num_insurances=self.num_insurances, hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            dtype=self.dtype, name="behrt")(batch, deterministic)
        out = AverageFusionModel(fusion_hidden=self.fusion_hidden,
                                 num_tasks=self.num_tasks,
                                 dtype=self.dtype, name="fusion")(
            struct, batch["text_embedding"], deterministic)
        return out   # {"logits", "fused_embedding"}


class TextOnlyClassifier(nn.Module):
    """02's head over frozen text embeddings: 768 -> 256 -> 3
    (02_BioClinicalBERT.py:122-134)."""

    hidden: int = 256
    num_tasks: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], deterministic: bool = True):
        x = batch["text_embedding"].astype(self.dtype)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(0.1)(x, deterministic=deterministic)
        logits = nn.Dense(self.num_tasks, dtype=self.dtype, name="fc2")(x)
        return {"logits": logits.astype(jnp.float32)}


class SigmoidFusionFull(nn.Module):
    """09's full model: demo-BERT + lab encoder + text, gated fusion
    (09_multimodal_sigmoid_fusion.py:106-222)."""

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
    fusion_hidden: int = 512
    num_tasks: int = 3
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
        return SigmoidFusionModel(fusion_hidden=self.fusion_hidden,
                                  num_tasks=self.num_tasks,
                                  dtype=self.dtype, name="fusion")(
            demo, lab, batch["text_embedding"], deterministic)


class EDDIFusionFull(nn.Module):
    """08's model: 6L/6H demo-BERT + lab + text encoders with nine
    single-logit heads; returns ``task_modality_logits`` [B, 3, 3]
    (tasks x (demo, lab, text)) plus flat fused-input projections.  The
    EDDI-derived logit weights are training-loop state, not parameters
    (08_multimodal_eddi_fusion.py:348-402), so fusion happens in the
    pipeline."""

    num_ages: int
    num_genders: int
    num_ethnicities: int
    num_insurances: int
    lab_token_count: int
    hidden_size: int = 768
    demo_layers: int = 6
    demo_heads: int = 6
    lab_layers: int = 2
    lab_heads: int = 8
    proj_dim: int = 256
    dtype: Any = jnp.float32
    # Single-element tuple = the Mechanical_Ventilation generation's
    # single-task regime (FinalCode/Mechanical_Ventilation/07_*EDDI*).
    tasks: Tuple[str, ...] = ("mortality", "los", "mech")

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
        projs = [
            _Projector(self.proj_dim, self.dtype, name="demo_projector")(demo),
            _Projector(self.proj_dim, self.dtype, name="lab_projector")(lab),
            _Projector(self.proj_dim, self.dtype, name="text_projector")(
                batch["text_embedding"]),
        ]
        rows = []
        for ti, task in enumerate(self.tasks):
            cols = [nn.Dense(1, dtype=self.dtype, name=f"head_{task}_{m}")(projs[mi])
                    for mi, m in enumerate(("demo", "lab", "text"))]
            rows.append(jnp.concatenate(cols, axis=-1))        # [B, 3 mods]
        tm = jnp.stack(rows, axis=1).astype(jnp.float32)       # [B, T tasks, 3 mods]
        return {"task_modality_logits": tm,
                # Equal-weight fusion as the default "logits" view.
                "logits": jnp.mean(tm, axis=2)}


class BEHRTLabOnlyModel(nn.Module):
    """01's structured-only baseline as a batch-dict wrapper."""

    lab_token_count: int
    hidden_size: int = 768
    dtype: Any = jnp.float32
    tasks: Tuple[str, ...] = ("mort", "los", "mech")

    @nn.compact
    def __call__(self, batch: Dict[str, Any], deterministic: bool = True):
        logits = BEHRTCombined(self.lab_token_count, self.hidden_size,
                               dtype=self.dtype, tasks=self.tasks,
                               name="combined")(
            batch["lab_features"], deterministic)
        return {"logits": logits}
