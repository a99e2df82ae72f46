"""Fusion heads and full multimodal models.

The reference's fusion family (one per numbered script):

- :class:`FAMEModel` — EDDI-weighted + sigmoid-gated fusion with per-modality
  auxiliary heads and a 768->512->3 fusion MLP (10_FAME.py:226-313; 05_FPM is
  the same model with different hyperparameters).
- :class:`AverageFusionModel` — plain concat fusion of structured + text
  projections (07_multimodal_average_fusion.py:205-238).
- :class:`SigmoidFusionModel` — per-modality learnable 256-d sigmoid gates,
  no fairness weighting (09_multimodal_sigmoid_fusion.py:162-222).
- :class:`EDDIFusionModel` — nine single-logit heads fused at the logit level
  with batch-EDDI-derived weights (08_multimodal_eddi_fusion.py:314-402).
- :class:`DfCModel` — demographics-free classification baseline
  (03_DfC.py:156-220).

Dynamic EDDI weights enter :class:`FAMEModel` as a plain ``[3, 3]`` float
array input (task x modality), so per-epoch updates never trigger a
recompile.  Reference quirk kept under ``reference_weight_compat`` (default
True): the forward pass applies the *mortality* task's weights to all three
tasks (10_FAME.py:283-285).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from fairmultimodal_tpu.models.behrt import BEHRTDemo, BEHRTLab


def _out_dtype(compute_dtype):
    """Output dtype: AT LEAST f32.  bf16 compute returns f32 (losses/metrics
    run in f32); f64 runs (the float64 torch-trajectory oracle) pass through
    instead of being silently truncated back to f32."""
    return jnp.promote_types(compute_dtype, jnp.float32)

__all__ = [
    "FAMEFusion",
    "FAMEModel",
    "AverageFusionModel",
    "SigmoidFusionModel",
    "EDDIFusionModel",
    "DfCModel",
]


class _Projector(nn.Module):
    """Linear(., 256) + ReLU modality projector (10_FAME.py:235-246).

    ``return_pre=True`` also returns the pre-ReLU linear output — 07 saves
    ``cat(ts_pre, text_pre)`` as its extraction artifact
    (07_multimodal_average_fusion.py:227-237).  Param tree is unchanged.
    """

    out: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_pre: bool = False):
        pre = nn.Dense(self.out, dtype=self.dtype, name="dense")(x)
        post = nn.relu(pre)
        return (pre, post) if return_pre else post


class FAMEFusion(nn.Module):
    """Fusion head over precomputed modality embeddings.

    Inputs: demo/lab/text embeddings [B, H_m]; ``dynamic_weights`` [3, 3]
    (rows = tasks in reference order, cols = (demo, lab, text)).

    Returns dict with ``fused_logits`` [B, 3] (fp32), per-modality logits,
    ``sigmoid_weights`` [768], ``gated_vector`` and ``fusion_pre_relu``
    (the extraction artifacts of 10_FAME.py:559-604).

    ``reference_weight_compat`` (default True) reproduces 10_FAME.py:283-285:
    the mortality task's dynamic-weight row scales the projections for ALL
    three tasks.  ``False`` is the fixed mode — each task fuses with its own
    weight row through the shared gate/MLP trunk and takes its own logit
    (the behavior the reference's per-task ``dynamic_weights`` rows imply).
    """

    fusion_hidden: int = 512
    proj_dim: int = 256
    num_tasks: int = 3
    reference_weight_compat: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, demo_emb, lab_emb, text_emb, dynamic_weights=None,
                 deterministic: bool = True) -> Dict[str, Any]:
        p = self.proj_dim
        demo_proj = _Projector(p, self.dtype, name="demo_projector")(demo_emb)
        lab_proj = _Projector(p, self.dtype, name="lab_projector")(lab_emb)
        text_proj = _Projector(p, self.dtype, name="text_projector")(text_emb)

        if dynamic_weights is None:
            w = jnp.full((self.num_tasks, 3), 0.33, self.dtype)
        else:
            w = dynamic_weights.astype(self.dtype)

        sig_w = self.param("sig_weights", nn.initializers.normal(1.0), (3 * p,))
        sig = nn.sigmoid(sig_w).astype(self.dtype)
        dense1 = nn.Dense(self.fusion_hidden, dtype=self.dtype,
                          name="fusion_dense1")
        dropout = nn.Dropout(0.1)
        dense2 = nn.Dense(self.num_tasks, dtype=self.dtype,
                          name="fusion_dense2")

        if self.reference_weight_compat:
            # Reference quirk: the *mortality* row's dynamic weights are
            # applied to every task's fusion (10_FAME.py:283-285).
            row = w[0]
            fused = jnp.concatenate(
                [row[0] * demo_proj, row[1] * lab_proj, row[2] * text_proj],
                axis=-1)
            gated = fused * sig
            pre_relu = dense1(gated)
            h = nn.relu(pre_relu)
            h = dropout(h, deterministic=deterministic)
            fused_logits = dense2(h)
        else:
            # Fixed mode: each task t fuses with its OWN weight row w[t]
            # through the shared gate + MLP trunk; task t's logit is the t-th
            # output of its own trunk pass (diagonal over the task axes).
            projs = jnp.stack([demo_proj, lab_proj, text_proj], axis=1)  # [B, 3, p]
            # scaled[b, t, m, :] = w[t, m] * projs[b, m, :]
            scaled = w[None, :, :, None] * projs[:, None]     # [B, T, 3, p]
            fused_t = scaled.reshape(
                scaled.shape[0], self.num_tasks, 3 * p)       # [B, T, 3p]
            gated_t = fused_t * sig
            pre_relu_t = dense1(gated_t)                      # [B, T, 512]
            h = nn.relu(pre_relu_t)
            h = dropout(h, deterministic=deterministic)
            out = dense2(h)                                   # [B, T, T]
            fused_logits = jnp.diagonal(out, axis1=1, axis2=2)
            # Extraction artifacts keep the mortality-row trunk's tensors so
            # shapes match the reference npz contract ([B, 768] / [B, 512]).
            gated = gated_t[:, 0]
            pre_relu = pre_relu_t[:, 0]

        return {
            "fused_logits": fused_logits.astype(_out_dtype(self.dtype)),
            "modality_logits": {
                "demo": nn.Dense(self.num_tasks, dtype=self.dtype,
                                 name="classifier_demo")(demo_proj).astype(_out_dtype(self.dtype)),
                "lab": nn.Dense(self.num_tasks, dtype=self.dtype,
                                name="classifier_lab")(lab_proj).astype(_out_dtype(self.dtype)),
                "text": nn.Dense(self.num_tasks, dtype=self.dtype,
                                 name="classifier_text")(text_proj).astype(_out_dtype(self.dtype)),
            },
            "sigmoid_weights": nn.sigmoid(sig_w),
            "gated_vector": gated.astype(_out_dtype(self.dtype)),
            "fusion_pre_relu": pre_relu.astype(_out_dtype(self.dtype)),
        }


class FAMEModel(nn.Module):
    """Full FAME: BEHRT-Demo + BEHRT-Lab encoders + precomputed text
    embedding + :class:`FAMEFusion` (10_FAME.py:226-313,774-785).

    The text modality is a frozen-BioClinicalBERT embedding computed once
    (see ``models.text``), exactly like the reference, so the trainable graph
    is demo-BERT + lab-encoder + fusion.
    """

    num_ages: int
    num_genders: int
    num_ethnicities: int
    num_insurances: int
    lab_token_count: int
    text_embed_size: int = 768
    hidden_size: int = 768
    demo_layers: int = 12
    demo_heads: int = 12
    lab_layers: int = 2
    lab_heads: int = 8
    fusion_hidden: int = 512
    reference_weight_compat: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], dynamic_weights=None,
                 deterministic: bool = True) -> Dict[str, Any]:
        demo_emb = BEHRTDemo(
            self.num_ages, self.num_genders, self.num_ethnicities,
            self.num_insurances, hidden_size=self.hidden_size,
            num_hidden_layers=self.demo_layers,
            num_attention_heads=self.demo_heads,
            dtype=self.dtype, name="behrt_demo",
        )(batch["demo_dummy_ids"], batch["demo_attn_mask"], batch["age_ids"],
          batch["gender_ids"], batch["ethnicity_ids"], batch["insurance_ids"],
          deterministic)
        lab_emb = BEHRTLab(
            self.lab_token_count, self.hidden_size, num_heads=self.lab_heads,
            num_layers=self.lab_layers, dtype=self.dtype, name="behrt_lab",
        )(batch["lab_features"], deterministic)
        return FAMEFusion(
            self.fusion_hidden,
            reference_weight_compat=self.reference_weight_compat,
            dtype=self.dtype, name="fusion",
        )(demo_emb, lab_emb, batch["text_embedding"], dynamic_weights,
          deterministic)


class AverageFusionModel(nn.Module):
    """07: structured + text -> two 256-d projectors -> concat -> MLP -> 3
    logits; exposes the pre-ReLU fused embedding for extraction
    (07_multimodal_average_fusion.py:205-238)."""

    proj_dim: int = 256
    fusion_hidden: int = 512
    num_tasks: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, struct_emb, text_emb, deterministic: bool = True):
        s_pre, s = _Projector(self.proj_dim, self.dtype,
                              name="struct_projector")(struct_emb,
                                                       return_pre=True)
        t_pre, t = _Projector(self.proj_dim, self.dtype,
                              name="text_projector")(text_emb,
                                                     return_pre=True)
        fused = jnp.concatenate([s, t], axis=-1)
        h = nn.relu(nn.Dense(self.fusion_hidden, dtype=self.dtype,
                             name="dense1")(fused))
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        logits = nn.Dense(self.num_tasks, dtype=self.dtype, name="dense2")(h)
        return {
            "logits": logits.astype(_out_dtype(self.dtype)),
            # 07's extraction artifact is the concat of the two PRE-ReLU
            # projection outputs (07_multimodal_average_fusion.py:227-237:
            # fused_embedding_pre_relu = cat(ts_pre, text_pre)), NOT the
            # classifier dense1 pre-activation.
            "fused_embedding": jnp.concatenate(
                [s_pre, t_pre], axis=-1).astype(_out_dtype(self.dtype)),
        }


class SigmoidFusionModel(nn.Module):
    """09: per-modality learnable sigmoid gates post-projection, concat ->
    aggregate 768->512+ReLU -> classifier 512->512+ReLU+Dropout(0.1)->3
    (09_multimodal_sigmoid_fusion.py:162-222).

    The ``classifier_hidden`` 512->512 layer matches the reference's
    ``classifier = Sequential(Linear(512,512), ReLU, Dropout(0.1),
    Linear(512,3))`` on top of ``aggregate_projector`` (09:187-197) — it was
    missing before round 3 (the model had a single 768->512 hidden layer);
    the end-to-end torch oracle caught the divergence.  Param-tree break vs
    rounds 1-2 noted in PARITY.md.
    """

    proj_dim: int = 256
    fusion_hidden: int = 512
    num_tasks: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, demo_emb, lab_emb, text_emb, deterministic: bool = True):
        p = self.proj_dim
        demo = _Projector(p, self.dtype, name="demo_projector")(demo_emb)
        lab = _Projector(p, self.dtype, name="lab_projector")(lab_emb)
        text = _Projector(p, self.dtype, name="text_projector")(text_emb)
        g_demo = nn.sigmoid(self.param("sig_weights_demo",
                                       nn.initializers.normal(1.0), (p,)))
        g_lab = nn.sigmoid(self.param("sig_weights_lab",
                                      nn.initializers.normal(1.0), (p,)))
        g_text = nn.sigmoid(self.param("sig_weights_text",
                                       nn.initializers.normal(1.0), (p,)))
        fused = jnp.concatenate([demo * g_demo.astype(self.dtype),
                                 lab * g_lab.astype(self.dtype),
                                 text * g_text.astype(self.dtype)], axis=-1)
        # aggregate_projector (09:187-190); kept under the historical name
        # "proj".
        agg = nn.relu(nn.Dense(self.fusion_hidden, dtype=self.dtype,
                               name="proj")(fused))
        h = nn.relu(nn.Dense(self.fusion_hidden, dtype=self.dtype,
                             name="classifier_hidden")(agg))
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        logits = nn.Dense(self.num_tasks, dtype=self.dtype, name="classifier")(h)
        return {"logits": logits.astype(_out_dtype(self.dtype)),
                "aggregated": agg.astype(_out_dtype(self.dtype)),
                "gates": (g_demo, g_lab, g_text)}


class EDDIFusionModel(nn.Module):
    """08: 3 tasks x 3 modalities single-logit heads; the train loop fuses
    logits with batch-EDDI weights (08_multimodal_eddi_fusion.py:314-402).
    The model returns the 9 logits; weighting lives in the training script
    because the weights are derived from running fairness statistics."""

    proj_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, demo_emb, lab_emb, text_emb, deterministic: bool = True):
        projs = {
            "demo": _Projector(self.proj_dim, self.dtype, name="demo_projector")(demo_emb),
            "lab": _Projector(self.proj_dim, self.dtype, name="lab_projector")(lab_emb),
            "text": _Projector(self.proj_dim, self.dtype, name="text_projector")(text_emb),
        }
        logits = {}
        for task in ("mortality", "los", "mechanical_ventilation"):
            for mod, x in projs.items():
                logits[f"{task}_{mod}"] = nn.Dense(
                    1, dtype=self.dtype, name=f"head_{task}_{mod}")(x).astype(_out_dtype(self.dtype))
        return logits


class DfCModel(nn.Module):
    """03: demographics-free classification — BERT CLS over a dummy token
    with segment/ward embeddings (no age/gender/ethnicity/insurance) fused
    with text (03_DfC.py:156-220)."""

    num_segments: int = 2
    num_admission_locs: int = 10
    num_discharge_locs: int = 10
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    proj_dim: int = 256
    num_tasks: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, Any], deterministic: bool = True):
        from fairmultimodal_tpu.models.bert import BertConfig, BertEncoderModel

        vocab = self.num_segments + self.num_admission_locs + self.num_discharge_locs + 2
        cfg = BertConfig(vocab_size=max(vocab, 4), hidden_size=self.hidden_size,
                         num_hidden_layers=self.num_hidden_layers,
                         num_attention_heads=self.num_attention_heads,
                         intermediate_size=self.hidden_size * 4)
        cls = BertEncoderModel(cfg, dtype=self.dtype, name="bert")(
            batch["dummy_ids"], batch["attn_mask"], deterministic=deterministic,
            pool="cls")

        def emb(ids, n, name):
            ids = jnp.clip(ids, 0, n - 1)
            return nn.Embed(n, self.hidden_size, dtype=self.dtype, name=name)(ids)

        extra = (emb(batch["segment_ids"], self.num_segments, "segment_embedding")
                 + emb(batch["admission_loc_ids"], self.num_admission_locs,
                       "admission_loc_embedding")
                 + emb(batch["discharge_loc_ids"], self.num_discharge_locs,
                       "discharge_loc_embedding")) / 3.0
        struct = cls + extra

        s = _Projector(self.proj_dim, self.dtype, name="struct_projector")(struct)
        t = _Projector(self.proj_dim, self.dtype, name="text_projector")(
            batch["text_embedding"])
        fused = jnp.concatenate([s, t], axis=-1)
        h = nn.relu(nn.Dense(512, dtype=self.dtype, name="dense1")(fused))
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        logits = nn.Dense(self.num_tasks, dtype=self.dtype, name="dense2")(h)
        return {"logits": logits.astype(_out_dtype(self.dtype))}
