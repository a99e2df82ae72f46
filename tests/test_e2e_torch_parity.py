"""END-TO-END numerical parity of the assembled models against live PyTorch.

The module-level parity tests (``test_torch_parity.py``, ``test_bert_parity``)
check each building block; this file checks the whole assembly — the one
offline artifact that can catch a silent wiring divergence (projection order,
dynamic-weight application, L_EDDI reduction, gradient flow) that block-level
tests cannot see:

- ``TorchFAME`` replicates the reference FAME model
  (``10_FAME.py:226-313``: BEHRTModel_Demo + BEHRTModel_Lab +
  MultimodalTransformer_EDDI_Sigmoid) from torch primitives, the joint loss
  replicates ``train_step`` (``10_FAME.py:401-449``: BCE(pos_weight) +
  lambda_edd*(10*L_EDDI with the python torch.unique subgroup loop) +
  lambda_l1*|sig_weights|_1).
- ``TorchAvgFusion`` replicates 07's BEHRTModel + MultimodalTransformer
  (``07_multimodal_average_fusion.py:156-238``) with the reference FocalLoss
  (γ=1, pos_weight) summed over tasks.
- ``TorchSigmoidFusion`` replicates 09's gated fusion
  (``09_multimodal_sigmoid_fusion.py:106-222``) — this oracle caught the
  missing 512→512 ``classifier_hidden`` layer (see PARITY.md).
- ``TorchEDDIFusion`` replicates 08's nine-head model + the per-batch EDDI
  weight nudge from detached logits (``08:261-452``), compared against the
  EXACT pipeline loss (``make_eddi_fusion_loss``).

Protocol: init the Flax model, transplant its weights into the torch replica
(the same tensor mapping is applied to the Flax gradient tree so gradients
compare leaf-for-leaf), evaluate both on one batch with dropout off, and
assert:

- fused logits agree to <= 1e-5 fp32 (also modality logits / gated vector /
  fusion_pre_relu / fused_embedding),
- each loss component (BCE, L_EDDI, L1 / focal) agrees to <= 1e-6,
- every parameter gradient of the total loss agrees to <= 1e-4.

Tolerances are recorded in PARITY.md.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fairmultimodal_tpu.models.baselines import (  # noqa: E402
    EDDIFusionFull,
    SigmoidFusionFull,
    StructTextModel,
)
from fairmultimodal_tpu.models.fusion import FAMEModel  # noqa: E402
from fairmultimodal_tpu.ops.losses import bce_with_logits  # noqa: E402
from fairmultimodal_tpu.fairness.loss import eddi_loss  # noqa: E402
from fairmultimodal_tpu.train.simple import masked_task_loss  # noqa: E402

H = 32            # hidden size (tiny geometry; wiring is size-independent)
NH = 4            # attention heads
LAYERS = 2        # demo BERT layers
LABS = 16         # lab token count (multiple of BEHRTLab.pad_to: no pad path)
TEXT_DIM = 12
B = 6
N_AGE, N_GEN, N_ETH, N_INS = 4, 2, 5, 6


# --- Flax -> torch tensor mapping --------------------------------------------

def _bert_sd(flax_bert, prefix, num_layers):
    """Flax BertEncoderModel params -> HF BertModel state-dict entries."""
    t = {}
    emb = flax_bert["embeddings"]
    t[f"{prefix}embeddings.word_embeddings.weight"] = emb["word_embeddings"]["embedding"]
    t[f"{prefix}embeddings.position_embeddings.weight"] = emb["position_embeddings"]["embedding"]
    t[f"{prefix}embeddings.token_type_embeddings.weight"] = emb["token_type_embeddings"]["embedding"]
    t[f"{prefix}embeddings.LayerNorm.weight"] = emb["layer_norm"]["scale"]
    t[f"{prefix}embeddings.LayerNorm.bias"] = emb["layer_norm"]["bias"]
    for i in range(num_layers):
        fl = flax_bert[f"layer_{i}"]
        p = f"{prefix}encoder.layer.{i}"
        for ours, theirs in (("query", "attention.self.query"),
                             ("key", "attention.self.key"),
                             ("value", "attention.self.value"),
                             ("output_dense", "attention.output.dense")):
            t[f"{p}.{theirs}.weight"] = fl["attention"][ours]["kernel"].T
            t[f"{p}.{theirs}.bias"] = fl["attention"][ours]["bias"]
        t[f"{p}.attention.output.LayerNorm.weight"] = fl["attention"]["output_layer_norm"]["scale"]
        t[f"{p}.attention.output.LayerNorm.bias"] = fl["attention"]["output_layer_norm"]["bias"]
        t[f"{p}.intermediate.dense.weight"] = fl["intermediate"]["kernel"].T
        t[f"{p}.intermediate.dense.bias"] = fl["intermediate"]["bias"]
        t[f"{p}.output.dense.weight"] = fl["output"]["kernel"].T
        t[f"{p}.output.dense.bias"] = fl["output"]["bias"]
        t[f"{p}.output.LayerNorm.weight"] = fl["output_layer_norm"]["scale"]
        t[f"{p}.output.LayerNorm.bias"] = fl["output_layer_norm"]["bias"]
    return t


def _torch_layer_sd(fl, prefix):
    """Flax TorchEncoderLayer params -> nn.TransformerEncoderLayer entries."""
    t = {}
    t[f"{prefix}.self_attn.in_proj_weight"] = np.concatenate(
        [fl["query"]["kernel"].T, fl["key"]["kernel"].T, fl["value"]["kernel"].T])
    t[f"{prefix}.self_attn.in_proj_bias"] = np.concatenate(
        [fl["query"]["bias"], fl["key"]["bias"], fl["value"]["bias"]])
    t[f"{prefix}.self_attn.out_proj.weight"] = fl["attn_out"]["kernel"].T
    t[f"{prefix}.self_attn.out_proj.bias"] = fl["attn_out"]["bias"]
    t[f"{prefix}.linear1.weight"] = fl["ffn_in"]["kernel"].T
    t[f"{prefix}.linear1.bias"] = fl["ffn_in"]["bias"]
    t[f"{prefix}.linear2.weight"] = fl["ffn_out"]["kernel"].T
    t[f"{prefix}.linear2.bias"] = fl["ffn_out"]["bias"]
    t[f"{prefix}.norm1.weight"] = fl["norm1"]["scale"]
    t[f"{prefix}.norm1.bias"] = fl["norm1"]["bias"]
    t[f"{prefix}.norm2.weight"] = fl["norm2"]["scale"]
    t[f"{prefix}.norm2.bias"] = fl["norm2"]["bias"]
    return t


def _dense(fl):
    return fl["kernel"].T, fl["bias"]


def _demo_lab_sd(params):
    """Shared BEHRTDemo + BEHRTLab encoder mapping (the trunk every fusion
    family reuses — 08:261-312, 09:106-160, 10_FAME.py:175-224)."""
    t = _bert_sd(params["behrt_demo"]["bert"], "bert.", LAYERS)
    for name in ("age", "gender", "ethnicity", "insurance"):
        t[f"{name}_embedding.weight"] = params["behrt_demo"][f"{name}_embedding"]["embedding"]
    lab = params["behrt_lab"]
    t["token_embedding.weight"], t["token_embedding.bias"] = _dense(lab["token_embedding"])
    t["pos_embedding"] = lab["pos_embedding"]
    for i in range(2):
        t.update(_torch_layer_sd(lab[f"layer_{i}"], f"encoder.layers.{i}"))
    return t


def fame_flax_to_torch(params):
    """FAMEModel param tree -> TorchFAME state-dict arrays.

    Applied both to weights (transplant) and to the gradient tree (leaf-wise
    comparison) — the mapping is linear, so it commutes with d/dθ.
    """
    t = _demo_lab_sd(params)
    fu = params["fusion"]
    for mod in ("demo", "lab", "text"):
        t[f"{mod}_projector.weight"], t[f"{mod}_projector.bias"] = _dense(
            fu[f"{mod}_projector"]["dense"])
        t[f"classifier_{mod}.weight"], t[f"classifier_{mod}.bias"] = _dense(
            fu[f"classifier_{mod}"])
    t["sig_weights"] = fu["sig_weights"]
    t["fusion1.weight"], t["fusion1.bias"] = _dense(fu["fusion_dense1"])
    t["fusion2.weight"], t["fusion2.bias"] = _dense(fu["fusion_dense2"])
    return {k: np.asarray(v) for k, v in t.items()}


class _TorchDemoLab(torch.nn.Module):
    """Shared BEHRTModel_Demo + BEHRTModel_Lab trunk in torch primitives
    (10_FAME.py:175-224; 08:261-312 and 09:106-160 are the same modules)."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        cfg = transformers.BertConfig(
            vocab_size=N_AGE + N_GEN + N_ETH + N_INS + 2, hidden_size=H,
            num_hidden_layers=LAYERS, num_attention_heads=NH,
            intermediate_size=3072, max_position_embeddings=512,
            type_vocab_size=2)
        self.bert = transformers.BertModel(cfg, add_pooling_layer=False)
        self.age_embedding = nn.Embedding(N_AGE, H)
        self.gender_embedding = nn.Embedding(N_GEN, H)
        self.ethnicity_embedding = nn.Embedding(N_ETH, H)
        self.insurance_embedding = nn.Embedding(N_INS, H)
        # BEHRTModel_Lab (10_FAME.py:208-224); batch_first is numerically
        # identical to the reference's permute-to-[S,B,H] dance.
        self.token_embedding = nn.Linear(1, H)
        self.pos_embedding = nn.Parameter(torch.randn(LABS, H))
        layer = nn.TransformerEncoderLayer(H, NH, batch_first=True)
        self.encoder = nn.TransformerEncoder(layer, 2)

    def encode(self, b):
        cls = self.bert(input_ids=b["demo_dummy_ids"],
                        attention_mask=b["demo_attn_mask"]).last_hidden_state[:, 0, :]
        extra = (self.age_embedding(b["age_ids"])
                 + self.gender_embedding(b["gender_ids"])
                 + self.ethnicity_embedding(b["ethnicity_ids"])
                 + self.insurance_embedding(b["insurance_ids"])) / 4.0
        demo = cls + extra
        x = self.token_embedding(b["lab_features"].unsqueeze(-1)) + self.pos_embedding
        lab = self.encoder(x).mean(dim=1)
        return demo, lab


class TorchFAME(_TorchDemoLab):
    """Reference FAME semantics (10_FAME.py:175-313) in torch primitives."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.demo_projector = nn.Linear(H, 256)
        self.lab_projector = nn.Linear(H, 256)
        self.text_projector = nn.Linear(TEXT_DIM, 256)
        self.classifier_demo = nn.Linear(256, 3)
        self.classifier_lab = nn.Linear(256, 3)
        self.classifier_text = nn.Linear(256, 3)
        self.sig_weights = nn.Parameter(torch.randn(768))
        self.fusion1 = nn.Linear(768, 512)
        self.fusion2 = nn.Linear(512, 3)

    def forward(self, b, w_mort):
        relu = torch.nn.functional.relu
        demo, lab = self.encode(b)
        demo_p = relu(self.demo_projector(demo))
        lab_p = relu(self.lab_projector(lab))
        text_p = relu(self.text_projector(b["text_embedding"]))
        # Reference quirk 10_FAME.py:283-293: the MORTALITY row's weights
        # scale every task's fusion.
        fused = torch.cat([w_mort[0] * demo_p, w_mort[1] * lab_p,
                           w_mort[2] * text_p], dim=1)
        gated = fused * torch.sigmoid(self.sig_weights)
        pre_relu = self.fusion1(gated)
        logits = self.fusion2(relu(pre_relu))
        return {
            "fused_logits": logits,
            "modality_logits": {"demo": self.classifier_demo(demo_p),
                                "lab": self.classifier_lab(lab_p),
                                "text": self.classifier_text(text_p)},
            "gated_vector": gated,
            "fusion_pre_relu": pre_relu,
        }


def reference_leddi(fused_probs, labels, sens_tensors):
    """Verbatim-semantics L_EDDI (10_FAME.py:423-442): python loop over
    torch.unique subgroups, (subgroup_err - overall_err)^2, sqrt(mean+1e-8),
    mean over all (task, attribute) rmse terms."""
    leddi_losses = []
    for i in range(fused_probs.shape[1]):
        p_i, y_i = fused_probs[:, i], labels[:, i]
        overall = torch.mean(torch.abs(p_i - y_i))
        for sens in sens_tensors:
            diffs = []
            for group in torch.unique(sens):
                m = sens == group
                if m.sum() > 0:
                    sub = torch.mean(torch.abs(p_i[m] - y_i[m]))
                    diffs.append((sub - overall) ** 2)
            if diffs:
                leddi_losses.append(
                    torch.sqrt(torch.mean(torch.stack(diffs)) + 1e-8))
    return torch.mean(torch.stack(leddi_losses))


def _example_batch(rng):
    return {
        "demo_dummy_ids": np.ones((B, 1), np.int32),
        "demo_attn_mask": np.ones((B, 1), np.int32),
        "age_ids": rng.integers(0, N_AGE, B).astype(np.int32),
        "gender_ids": rng.integers(0, N_GEN, B).astype(np.int32),
        "ethnicity_ids": rng.integers(0, N_ETH, B).astype(np.int32),
        "insurance_ids": rng.integers(0, N_INS, B).astype(np.int32),
        "lab_features": rng.normal(0, 1, (B, LABS)).astype(np.float32),
        "text_embedding": rng.normal(0, 1, (B, TEXT_DIM)).astype(np.float32),
    }


def _to_torch(batch):
    return {k: torch.tensor(v) for k, v in batch.items()}


def _compare_grads(flax_grads_sd, torch_model, atol):
    torch_grads = {k: p.grad for k, p in torch_model.named_parameters()}
    compared = 0
    for name, g in flax_grads_sd.items():
        if name not in torch_grads:
            continue
        tg = torch_grads[name]
        if tg is None:
            # Params outside the loss graph (torch autograd leaves .grad
            # None): the reference's FAME joint loss never touches the
            # modality classifiers (10_FAME.py:401-449 uses fused_logits
            # only — they stay at init and merely drive the EDDI weight
            # pass).  Flax must agree: exactly zero gradient.
            assert not np.any(g), f"flax grad nonzero for loss-free {name}"
        else:
            np.testing.assert_allclose(
                g, tg.detach().numpy(), atol=atol, rtol=1e-3,
                err_msg=f"gradient mismatch at {name}")
        compared += 1
    assert compared == len(torch_grads)   # every trainable param covered
    return compared


LAMBDA_EDD, LAMBDA_L1 = 0.8, 0.01
POS_W = np.array([2.0, 0.5, 3.0], np.float32)


@pytest.mark.slow
def test_fame_end_to_end_matches_torch():
    rng = np.random.default_rng(0)
    batch = _example_batch(rng)
    labels = rng.integers(0, 2, (B, 3)).astype(np.float32)
    dyn_w = np.array([[0.5, 0.3, 0.2], [0.1, 0.6, 0.3], [0.25, 0.45, 0.30]],
                     np.float32)

    model = FAMEModel(num_ages=N_AGE, num_genders=N_GEN, num_ethnicities=N_ETH,
                      num_insurances=N_INS, lab_token_count=LABS,
                      hidden_size=H, demo_layers=LAYERS, demo_heads=NH,
                      lab_layers=2, lab_heads=NH)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    # Typed threefry key: pipeline tests flip the global default-PRNG flag
    # (utils/rng.py), and this test's draws must not depend on suite order.
    params = model.init(jax.random.key(0, impl="threefry2x32"), jb)["params"]

    ref = TorchFAME()
    sd = fame_flax_to_torch(jax.tree_util.tree_map(np.asarray, params))
    missing, unexpected = ref.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("position_ids" in m for m in missing), missing
    ref.eval()

    tb = _to_torch(batch)
    out_ref = ref(tb, torch.tensor(dyn_w[0]))
    out = model.apply({"params": params}, jb,
                      dynamic_weights=jnp.asarray(dyn_w), deterministic=True)

    # -- forward parity (<= 1e-5 fp32) --
    np.testing.assert_allclose(np.asarray(out["fused_logits"]),
                               out_ref["fused_logits"].detach().numpy(),
                               atol=1e-5, rtol=1e-5)
    for m in ("demo", "lab", "text"):
        np.testing.assert_allclose(
            np.asarray(out["modality_logits"][m]),
            out_ref["modality_logits"][m].detach().numpy(),
            atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["gated_vector"]),
                               out_ref["gated_vector"].detach().numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["fusion_pre_relu"]),
                               out_ref["fusion_pre_relu"].detach().numpy(),
                               atol=1e-5, rtol=1e-5)

    # -- joint loss components (10_FAME.py:401-449 semantics) --
    tl = torch.tensor(labels)
    sens_np = [batch["age_ids"], batch["ethnicity_ids"], batch["insurance_ids"]]
    bce_ref = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor(POS_W))(
        out_ref["fused_logits"], tl)
    leddi_ref = reference_leddi(torch.sigmoid(out_ref["fused_logits"]), tl,
                                [torch.tensor(s) for s in sens_np])
    l1_ref = torch.sum(torch.abs(ref.sig_weights))
    total_ref = bce_ref + LAMBDA_EDD * (10 * leddi_ref) + LAMBDA_L1 * l1_ref

    def flax_loss(p):
        o = model.apply({"params": p}, jb, dynamic_weights=jnp.asarray(dyn_w),
                        deterministic=True)
        logits = o["fused_logits"]
        bce = bce_with_logits(logits, jnp.asarray(labels),
                              pos_weight=jnp.asarray(POS_W))
        leddi = eddi_loss(jax.nn.sigmoid(logits), jnp.asarray(labels),
                          [jnp.asarray(s) for s in sens_np],
                          (N_AGE, N_ETH, N_INS))
        l1 = jnp.sum(jnp.abs(p["fusion"]["sig_weights"]))
        return bce + LAMBDA_EDD * (10.0 * leddi) + LAMBDA_L1 * l1, (bce, leddi, l1)

    (total, (bce, leddi, l1)), grads = jax.value_and_grad(
        flax_loss, has_aux=True)(params)
    assert float(bce) == pytest.approx(bce_ref.item(), abs=1e-6)
    assert float(leddi) == pytest.approx(leddi_ref.item(), abs=1e-6)
    assert float(l1) == pytest.approx(l1_ref.item(), abs=1e-5)
    # Sum of three independently-toleranced components: allow their combined
    # slack (the 10x L_EDDI term alone scales a 1e-6 component diff to 8e-6).
    assert float(total) == pytest.approx(total_ref.item(), abs=3e-5)

    # -- gradient parity (<= 1e-4) through the whole assembly --
    total_ref.backward()
    grads_sd = fame_flax_to_torch(jax.tree_util.tree_map(np.asarray, grads))
    n = _compare_grads(grads_sd, ref, atol=1e-4)
    assert n > 40   # BERT trunk + lab encoder + fusion all covered


# --- 07 average fusion --------------------------------------------------------

N_SEG, N_ADM, N_DIS = 2, 10, 10


def avg_flax_to_torch(params):
    t = _bert_sd(params["behrt"]["bert"], "bert.", LAYERS)
    for name in ("age", "segment", "admission_loc", "discharge_loc", "gender",
                 "ethnicity", "insurance"):
        t[f"{name}_embedding.weight"] = params["behrt"][f"{name}_embedding"]["embedding"]
    fu = params["fusion"]
    t["ts_linear.weight"], t["ts_linear.bias"] = _dense(fu["struct_projector"]["dense"])
    t["text_linear.weight"], t["text_linear.bias"] = _dense(fu["text_projector"]["dense"])
    t["cls1.weight"], t["cls1.bias"] = _dense(fu["dense1"])
    t["cls2.weight"], t["cls2.bias"] = _dense(fu["dense2"])
    return {k: np.asarray(v) for k, v in t.items()}


class TorchAvgFusion(torch.nn.Module):
    """07's BEHRTModel + MultimodalTransformer
    (07_multimodal_average_fusion.py:156-238) in torch primitives."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        cfg = transformers.BertConfig(
            vocab_size=max(N_AGE + N_SEG + N_ADM + N_DIS + 2, 4),
            hidden_size=H, num_hidden_layers=LAYERS, num_attention_heads=NH,
            intermediate_size=3072, max_position_embeddings=512,
            type_vocab_size=2)
        self.bert = transformers.BertModel(cfg, add_pooling_layer=False)
        for name, nn_emb in (("age", N_AGE), ("segment", N_SEG),
                             ("admission_loc", N_ADM), ("discharge_loc", N_DIS),
                             ("gender", N_GEN), ("ethnicity", N_ETH),
                             ("insurance", N_INS)):
            setattr(self, f"{name}_embedding", nn.Embedding(nn_emb, H))
        self.ts_linear = nn.Linear(H, 256)
        self.text_linear = nn.Linear(TEXT_DIM, 256)
        self.cls1 = nn.Linear(512, 512)
        self.cls2 = nn.Linear(512, 3)

    def forward(self, b):
        relu = torch.nn.functional.relu
        cls = self.bert(input_ids=b["demo_dummy_ids"],
                        attention_mask=b["demo_attn_mask"]).last_hidden_state[:, 0, :]
        extra = (self.age_embedding(b["age_ids"])
                 + self.segment_embedding(b["segment_ids"])
                 + self.admission_loc_embedding(b["adm_loc_ids"])
                 + self.discharge_loc_embedding(b["disch_loc_ids"])
                 + self.gender_embedding(b["gender_ids"])
                 + self.ethnicity_embedding(b["ethnicity_ids"])
                 + self.insurance_embedding(b["insurance_ids"])) / 7.0
        struct = cls + extra
        ts_pre = self.ts_linear(struct)
        text_pre = self.text_linear(b["text_embedding"])
        combined = torch.cat([relu(ts_pre), relu(text_pre)], dim=1)
        logits = self.cls2(relu(self.cls1(combined)))
        return logits, torch.cat([ts_pre, text_pre], dim=1)


def reference_focal(logits, labels, gamma=1.0, pos_weight=None):
    """FocalLoss (02:18-39 / 07:25-46): ((1-e^{-BCE})^g)*BCE with per-task
    ``pos_weight`` (the whole-cohort clip-10 weights of 07:643-647), batch
    mean, summed over the three per-task criteria."""
    total = 0.0
    for t in range(logits.shape[1]):
        pw = None if pos_weight is None else pos_weight[t].reshape(())
        bce = torch.nn.functional.binary_cross_entropy_with_logits(
            logits[:, t], labels[:, t], reduction="none", pos_weight=pw)
        total = total + (((1 - torch.exp(-bce)) ** gamma) * bce).mean()
    return total


@pytest.mark.slow
def test_average_fusion_end_to_end_matches_torch():
    rng = np.random.default_rng(1)
    batch = {
        "demo_dummy_ids": np.ones((B, 1), np.int32),
        "demo_attn_mask": np.ones((B, 1), np.int32),
        "age_ids": rng.integers(0, N_AGE, B).astype(np.int32),
        "segment_ids": rng.integers(0, N_SEG, B).astype(np.int32),
        "adm_loc_ids": rng.integers(0, N_ADM, B).astype(np.int32),
        "disch_loc_ids": rng.integers(0, N_DIS, B).astype(np.int32),
        "gender_ids": rng.integers(0, N_GEN, B).astype(np.int32),
        "ethnicity_ids": rng.integers(0, N_ETH, B).astype(np.int32),
        "insurance_ids": rng.integers(0, N_INS, B).astype(np.int32),
        "text_embedding": rng.normal(0, 1, (B, TEXT_DIM)).astype(np.float32),
    }
    labels = rng.integers(0, 2, (B, 3)).astype(np.float32)

    model = StructTextModel(num_ages=N_AGE, num_ethnicities=N_ETH,
                            num_insurances=N_INS, hidden_size=H,
                            num_hidden_layers=LAYERS, num_attention_heads=NH)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.key(1, impl="threefry2x32"), jb)["params"]

    ref = TorchAvgFusion()
    sd = avg_flax_to_torch(jax.tree_util.tree_map(np.asarray, params))
    missing, unexpected = ref.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("position_ids" in m for m in missing), missing
    ref.eval()

    logits_ref, fused_ref = ref(_to_torch(batch))
    out = model.apply({"params": params}, jb, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.detach().numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["fused_embedding"]),
                               fused_ref.detach().numpy(),
                               atol=1e-5, rtol=1e-5)

    # Loss parity through the TRAINER's assembly (masked_task_loss is what
    # MultitaskTrainer differentiates), with the whole-cohort clip-10
    # pos_weight the pipeline now passes (07:643-647).
    loss_ref = reference_focal(logits_ref, torch.tensor(labels),
                               pos_weight=torch.tensor(POS_W))

    def flax_loss(p):
        o = model.apply({"params": p}, jb, deterministic=True)
        return masked_task_loss(o["logits"], jnp.asarray(labels),
                                jnp.ones(B), loss="focal", gamma=1.0,
                                pos_weight=jnp.asarray(POS_W))

    loss, grads = jax.value_and_grad(flax_loss)(params)
    assert float(loss) == pytest.approx(loss_ref.item(), abs=1e-6)

    loss_ref.backward()
    grads_sd = avg_flax_to_torch(jax.tree_util.tree_map(np.asarray, grads))
    n = _compare_grads(grads_sd, ref, atol=1e-4)
    assert n > 30


# --- 09 sigmoid fusion --------------------------------------------------------

def sigmoid_flax_to_torch(params):
    t = _demo_lab_sd(params)
    fu = params["fusion"]
    for mod in ("demo", "lab", "text"):
        t[f"{mod}_projector.weight"], t[f"{mod}_projector.bias"] = _dense(
            fu[f"{mod}_projector"]["dense"])
        t[f"sig_weights_{mod}"] = fu[f"sig_weights_{mod}"]
    t["aggregate.weight"], t["aggregate.bias"] = _dense(fu["proj"])
    t["cls_hidden.weight"], t["cls_hidden.bias"] = _dense(fu["classifier_hidden"])
    t["cls_out.weight"], t["cls_out.bias"] = _dense(fu["classifier"])
    return {k: np.asarray(v) for k, v in t.items()}


class TorchSigmoidFusion(_TorchDemoLab):
    """09's MultimodalTransformer (09_multimodal_sigmoid_fusion.py:162-222):
    three 256-d gated projections -> concat -> aggregate_projector
    (768->512+ReLU) -> classifier (512->512+ReLU+Dropout+512->3)."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.demo_projector = nn.Linear(H, 256)
        self.lab_projector = nn.Linear(H, 256)
        self.text_projector = nn.Linear(TEXT_DIM, 256)
        self.sig_weights_demo = nn.Parameter(torch.randn(256))
        self.sig_weights_lab = nn.Parameter(torch.randn(256))
        self.sig_weights_text = nn.Parameter(torch.randn(256))
        self.aggregate = nn.Linear(768, 512)
        self.cls_hidden = nn.Linear(512, 512)
        self.cls_out = nn.Linear(512, 3)

    def forward(self, b):
        relu = torch.nn.functional.relu
        demo, lab = self.encode(b)
        demo_p = relu(self.demo_projector(demo))
        lab_p = relu(self.lab_projector(lab))
        text_p = relu(self.text_projector(b["text_embedding"]))
        concat = torch.cat([demo_p * torch.sigmoid(self.sig_weights_demo),
                            lab_p * torch.sigmoid(self.sig_weights_lab),
                            text_p * torch.sigmoid(self.sig_weights_text)],
                           dim=1)
        aggregated = relu(self.aggregate(concat))
        logits = self.cls_out(relu(self.cls_hidden(aggregated)))  # dropout off
        return logits, aggregated


@pytest.mark.slow
def test_sigmoid_fusion_end_to_end_matches_torch():
    """Full 09 assembly: forward, FocalLoss(gamma=1, pos_weight) per task
    summed (09:464-483,663-670), and gradients, against live torch.

    This test is what caught the missing 512->512 classifier_hidden layer
    (round-3 fix in models/fusion.py): with the reference architecture both
    sides agree leaf-for-leaf."""
    rng = np.random.default_rng(2)
    batch = _example_batch(rng)
    labels = rng.integers(0, 2, (B, 3)).astype(np.float32)

    model = SigmoidFusionFull(
        num_ages=N_AGE, num_genders=N_GEN, num_ethnicities=N_ETH,
        num_insurances=N_INS, lab_token_count=LABS, hidden_size=H,
        demo_layers=LAYERS, demo_heads=NH, lab_layers=2, lab_heads=NH)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.key(2, impl="threefry2x32"), jb)["params"]

    ref = TorchSigmoidFusion()
    sd = sigmoid_flax_to_torch(jax.tree_util.tree_map(np.asarray, params))
    missing, unexpected = ref.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("position_ids" in m for m in missing), missing
    ref.eval()

    logits_ref, agg_ref = ref(_to_torch(batch))
    out = model.apply({"params": params}, jb, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.detach().numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["aggregated"]),
                               agg_ref.detach().numpy(), atol=1e-5, rtol=1e-5)

    loss_ref = reference_focal(logits_ref, torch.tensor(labels),
                               pos_weight=torch.tensor(POS_W))

    def flax_loss(p):
        o = model.apply({"params": p}, jb, deterministic=True)
        return masked_task_loss(o["logits"], jnp.asarray(labels),
                                jnp.ones(B), loss="focal", gamma=1.0,
                                pos_weight=jnp.asarray(POS_W))

    loss, grads = jax.value_and_grad(flax_loss)(params)
    assert float(loss) == pytest.approx(loss_ref.item(), abs=1e-6)

    loss_ref.backward()
    grads_sd = sigmoid_flax_to_torch(jax.tree_util.tree_map(np.asarray, grads))
    n = _compare_grads(grads_sd, ref, atol=1e-4)
    assert n > 40


# --- 08 EDDI logit-weighted fusion --------------------------------------------

def eddi_flax_to_torch(params):
    t = _demo_lab_sd(params)
    for mod in ("demo", "lab", "text"):
        t[f"{mod}_projector.weight"], t[f"{mod}_projector.bias"] = _dense(
            params[f"{mod}_projector"]["dense"])
    for task in ("mortality", "los", "mech"):
        for mod in ("demo", "lab", "text"):
            t[f"head_{task}_{mod}.weight"], t[f"head_{task}_{mod}.bias"] = \
                _dense(params[f"head_{task}_{mod}"])
    return {k: np.asarray(v) for k, v in t.items()}


class TorchEDDIFusion(_TorchDemoLab):
    """08's MultimodalTransformer (08_multimodal_eddi_fusion.py:314-452):
    shared projections, nine single-logit outcome heads."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.demo_projector = nn.Linear(H, 256)
        self.lab_projector = nn.Linear(H, 256)
        self.text_projector = nn.Linear(TEXT_DIM, 256)
        for task in ("mortality", "los", "mech"):
            for mod in ("demo", "lab", "text"):
                setattr(self, f"head_{task}_{mod}", nn.Linear(256, 1))

    def forward(self, b):
        relu = torch.nn.functional.relu
        demo, lab = self.encode(b)
        projs = {"demo": relu(self.demo_projector(demo)),
                 "lab": relu(self.lab_projector(lab)),
                 "text": relu(self.text_projector(b["text_embedding"]))}
        logits = {}
        for task in ("mortality", "los", "mech"):
            for mod in ("demo", "lab", "text"):
                logits[f"{task}_{mod}"] = getattr(
                    self, f"head_{task}_{mod}")(projs[mod])
        return logits


def reference_compute_eddi(y_true, y_pred_bin, sensitive):
    """Verbatim semantics of 08's compute_eddi (08:45-59): normalized
    subgroup error gaps over np.unique groups, sqrt-sum / n_groups."""
    unique_groups = np.unique(sensitive)
    overall = np.mean(y_pred_bin != y_true)
    denom = max(overall, 1 - overall) if overall not in (0, 1) else 1.0
    vals = []
    for g in unique_groups:
        m = sensitive == g
        er = np.mean(y_pred_bin[m] != y_true[m])
        vals.append((er - overall) / denom)
    return np.sqrt(np.sum(np.asarray(vals) ** 2)) / len(unique_groups)


@pytest.mark.slow
def test_eddi_fusion_end_to_end_matches_torch():
    """Full 08 assembly against live torch: nine-head forward, per-batch
    EDDI weight nudge from DETACHED logits (08:348-402, gender-sensitive),
    weighted logit fusion, FocalLoss(gamma=1, pos_weight) + the
    (mort_logit - 1)^2 regularizer (08:483-488), and gradients.

    The flax side is the EXACT pipeline loss (make_eddi_fusion_loss), so a
    wiring change in the pipeline breaks this test."""
    from fairmultimodal_tpu.pipelines.eddi_fusion import (
        EDDIFusionPipelineConfig,
        make_eddi_fusion_loss,
    )

    rng = np.random.default_rng(3)
    batch = _example_batch(rng)
    # Both genders present so np.unique(gender) == {0, 1} on the torch side
    # matches the present-mask group count on the flax side.
    batch["gender_ids"] = np.array([0, 1, 0, 1, 0, 1], np.int32)
    labels = rng.integers(0, 2, (B, 3)).astype(np.float32)
    w_prev = np.array([[0.40, 0.30, 0.30],
                       [0.33, 0.33, 0.33],
                       [0.25, 0.45, 0.30]], np.float32)

    model = EDDIFusionFull(
        num_ages=N_AGE, num_genders=N_GEN, num_ethnicities=N_ETH,
        num_insurances=N_INS, lab_token_count=LABS, hidden_size=H,
        demo_layers=LAYERS, demo_heads=NH, lab_layers=2, lab_heads=NH)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.key(3, impl="threefry2x32"), jb)["params"]

    ref = TorchEDDIFusion()
    sd = eddi_flax_to_torch(jax.tree_util.tree_map(np.asarray, params))
    missing, unexpected = ref.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("position_ids" in m for m in missing), missing
    ref.eval()

    cfg = EDDIFusionPipelineConfig()        # beta=0.3, reg_weight=1.0, gamma=1
    flax_loss_fn = make_eddi_fusion_loss(model, cfg, pos_weight=POS_W)
    fbatch = {"model_inputs": jb, "labels": jnp.asarray(labels),
              "weight": jnp.ones(B)}

    def flax_loss(p):
        loss, (w_new, fused) = flax_loss_fn(p, fbatch, jnp.asarray(w_prev),
                                            jax.random.PRNGKey(0), False)
        return loss, (w_new, fused)

    (loss, (w_new, fused)), grads = jax.value_and_grad(
        flax_loss, has_aux=True)(params)

    # -- torch side: compute_weighted_logit semantics (08:348-402) --
    raw = ref(_to_torch(batch))
    gender = batch["gender_ids"]
    tasks = ("mortality", "los", "mech")
    fused_cols, w_rows = [], []
    for ti, task in enumerate(tasks):
        eddis = []
        for mod in ("demo", "lab", "text"):
            prob = torch.sigmoid(raw[f"{task}_{mod}"].detach()).numpy().squeeze()
            eddis.append(reference_compute_eddi(labels[:, ti],
                                                (prob > 0.5).astype(float),
                                                gender))
        e_max = max(eddis)
        w_t = [w_prev[ti, mi] + cfg.beta * (e_max - e)
               for mi, e in enumerate(eddis)]
        w_rows.append(w_t)
        fused_cols.append(w_t[0] * raw[f"{task}_demo"]
                          + w_t[1] * raw[f"{task}_lab"]
                          + w_t[2] * raw[f"{task}_text"])
    fused_ref = torch.cat(fused_cols, dim=1)

    np.testing.assert_allclose(np.asarray(w_new), np.asarray(w_rows),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused),
                               fused_ref.detach().numpy(),
                               atol=1e-5, rtol=1e-5)

    # -- joint loss: Σ_t FocalLoss_t(fused_t) + reg_weight*mean((mort-1)^2) --
    tl = torch.tensor(labels)
    loss_ref = reference_focal(fused_ref, tl, gamma=1.0,
                               pos_weight=torch.tensor(POS_W))
    loss_ref = loss_ref + cfg.reg_weight * ((fused_ref[:, 0] - 1.0) ** 2).mean()
    assert float(loss) == pytest.approx(loss_ref.item(), abs=1e-6)

    # -- gradients flow ONLY through the raw logits (weights detached) --
    loss_ref.backward()
    grads_sd = eddi_flax_to_torch(jax.tree_util.tree_map(np.asarray, grads))
    n = _compare_grads(grads_sd, ref, atol=1e-4)
    assert n > 40


# --- 03 DfC (demographics-free) -----------------------------------------------

N_SEG2, N_ADM2, N_DIS2 = 2, 7, 9


def dfc_flax_to_torch(params):
    t = _bert_sd(params["bert"], "bert.", LAYERS)
    for name in ("segment", "admission_loc", "discharge_loc"):
        t[f"{name}_embedding.weight"] = params[f"{name}_embedding"]["embedding"]
    t["ts_linear.weight"], t["ts_linear.bias"] = _dense(
        params["struct_projector"]["dense"])
    t["text_linear.weight"], t["text_linear.bias"] = _dense(
        params["text_projector"]["dense"])
    t["cls1.weight"], t["cls1.bias"] = _dense(params["dense1"])
    t["cls2.weight"], t["cls2.bias"] = _dense(params["dense2"])
    return {k: np.asarray(v) for k, v in t.items()}


class TorchDfC(torch.nn.Module):
    """03's BEHRTModel_DfC + MultimodalTransformer_DfC (03_DfC.py:156-220):
    dummy-token BERT CLS + mean of three ward embeddings, ts/text 256-d
    projectors, 512->512->3 classifier.  No demographic inputs at all."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        cfg = transformers.BertConfig(
            vocab_size=max(N_SEG2 + N_ADM2 + N_DIS2 + 2, 4), hidden_size=H,
            num_hidden_layers=LAYERS, num_attention_heads=NH,
            intermediate_size=H * 4, max_position_embeddings=512,
            type_vocab_size=2)
        self.bert = transformers.BertModel(cfg, add_pooling_layer=False)
        self.segment_embedding = nn.Embedding(N_SEG2, H)
        self.admission_loc_embedding = nn.Embedding(N_ADM2, H)
        self.discharge_loc_embedding = nn.Embedding(N_DIS2, H)
        self.ts_linear = nn.Linear(H, 256)
        self.text_linear = nn.Linear(TEXT_DIM, 256)
        self.cls1 = nn.Linear(512, 512)
        self.cls2 = nn.Linear(512, 3)

    def forward(self, b):
        relu = torch.nn.functional.relu
        cls = self.bert(input_ids=b["dummy_ids"],
                        attention_mask=b["attn_mask"]).last_hidden_state[:, 0, :]
        extra = (self.segment_embedding(b["segment_ids"])
                 + self.admission_loc_embedding(b["admission_loc_ids"])
                 + self.discharge_loc_embedding(b["discharge_loc_ids"])) / 3.0
        struct = cls + extra
        combined = torch.cat([relu(self.ts_linear(struct)),
                              relu(self.text_linear(b["text_embedding"]))],
                             dim=1)
        return self.cls2(relu(self.cls1(combined)))


@pytest.mark.slow
def test_dfc_end_to_end_matches_torch():
    """Full 03 assembly: demographics-free forward, FocalLoss(gamma=1,
    pos_weight) per task summed (03:648-653), gradients."""
    from fairmultimodal_tpu.models.fusion import DfCModel

    rng = np.random.default_rng(4)
    batch = {
        "dummy_ids": np.ones((B, 1), np.int32),
        "attn_mask": np.ones((B, 1), np.int32),
        "segment_ids": rng.integers(0, N_SEG2, B).astype(np.int32),
        "admission_loc_ids": rng.integers(0, N_ADM2, B).astype(np.int32),
        "discharge_loc_ids": rng.integers(0, N_DIS2, B).astype(np.int32),
        "text_embedding": rng.normal(0, 1, (B, TEXT_DIM)).astype(np.float32),
    }
    labels = rng.integers(0, 2, (B, 3)).astype(np.float32)

    model = DfCModel(num_segments=N_SEG2, num_admission_locs=N_ADM2,
                     num_discharge_locs=N_DIS2, hidden_size=H,
                     num_hidden_layers=LAYERS, num_attention_heads=NH)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.key(4, impl="threefry2x32"), jb)["params"]

    ref = TorchDfC()
    sd = dfc_flax_to_torch(jax.tree_util.tree_map(np.asarray, params))
    missing, unexpected = ref.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("position_ids" in m for m in missing), missing
    ref.eval()

    logits_ref = ref(_to_torch(batch))
    out = model.apply({"params": params}, jb, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.detach().numpy(),
                               atol=1e-5, rtol=1e-5)

    loss_ref = reference_focal(logits_ref, torch.tensor(labels),
                               pos_weight=torch.tensor(POS_W))

    def flax_loss(p):
        o = model.apply({"params": p}, jb, deterministic=True)
        return masked_task_loss(o["logits"], jnp.asarray(labels),
                                jnp.ones(B), loss="focal", gamma=1.0,
                                pos_weight=jnp.asarray(POS_W))

    loss, grads = jax.value_and_grad(flax_loss)(params)
    assert float(loss) == pytest.approx(loss_ref.item(), abs=1e-6)

    loss_ref.backward()
    grads_sd = dfc_flax_to_torch(jax.tree_util.tree_map(np.asarray, grads))
    n = _compare_grads(grads_sd, ref, atol=1e-4)
    assert n > 30


# --- 04 AdvDebias: the full min-max training loop ----------------------------
#
# Unlike the forward/loss oracles above, this one runs the PRODUCTION
# ``train_adversarial`` for 20 full-batch iterations and compares the whole
# trajectory (per-iteration combined loss, final params of BOTH networks)
# against a verbatim torch replica of 04_AdvDebias.py:664-731 — Sequential
# predictor/adversary with in-module Sigmoid + BCELoss, and the reference's
# exact backward(retain_graph=True)/backward()/step()/step() order, whose
# .grad accumulation makes the update NOT a textbook min-max (see
# train/adversarial.py module doc).  Dropout 0 so both sides are
# deterministic.

def test_adv_debias_training_matches_torch():
    from fairmultimodal_tpu.train.adversarial import (
        AdvConfig, AdvAdversary, AdvPredictor, train_adversarial)

    rng = np.random.default_rng(11)
    n, f = 48, 7
    X = rng.normal(0, 1, (n, f)).astype(np.float32)
    y = rng.integers(0, 2, n).astype(np.float32)
    z = rng.integers(0, 2, n).astype(np.float32)
    nv = 24
    Xv = rng.normal(0, 1, (nv, f)).astype(np.float32)
    yv = rng.integers(0, 2, nv).astype(np.float32)
    zv = rng.integers(0, 2, nv).astype(np.float32)

    cfg = AdvConfig(learning_rate=1e-2, num_iters=20, num_nodes=8,
                    num_nodes_adv=6, dropout_rate=0.0, alpha=1.0, seed=3)
    out = train_adversarial(X, y, z, Xv, yv, zv, cfg, verbose=False,
                            log_every=1)

    # Rebuild the exact Flax init (same code path as train_adversarial —
    # which pins a TYPED threefry key, so this must too: a raw PRNGKey
    # follows the process-global impl flag and diverges in full-suite runs).
    key = jax.random.key(cfg.seed, impl="threefry2x32")
    k1, k2 = jax.random.split(key)
    p0 = AdvPredictor(cfg.num_nodes, 0.0).init(
        k1, jnp.asarray(X[:1]))["params"]
    a0 = AdvAdversary(cfg.num_nodes_adv, 0.0).init(
        k2, jnp.zeros((1, 2)))["params"]

    def mlp_sd(p):
        return {
            "0.weight": torch.tensor(np.asarray(p["fc1"]["kernel"]).T),
            "0.bias": torch.tensor(np.asarray(p["fc1"]["bias"])),
            "3.weight": torch.tensor(np.asarray(p["fc2"]["kernel"]).T),
            "3.bias": torch.tensor(np.asarray(p["fc2"]["bias"])),
        }

    # Verbatim reference architecture (04:624-655) + training loop
    # (04:714-731).
    model = torch.nn.Sequential(
        torch.nn.Linear(f, cfg.num_nodes), torch.nn.ReLU(),
        torch.nn.Dropout(0.0), torch.nn.Linear(cfg.num_nodes, 1),
        torch.nn.Sigmoid())
    adv_model = torch.nn.Sequential(
        torch.nn.Linear(2, cfg.num_nodes_adv), torch.nn.ReLU(),
        torch.nn.Dropout(0.0), torch.nn.Linear(cfg.num_nodes_adv, 1),
        torch.nn.Sigmoid())
    model.load_state_dict(mlp_sd(p0))
    adv_model.load_state_dict(mlp_sd(a0))
    bce = torch.nn.BCELoss()
    opt = torch.optim.Adam(model.parameters(), lr=cfg.learning_rate)
    adv_opt = torch.optim.Adam(adv_model.parameters(), lr=cfg.learning_rate)

    Xt = torch.tensor(X)
    yt = torch.tensor(y).view(-1, 1)
    zt = torch.tensor(z)
    ref_curve = []
    for _ in range(cfg.num_iters):
        ypred = model(Xt)
        loss_train = bce(ypred, yt)
        zpred = adv_model(torch.cat((ypred, yt), dim=1))
        adv_loss_train = bce(zpred.squeeze(), zt)
        combined = (loss_train - cfg.alpha * adv_loss_train
                    + loss_train / (adv_loss_train + 1e-8))
        opt.zero_grad()
        adv_opt.zero_grad()
        adv_loss_train.backward(retain_graph=True)
        combined.backward()
        opt.step()
        adv_opt.step()
        ref_curve.append(combined.item())

    np.testing.assert_allclose(out["train_curve"], ref_curve,
                               atol=1e-4, rtol=1e-4)

    final_p = mlp_sd(jax.tree_util.tree_map(np.asarray,
                                            out["predictor_params"]))
    for k, v in model.state_dict().items():
        np.testing.assert_allclose(final_p[k].numpy(), v.numpy(), atol=1e-4,
                                   err_msg=f"predictor {k}")
    final_a = mlp_sd(jax.tree_util.tree_map(np.asarray,
                                            out["adversary_params"]))
    for k, v in adv_model.state_dict().items():
        np.testing.assert_allclose(final_a[k].numpy(), v.numpy(), atol=1e-4,
                                   err_msg=f"adversary {k}")


# --- 06 FairEHR-CLP contrastive mode -----------------------------------------
#
# The reference defines the FairEHR_CLP stack + contrastive loss
# (06_FairEHR-CLP.py:280-353,439-487) but never trains it (train_pipeline
# uses the plain two-branch model, covered by the 07 oracle above since it is
# the same StructTextModel).  Our contrastive mode is the working version of
# that stack; this oracle pins (a) ``contrastive_loss`` against the verbatim
# reference formula (the python exp/sum loop + synthetic-variance
# regularizer), exactly, and (b) the full FairEHRCLP assembly + joint
# focal+contrastive loss + gradients against a torch replica.  The replica's
# DemographicEncoder/NotesEncoder-projection/FusionModule/DynamicRelevance/
# Classifier are reference-verbatim; its LongitudinalEncoder follows OUR
# documented shape-corrected design (the reference's only shape-checks when
# embed_dim == conv_out_channels; see models/fairehr.py module doc).

CLP_DEMO_DIM, CLP_DEMO_HID, CLP_EMB, CLP_FUS, CLP_LABS = 4, 8, 16, 16, 10
CLP_CONV, CLP_HEADS, CLP_FFN = 256, 8, 512   # LongitudinalEncoder defaults


def reference_contrastive(e_real, e_syn, tau=0.5, gamma=0.1):
    """Verbatim semantics of 06:472-487 (python loop and all)."""
    import torch.nn.functional as F

    batch_size = e_real.size(0)
    rn = F.normalize(e_real, p=2, dim=1)
    sn = F.normalize(e_syn, p=2, dim=1)
    sim = torch.mm(rn, sn.t()) / tau
    positives = sim.diag()
    loss = 0.0
    for i in range(batch_size):
        loss = loss + -torch.log(torch.exp(positives[i])
                                 / torch.exp(sim[i, :]).sum())
    loss = loss / batch_size
    mean_syn = e_syn.mean(dim=0, keepdim=True)
    reg = torch.mean((e_syn - mean_syn).pow(2))
    return loss + gamma * reg


def test_contrastive_loss_matches_reference_formula():
    from fairmultimodal_tpu.models.fairehr import contrastive_loss

    rng = np.random.default_rng(7)
    e_real = rng.normal(0, 1, (B, CLP_FUS)).astype(np.float32)
    e_syn = rng.normal(0, 1, (B, CLP_FUS)).astype(np.float32)

    ours = float(contrastive_loss(jnp.asarray(e_real), jnp.asarray(e_syn)))
    ref = reference_contrastive(torch.tensor(e_real), torch.tensor(e_syn))
    assert ours == pytest.approx(ref.item(), abs=1e-6)

    # The masked variant with weight == ones must agree with the unmasked
    # reference too (the pipeline always passes the pad mask).
    ours_w = float(contrastive_loss(jnp.asarray(e_real), jnp.asarray(e_syn),
                                    weight=jnp.ones(B)))
    assert ours_w == pytest.approx(ref.item(), abs=1e-6)


def clp_flax_to_torch(params):
    t = {}
    t["demo_encoder.mlp.0.weight"], t["demo_encoder.mlp.0.bias"] = _dense(
        params["demo_encoder"]["fc1"])
    t["demo_encoder.mlp.2.weight"], t["demo_encoder.mlp.2.bias"] = _dense(
        params["demo_encoder"]["fc2"])
    le = params["long_encoder"]
    t["long_encoder.feature_embedding.weight"], \
        t["long_encoder.feature_embedding.bias"] = _dense(
            le["feature_embedding"])
    # flax Conv kernel [k, in, out] -> torch Conv1d weight [out, in, k].
    t["long_encoder.conv1d.weight"] = np.transpose(
        np.asarray(le["conv"]["kernel"]), (2, 1, 0))
    t["long_encoder.conv1d.bias"] = le["conv"]["bias"]
    for i in range(2):
        t.update(_torch_layer_sd(le[f"layer_{i}"],
                                 f"long_encoder.encoder.layers.{i}"))
    t["long_encoder.proj.weight"], t["long_encoder.proj.bias"] = _dense(
        le["proj"])
    t["notes_encoder.proj.0.weight"], t["notes_encoder.proj.0.bias"] = _dense(
        params["notes_encoder"]["proj"])
    t["fusion.mlp.0.weight"], t["fusion.mlp.0.bias"] = _dense(
        params["fusion"]["fc1"])
    t["fusion.mlp.2.weight"], t["fusion.mlp.2.bias"] = _dense(
        params["fusion"]["fc2"])
    t["dr.weights"] = params["dr"]["weights"]
    t["classifier.mlp.0.weight"], t["classifier.mlp.0.bias"] = _dense(
        params["classifier_hidden"])
    t["classifier.mlp.3.weight"], t["classifier.mlp.3.bias"] = _dense(
        params["classifier"])
    return {k: np.asarray(v) for k, v in t.items()}


class TorchFairEHRCLP(torch.nn.Module):
    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.demo_encoder = nn.Module()
        self.demo_encoder.mlp = nn.Sequential(
            nn.Linear(CLP_DEMO_DIM, CLP_DEMO_HID), nn.ReLU(),
            nn.Linear(CLP_DEMO_HID, CLP_DEMO_HID))
        self.long_encoder = nn.Module()
        self.long_encoder.feature_embedding = nn.Linear(1, CLP_EMB)
        self.long_encoder.conv1d = nn.Conv1d(CLP_EMB, CLP_CONV, 3, padding=1)
        layer = nn.TransformerEncoderLayer(
            CLP_CONV, CLP_HEADS, dim_feedforward=CLP_FFN, batch_first=True)
        self.long_encoder.encoder = nn.TransformerEncoder(layer, 2)
        self.long_encoder.proj = nn.Linear(CLP_CONV, CLP_EMB)
        self.notes_encoder = nn.Module()
        self.notes_encoder.proj = nn.Sequential(
            nn.Linear(CLP_EMB, CLP_EMB), nn.ReLU())
        fusion_in = CLP_DEMO_HID + 2 * CLP_EMB
        self.fusion = nn.Module()
        self.fusion.mlp = nn.Sequential(
            nn.Linear(fusion_in, CLP_FUS), nn.ReLU(),
            nn.Linear(CLP_FUS, CLP_FUS))
        self.dr = nn.Module()
        self.dr.weights = nn.Parameter(torch.ones(CLP_FUS))
        self.classifier = nn.Module()
        self.classifier.mlp = nn.Sequential(
            nn.Linear(CLP_FUS, CLP_FUS // 2), nn.ReLU(), nn.Dropout(0.1),
            nn.Linear(CLP_FUS // 2, 3))

    def _long(self, x):
        h = self.long_encoder.feature_embedding(x.unsqueeze(-1))   # [B, F, E]
        h = self.long_encoder.conv1d(h.transpose(1, 2)).transpose(1, 2)
        h = self.long_encoder.encoder(h)                           # [B, F, C]
        return self.long_encoder.proj(h.mean(dim=1))

    def _fuse(self, demo, lab, text):
        e = torch.cat([self.demo_encoder.mlp(demo), self._long(lab),
                       self.notes_encoder.proj(text)], dim=1)
        fused = self.fusion.mlp(e)
        return torch.sigmoid(self.dr.weights) * fused

    def forward(self, b):
        e_adj = self._fuse(b["demo_features"], b["lab_features"],
                           b["text_embedding"])
        e_adj_syn = self._fuse(b["demo_features_syn"], b["lab_features_syn"],
                               b["text_embedding_syn"])
        logits = self.classifier.mlp(e_adj)
        return logits, e_adj, e_adj_syn


def test_fairehr_clp_end_to_end_matches_torch():
    from fairmultimodal_tpu.models.fairehr import FairEHRCLP, contrastive_loss

    rng = np.random.default_rng(13)
    batch = {
        "demo_features": rng.normal(0, 1, (B, CLP_DEMO_DIM)).astype(np.float32),
        "lab_features": rng.normal(0, 1, (B, CLP_LABS)).astype(np.float32),
        "text_embedding": rng.normal(0, 1, (B, CLP_EMB)).astype(np.float32),
    }
    for k in list(batch):
        batch[k + "_syn"] = (batch[k]
                             + 0.05 * rng.normal(0, 1, batch[k].shape)
                             ).astype(np.float32)
    labels = rng.integers(0, 2, (B, 3)).astype(np.float32)

    model = FairEHRCLP(num_tasks=3, demo_hidden=CLP_DEMO_HID,
                       embed_dim=CLP_EMB, fusion_dim=CLP_FUS)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.key(13, impl="threefry2x32"), jb)["params"]

    ref = TorchFairEHRCLP()
    sd = clp_flax_to_torch(jax.tree_util.tree_map(np.asarray, params))
    ref.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    ref.eval()

    tb = {k: torch.tensor(v) for k, v in batch.items()}
    logits_ref, e_adj_ref, e_syn_ref = ref(tb)
    out = model.apply({"params": params}, jb, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["e_adj"]),
                               e_adj_ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["e_adj_syn"]),
                               e_syn_ref.detach().numpy(), atol=1e-5)

    # Joint loss exactly as the contrastive-mode pipeline trains it
    # (pipelines/fairehr_clp.py): focal(γ=1, pos_weight) + 0.1 * contrastive.
    loss_ref = (reference_focal(logits_ref, torch.tensor(labels),
                                pos_weight=torch.tensor(POS_W))
                + 0.1 * reference_contrastive(e_adj_ref, e_syn_ref))

    def flax_loss(p):
        o = model.apply({"params": p}, jb, deterministic=True)
        return (masked_task_loss(o["logits"], jnp.asarray(labels),
                                 jnp.ones(B), loss="focal", gamma=1.0,
                                 pos_weight=jnp.asarray(POS_W))
                + 0.1 * contrastive_loss(o["e_adj"], o["e_adj_syn"],
                                         weight=jnp.ones(B)))

    loss, grads = jax.value_and_grad(flax_loss)(params)
    assert float(loss) == pytest.approx(loss_ref.item(), abs=1e-6)

    loss_ref.backward()
    grads_sd = clp_flax_to_torch(jax.tree_util.tree_map(np.asarray, grads))
    n = _compare_grads(grads_sd, ref, atol=1e-4)
    assert n > 25


# --- 01 BEHRT structured-only baseline ---------------------------------------

def behrt_flax_to_torch(params):
    lab = params["lab_model"]
    t = {}
    t["lab_model.token_embedding.weight"], \
        t["lab_model.token_embedding.bias"] = _dense(lab["token_embedding"])
    t["lab_model.pos_embedding"] = lab["pos_embedding"]
    for i in range(2):
        t.update(_torch_layer_sd(
            lab[f"layer_{i}"], f"lab_model.transformer_encoder.layers.{i}"))
    t["fusion_fc.weight"], t["fusion_fc.bias"] = _dense(params["fusion_fc"])
    for task in ("mort", "los", "mech"):
        t[f"classifier_{task}.weight"], t[f"classifier_{task}.bias"] = _dense(
            params[f"classifier_{task}"])
    return {k: np.asarray(v) for k, v in t.items()}


class TorchBEHRTCombined(torch.nn.Module):
    """Verbatim BEHRTModel_Combined (01_BEHRT.py:112-149): lab encoder
    (Linear(1,H) token embed + learned pos + 2 post-LN layers + mean-pool)
    -> fusion_fc -> dropout -> three single-logit heads."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.lab_model = nn.Module()
        self.lab_model.token_embedding = nn.Linear(1, H)
        self.lab_model.pos_embedding = nn.Parameter(torch.randn(LABS, H))
        layer = nn.TransformerEncoderLayer(H, 8, batch_first=True)
        self.lab_model.transformer_encoder = nn.TransformerEncoder(layer, 2)
        self.fusion_fc = nn.Linear(H, H)
        self.classifier_mort = nn.Linear(H, 1)
        self.classifier_los = nn.Linear(H, 1)
        self.classifier_mech = nn.Linear(H, 1)

    def forward(self, lab):
        x = self.lab_model.token_embedding(lab.unsqueeze(-1))
        x = x + self.lab_model.pos_embedding
        x = self.lab_model.transformer_encoder(x).mean(dim=1)
        fused = self.fusion_fc(x)
        return torch.cat([self.classifier_mort(fused),
                          self.classifier_los(fused),
                          self.classifier_mech(fused)], dim=1)


def test_behrt_combined_end_to_end_matches_torch():
    """01's assembly: forward logits, per-task BCE(pos_weight=neg/pos) sum
    (01:209-226), all gradients."""
    from fairmultimodal_tpu.models.behrt import BEHRTCombined

    rng = np.random.default_rng(21)
    lab = rng.normal(0, 1, (B, LABS)).astype(np.float32)
    labels = rng.integers(0, 2, (B, 3)).astype(np.float32)

    model = BEHRTCombined(lab_token_count=LABS, hidden_size=H)
    params = model.init(jax.random.key(21, impl="threefry2x32"),
                        jnp.asarray(lab))["params"]

    ref = TorchBEHRTCombined()
    sd = behrt_flax_to_torch(jax.tree_util.tree_map(np.asarray, params))
    ref.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    ref.eval()

    logits_ref = ref(torch.tensor(lab))
    logits = model.apply({"params": params}, jnp.asarray(lab),
                         deterministic=True)
    np.testing.assert_allclose(np.asarray(logits),
                               logits_ref.detach().numpy(),
                               atol=1e-5, rtol=1e-5)

    # Reference loss: sum of per-task mean BCEWithLogits(pos_weight).
    pw = torch.tensor(POS_W)
    loss_ref = sum(
        torch.nn.BCEWithLogitsLoss(pos_weight=pw[i])(
            logits_ref[:, i], torch.tensor(labels[:, i]))
        for i in range(3))

    def flax_loss(p):
        lg = model.apply({"params": p}, jnp.asarray(lab), deterministic=True)
        return masked_task_loss(lg, jnp.asarray(labels), jnp.ones(B),
                                loss="bce", gamma=1.0,
                                pos_weight=jnp.asarray(POS_W))

    loss, grads = jax.value_and_grad(flax_loss)(params)
    # 5e-6 abs (rel ~6e-7 at loss ~3.2): the three-term pos_weighted BCE sum
    # accumulates in a different order than torch's.
    assert float(loss) == pytest.approx(loss_ref.item(), abs=5e-6)

    loss_ref.backward()
    grads_sd = behrt_flax_to_torch(jax.tree_util.tree_map(np.asarray, grads))
    n = _compare_grads(grads_sd, ref, atol=1e-4)
    assert n > 25


# --- Legacy generations (SURVEY §2.4): sequence BEHRT + EDDI-dot fusion ------

SEQ_S = 8
# Distinct names: N_ADM/N_DIS above belong to the 07 avg-fusion replica.
SEQ_DIS, SEQ_ADM, SEQ_DISCH = 10, 3, 3


def behrt_sequence_flax_to_torch(params):
    """BEHRTSequence param tree -> TorchBEHRTSequence state-dict arrays
    (New/02_BEHRT.py:175-240)."""
    t = _bert_sd(params["bert"], "bert.", LAYERS)
    for name in ("age", "segment", "admission_loc", "discharge_loc",
                 "gender", "ethnicity", "insurance"):
        t[f"{name}_embedding.weight"] = params[f"{name}_embedding"]["embedding"]
    for task in ("mortality", "los", "mech"):
        (t[f"classifier_{task}.weight"],
         t[f"classifier_{task}.bias"]) = _dense(params[f"classifier_{task}"])
    return {k: np.asarray(v) for k, v in t.items()}


class TorchBEHRTSequence(torch.nn.Module):
    """Verbatim legacy BEHRTModel (New/02_BEHRT.py:175-240): disease-id
    sequence through BERT, seven per-position embeddings summed onto the
    sequence output, CLS-position single-logit heads."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        cfg = transformers.BertConfig(
            vocab_size=SEQ_DIS + N_AGE + 2 + SEQ_ADM + SEQ_DISCH + 2,
            hidden_size=H, num_hidden_layers=LAYERS, num_attention_heads=NH,
            intermediate_size=H * 4, max_position_embeddings=512,
            type_vocab_size=2)
        self.bert = transformers.BertModel(cfg, add_pooling_layer=False)
        self.age_embedding = nn.Embedding(N_AGE, H)
        self.segment_embedding = nn.Embedding(2, H)
        self.admission_loc_embedding = nn.Embedding(SEQ_ADM, H)
        self.discharge_loc_embedding = nn.Embedding(SEQ_DISCH, H)
        self.gender_embedding = nn.Embedding(N_GEN, H)
        self.ethnicity_embedding = nn.Embedding(N_ETH, H)
        self.insurance_embedding = nn.Embedding(N_INS, H)
        self.classifier_mortality = nn.Linear(H, 1)
        self.classifier_los = nn.Linear(H, 1)
        self.classifier_mech = nn.Linear(H, 1)

    def forward(self, b):
        clamp = lambda x, emb: torch.clamp(x, 0, emb.num_embeddings - 1)
        mask = (b["disease_ids"] != 0).long()      # :208-209
        seq = self.bert(input_ids=b["disease_ids"],
                        attention_mask=mask).last_hidden_state
        combined = (seq
                    + self.age_embedding(clamp(b["age_ids"], self.age_embedding))
                    + self.segment_embedding(clamp(b["segment_ids"], self.segment_embedding))
                    + self.admission_loc_embedding(clamp(b["adm_loc_ids"], self.admission_loc_embedding))
                    + self.discharge_loc_embedding(clamp(b["disch_loc_ids"], self.discharge_loc_embedding))
                    + self.gender_embedding(clamp(b["gender_ids"], self.gender_embedding))
                    + self.ethnicity_embedding(clamp(b["ethnicity_ids"], self.ethnicity_embedding))
                    + self.insurance_embedding(clamp(b["insurance_ids"], self.insurance_embedding)))
        cls = combined[:, 0, :]
        return torch.cat([self.classifier_mortality(cls),
                          self.classifier_los(cls),
                          self.classifier_mech(cls)], dim=1)


def _legacy_seq_batch(rng):
    b = {
        # Zeros appear so the ids!=0 mask path is exercised; age ids include
        # out-of-range values so both clamps are exercised.
        "disease_ids": rng.integers(0, SEQ_DIS, (B, SEQ_S)).astype(np.int32),
        "age_ids": rng.integers(0, N_AGE + 2, (B, SEQ_S)).astype(np.int32),
        "segment_ids": (np.arange(SEQ_S, dtype=np.int32) % 2)[None].repeat(B, 0),
        "adm_loc_ids": rng.integers(0, SEQ_ADM, (B, SEQ_S)).astype(np.int32),
        "disch_loc_ids": rng.integers(0, SEQ_DISCH, (B, SEQ_S)).astype(np.int32),
        "gender_ids": rng.integers(0, N_GEN, (B, SEQ_S)).astype(np.int32),
        "ethnicity_ids": rng.integers(0, N_ETH, (B, SEQ_S)).astype(np.int32),
        "insurance_ids": rng.integers(0, N_INS, (B, SEQ_S)).astype(np.int32),
    }
    b["disease_ids"][:, 0] = 1 + b["disease_ids"][:, 0] % (SEQ_DIS - 1)  # live CLS
    return b


@pytest.mark.slow
def test_legacy_behrt_sequence_end_to_end_matches_torch():
    """Legacy sequence BEHRT (New/02_BEHRT.py): forward logits, per-task
    BCE(pos_weight = n/(2*n_pos), :267-287) sum, all gradients."""
    from fairmultimodal_tpu.models.legacy import BEHRTSequence

    rng = np.random.default_rng(31)
    batch = _legacy_seq_batch(rng)
    labels = rng.integers(0, 2, (B, 3)).astype(np.float32)

    model = BEHRTSequence(
        num_diseases=SEQ_DIS, num_ages=N_AGE, num_segments=2,
        num_admission_locs=SEQ_ADM, num_discharge_locs=SEQ_DISCH,
        num_genders=N_GEN, num_ethnicities=N_ETH, num_insurances=N_INS,
        hidden_size=H, num_hidden_layers=LAYERS, num_attention_heads=NH)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.key(31, impl="threefry2x32"), jb)["params"]

    ref = TorchBEHRTSequence()
    sd = behrt_sequence_flax_to_torch(jax.tree_util.tree_map(np.asarray, params))
    ref.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    ref.eval()

    tb = _to_torch(batch)
    tb = {k: v.long() for k, v in tb.items()}
    logits_ref = ref(tb)
    out = model.apply({"params": params}, jb, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.detach().numpy(),
                               atol=1e-5, rtol=1e-5)

    pw = torch.tensor(POS_W)
    loss_ref = sum(
        torch.nn.BCEWithLogitsLoss(pos_weight=pw[i])(
            logits_ref[:, i], torch.tensor(labels[:, i]))
        for i in range(3))

    def flax_loss(p):
        lg = model.apply({"params": p}, jb, deterministic=True)["logits"]
        return masked_task_loss(lg, jnp.asarray(labels), jnp.ones(B),
                                loss="bce", gamma=1.0,
                                pos_weight=jnp.asarray(POS_W))

    loss, grads = jax.value_and_grad(flax_loss)(params)
    assert float(loss) == pytest.approx(loss_ref.item(), abs=5e-6)

    loss_ref.backward()
    grads_sd = behrt_sequence_flax_to_torch(
        jax.tree_util.tree_map(np.asarray, grads))
    n = _compare_grads(grads_sd, ref, atol=1e-4)
    assert n > 40


def legacy_eddi_flax_to_torch(params):
    """LegacyEDDIFull param tree -> TorchLegacyEDDI state-dict arrays
    (Code/EDDI.py:225-322)."""
    t = _demo_lab_sd(params)
    fu = params["fusion"]
    for mod in ("demo", "lab", "text"):
        (t[f"{mod}_projector.weight"],
         t[f"{mod}_projector.bias"]) = _dense(fu[f"{mod}_projector"]["dense"])
        t[f"eddi_{mod}"] = fu[f"eddi_{mod}"]["eddi_weight"]
    t["cls1.weight"], t["cls1.bias"] = _dense(fu["dense1"])
    t["cls2.weight"], t["cls2.bias"] = _dense(fu["dense2"])
    return {k: np.asarray(v) for k, v in t.items()}


class TorchLegacyEDDI(_TorchDemoLab):
    """Verbatim legacy MultimodalTransformer (Code/EDDI.py:225-322): demo/lab
    trunk + 256-d projections, sigmoid*weight enhancement, dot-product scalar
    per branch, Linear(3,512)->ReLU->Dropout->Linear(512,2) classifier."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.demo_projector = nn.Linear(H, 256)
        self.lab_projector = nn.Linear(H, 256)
        self.text_projector = nn.Linear(TEXT_DIM, 256)
        self.eddi_demo = nn.Parameter(torch.ones(256))
        self.eddi_lab = nn.Parameter(torch.ones(256))
        self.eddi_text = nn.Parameter(torch.ones(256))
        self.cls1 = nn.Linear(3, 512)
        self.cls2 = nn.Linear(512, 2)

    def forward(self, b):
        relu = torch.nn.functional.relu
        demo, lab = self.encode(b)
        scalars = []
        for proj, w in ((relu(self.demo_projector(demo)), self.eddi_demo),
                        (relu(self.lab_projector(lab)), self.eddi_lab),
                        (relu(self.text_projector(b["text_embedding"])),
                         self.eddi_text)):
            enhanced = torch.sigmoid(proj) * w          # EDDI.py:203-221
            scalars.append(torch.sum(proj * enhanced, dim=1, keepdim=True))
        fused = torch.cat(scalars, dim=1)               # [B, 3]
        return self.cls2(relu(self.cls1(fused))), fused


POS_W2 = np.array([3.0, 1.5], np.float32)


@pytest.mark.slow
def test_legacy_eddi_end_to_end_matches_torch():
    """Legacy EDDI-dot fusion (Code/EDDI.py): forward logits + branch
    scalars, FocalLoss(gamma=2, pos_weight) sum over the two legacy tasks
    (:538-545), all gradients, and the clip_grad_norm_(1.0) transform
    (:346) leaf-for-leaf against optax.clip_by_global_norm."""
    import optax

    from fairmultimodal_tpu.models.legacy import LegacyEDDIFull

    rng = np.random.default_rng(37)
    batch = _example_batch(rng)
    labels = rng.integers(0, 2, (B, 2)).astype(np.float32)

    model = LegacyEDDIFull(
        num_ages=N_AGE, num_genders=N_GEN, num_ethnicities=N_ETH,
        num_insurances=N_INS, lab_token_count=LABS, hidden_size=H,
        demo_layers=LAYERS, demo_heads=NH, lab_layers=2, lab_heads=NH,
        num_tasks=2)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.key(37, impl="threefry2x32"), jb)["params"]

    ref = TorchLegacyEDDI()
    sd = legacy_eddi_flax_to_torch(jax.tree_util.tree_map(np.asarray, params))
    ref.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    ref.eval()

    logits_ref, fused_ref = ref(_to_torch(batch))
    out = model.apply({"params": params}, jb, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.detach().numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["branch_scalars"]),
                               fused_ref.detach().numpy(),
                               atol=1e-5, rtol=1e-5)

    # Reference criteria: FocalLoss(gamma=2, pos_weight, mean) per task,
    # summed (EDDI.py:538-545).  x100 so the global-norm clip below engages.
    def torch_focal(lg, y, pw):
        bce = torch.nn.functional.binary_cross_entropy_with_logits(
            lg, y, reduction="none", pos_weight=pw)
        return (((1 - torch.exp(-bce)) ** 2.0) * bce).mean()

    pw = torch.tensor(POS_W2)
    loss_ref = 100.0 * sum(
        torch_focal(logits_ref[:, i], torch.tensor(labels[:, i]), pw[i])
        for i in range(2))

    def flax_loss(p):
        lg = model.apply({"params": p}, jb, deterministic=True)["logits"]
        return 100.0 * masked_task_loss(lg, jnp.asarray(labels), jnp.ones(B),
                                        loss="focal", gamma=2.0,
                                        pos_weight=jnp.asarray(POS_W2))

    loss, grads = jax.value_and_grad(flax_loss)(params)
    # The x100 scale puts the loss at ~4.5e3 where one fp32 ulp is ~4.9e-4;
    # XLA's reduction order differs from torch's, so compare relatively.
    assert float(loss) == pytest.approx(loss_ref.item(), rel=1e-6)

    loss_ref.backward()
    grads_sd = legacy_eddi_flax_to_torch(jax.tree_util.tree_map(np.asarray, grads))
    n = _compare_grads(grads_sd, ref, atol=1e-4 * 100)
    assert n > 40

    # clip_grad_norm_(1.0) == clip_by_global_norm_torch(1.0) (the transform
    # MultitaskTrainer actually chains — incl. torch's +1e-6 denominator),
    # and it engages.
    from fairmultimodal_tpu.ops.optim import clip_by_global_norm_torch

    total = torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=1.0)
    assert total.item() > 1.0
    clip_tx = clip_by_global_norm_torch(1.0)
    clipped, _ = clip_tx.update(grads, clip_tx.init(params))
    clipped_sd = legacy_eddi_flax_to_torch(
        jax.tree_util.tree_map(np.asarray, clipped))
    for name, p in ref.named_parameters():
        if p.grad is not None and np.any(clipped_sd[name]):
            np.testing.assert_allclose(
                clipped_sd[name], p.grad.detach().numpy(),
                atol=1e-6 * 100, rtol=1e-4,
                err_msg=f"clipped gradient mismatch at {name}")


class TorchUnstructuredClassifier(torch.nn.Module):
    """Verbatim 02 UnstructuredClassifier (Final/02_BioClinicalBERT.py:122-134)."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.classifier = nn.Sequential(nn.Linear(TEXT_DIM, 16), nn.ReLU(),
                                        nn.Dropout(0.1), nn.Linear(16, 3))

    def forward(self, x):
        return self.classifier(x)


def test_text_only_classifier_end_to_end_matches_torch():
    """02's frozen-embedding head: forward logits, FocalLoss(gamma=2,
    pos_weight=balanced) sum (02:489-497), all gradients."""
    from fairmultimodal_tpu.models.baselines import TextOnlyClassifier

    rng = np.random.default_rng(41)
    emb = rng.normal(0, 1, (B, TEXT_DIM)).astype(np.float32)
    labels = rng.integers(0, 2, (B, 3)).astype(np.float32)

    model = TextOnlyClassifier(hidden=16)
    jb = {"text_embedding": jnp.asarray(emb)}
    params = model.init(jax.random.key(41, impl="threefry2x32"), jb)["params"]

    ref = TorchUnstructuredClassifier()
    sd = {}
    sd["classifier.0.weight"], sd["classifier.0.bias"] = _dense(params["fc1"])
    sd["classifier.3.weight"], sd["classifier.3.bias"] = _dense(params["fc2"])
    ref.load_state_dict({k: torch.tensor(np.asarray(v)) for k, v in sd.items()})
    ref.eval()

    logits_ref = ref(torch.tensor(emb))
    out = model.apply({"params": params}, jb, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               logits_ref.detach().numpy(),
                               atol=1e-6, rtol=1e-6)

    def torch_focal(lg, y, pw):
        bce = torch.nn.functional.binary_cross_entropy_with_logits(
            lg, y, reduction="none", pos_weight=pw)
        return (((1 - torch.exp(-bce)) ** 2.0) * bce).mean()

    pw = torch.tensor(POS_W)
    loss_ref = sum(torch_focal(logits_ref[:, i], torch.tensor(labels[:, i]),
                               pw[i]) for i in range(3))

    def flax_loss(p):
        lg = model.apply({"params": p}, jb, deterministic=True)["logits"]
        return masked_task_loss(lg, jnp.asarray(labels), jnp.ones(B),
                                loss="focal", gamma=2.0,
                                pos_weight=jnp.asarray(POS_W))

    loss, grads = jax.value_and_grad(flax_loss)(params)
    assert float(loss) == pytest.approx(loss_ref.item(), abs=1e-6)

    loss_ref.backward()
    gsd = {}
    gsd["classifier.0.weight"], gsd["classifier.0.bias"] = _dense(
        jax.tree_util.tree_map(np.asarray, grads)["fc1"])
    gsd["classifier.3.weight"], gsd["classifier.3.bias"] = _dense(
        jax.tree_util.tree_map(np.asarray, grads)["fc2"])
    n = _compare_grads(gsd, ref, atol=1e-5)
    assert n == 4


# --- Multi-step optimizer trajectory (10_FAME.py:446,786-787,829) ------------

@pytest.mark.slow
def test_fame_optimizer_trajectory_matches_torch():
    """Six steps of FAMETrainer's REAL compiled train_step — the whole
    clip_by_global_norm(1.0) -> AdamW(wd=0.01) chain plus the loss-free-head
    freeze and a mid-run plateau lr decay via set_lr — against the reference
    training loop in torch (backward -> clip_grad_norm_(1.0) -> AdamW.step,
    10_FAME.py:444-447, optimizer at :786, ReduceLROnPlateau decay at :829).

    Runs in FLOAT64 on both sides: Adam's first steps are g/(|g|+1e-8)
    elementwise, so near-zero-gradient elements amplify fp32 forward noise
    (~1e-7) to a full +-lr sign flip — measured 2e-3 max param divergence
    after ONE fp32 step.  In f64 the same amplification acts on ~1e-15
    noise, leaving the comparison tight enough (<=1e-8) to catch any real
    semantic divergence in the update chain.

    Asserts per-step losses, EVERY final parameter leaf-for-leaf, and that
    the modality classifier heads end bit-identical to init on both sides
    (torch AdamW skips .grad-None params entirely — no weight decay; the
    trainer zeroes their updates to match, see train_step's freeze)."""
    from fairmultimodal_tpu.train.loop import FAMETrainer, TrainConfig

    rng = np.random.default_rng(7)
    host_batches = []
    for _ in range(2):
        b = _example_batch(rng)
        b = {k: v.astype(np.float64) if v.dtype == np.float32 else v
             for k, v in b.items()}
        labels = rng.integers(0, 2, (B, 3)).astype(np.float64)
        host_batches.append((b, labels))
    dyn_w = np.full((3, 3), 0.33, np.float32)   # upcast identically below
    LR = 1e-3

    with jax.enable_x64(True):
        model = FAMEModel(num_ages=N_AGE, num_genders=N_GEN,
                          num_ethnicities=N_ETH, num_insurances=N_INS,
                          lab_token_count=LABS, hidden_size=H,
                          demo_layers=LAYERS, demo_heads=NH,
                          lab_layers=2, lab_heads=NH, dtype=jnp.float64)
        cfg = TrainConfig(lr=LR, weight_decay=0.01, grad_clip=1.0,
                          lambda_edd=LAMBDA_EDD, lambda_l1=LAMBDA_L1,
                          batch_size=B, rng_impl="threefry",
                          deterministic_forward=True)
        trainer = FAMETrainer(model, cfg, pos_weight=POS_W)

        def device_batch(b, labels):
            return {"model_inputs": {k: jnp.asarray(v) for k, v in b.items()},
                    "labels": jnp.asarray(labels),
                    "weight": jnp.ones(B, jnp.float64)}

        # Param draws are f32 (init dtype is param_dtype, independent of the
        # compute dtype); upcast the tree so the whole trajectory runs f64.
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64),
            trainer.init_params(device_batch(*host_batches[0])))
        heads_init = {h: jax.tree_util.tree_map(np.asarray,
                                                params["fusion"][h])
                      for h in ("classifier_demo", "classifier_lab",
                                "classifier_text")}
        opt_state = trainer.init_opt_state(params)

        ref = TorchFAME().double()
        sd0 = fame_flax_to_torch(jax.tree_util.tree_map(np.asarray, params))
        missing, unexpected = ref.load_state_dict(
            {k: torch.tensor(v, dtype=torch.float64) for k, v in sd0.items()},
            strict=False)
        assert not unexpected
        ref.eval()      # TorchFAME has no dropout modules; parity of intent
        opt = torch.optim.AdamW(ref.parameters(), lr=LR, weight_decay=0.01)

        def torch_joint_loss(b, labels):
            tb = {k: torch.tensor(v) for k, v in b.items()}
            out = ref(tb, torch.tensor(dyn_w[0], dtype=torch.float64))
            tl = torch.tensor(labels)
            bce = torch.nn.BCEWithLogitsLoss(
                pos_weight=torch.tensor(POS_W, dtype=torch.float64))(
                    out["fused_logits"], tl)
            leddi = reference_leddi(
                torch.sigmoid(out["fused_logits"]), tl,
                [torch.tensor(b[k]) for k in
                 ("age_ids", "ethnicity_ids", "insurance_ids")])
            l1 = torch.sum(torch.abs(ref.sig_weights))
            return bce + LAMBDA_EDD * (10 * leddi) + LAMBDA_L1 * l1

        jdw = jnp.asarray(dyn_w)
        step_rng = jax.random.key(0, impl="threefry2x32")  # unused: no dropout
        for step in range(6):
            if step == 3:   # plateau decay fires: lr *= 0.1 on BOTH sides
                opt_state = trainer.set_lr(opt_state, LR * 0.1)
                for g in opt.param_groups:
                    g["lr"] = LR * 0.1
            b, labels = host_batches[step % 2]

            loss_ref = torch_joint_loss(b, labels)
            opt.zero_grad()
            loss_ref.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=1.0)
            opt.step()

            params, opt_state, total, _ = trainer._train_step(
                params, opt_state, device_batch(b, labels), jdw, step_rng)
            assert float(total) == pytest.approx(
                loss_ref.item(), rel=1e-8), f"step {step}"

        final_sd = fame_flax_to_torch(
            jax.tree_util.tree_map(np.asarray, params))
        torch_sd = {k: p.detach().numpy() for k, p in ref.named_parameters()}
        compared = 0
        for name, v in final_sd.items():
            if name not in torch_sd:
                continue
            np.testing.assert_allclose(
                v, torch_sd[name], atol=1e-9, rtol=1e-6,
                err_msg=f"param trajectory diverged at {name} after 6 steps")
            compared += 1
        assert compared == len(torch_sd)

        # Loss-free modality heads: bit-identical to init on BOTH sides.
        for h, init_tree in heads_init.items():
            fu = jax.tree_util.tree_map(np.asarray, params["fusion"][h])
            assert np.array_equal(fu["kernel"], init_tree["kernel"])
            assert np.array_equal(fu["bias"], init_tree["bias"])
            np.testing.assert_array_equal(torch_sd[f"{h}.weight"],
                                          sd0[f"{h}.weight"])


# --- Full fit-protocol oracle (10_FAME.py:788-860) ---------------------------

def _reference_compute_eddi(y_true, y_pred_bin, sens, complete_groups):
    """Verbatim numpy compute_eddi (10_FAME.py:54-81): max(1-err, err)
    denominator (the `not in [0,1]` line is dead — unconditionally
    overwritten), subgroup (er - overall)/denom over PRESENT groups,
    sqrt(sum sq)/n_present."""
    y_bin = (y_pred_bin > 0.5).astype(int)
    overall = np.mean(y_bin != y_true)
    denom = (1 - overall) if overall < 0.5 else overall
    subs = []
    for g in complete_groups:
        m = sens == g
        if np.sum(m) == 0:
            continue
        er = np.mean(y_bin[m] != y_true[m])
        subs.append((er - overall) / denom)
    if not subs:
        return 0.0
    return float(np.sqrt(np.sum(np.square(subs))) / len(subs))


@pytest.mark.slow
def test_fame_fit_protocol_matches_torch():
    """FOUR epochs of FAMETrainer.fit — the COMPLETE training protocol:
    per-epoch train pass, BCE-only validation (10_FAME.py:812-826), torch
    ReduceLROnPlateau semantics (:829), best-state capture / early-stop
    bookkeeping (:830-840), and the EDDI dynamic-weight pass over the train
    loader (:315-399 with compute_eddi :54-81) — against a verbatim torch +
    numpy replica of the reference's epoch loop, in float64 on both sides.

    Asserts per-epoch train/val losses (rel 1e-8), the lr trajectory
    (exact), the dynamic-weight trajectory (atol 1e-12), and every final
    best-param leaf (atol 1e-9)."""
    from fairmultimodal_tpu.train.loop import FAMETrainer, TrainConfig

    rng = np.random.default_rng(11)
    n_train, n_val = 3, 2
    train_hb, val_hb = [], []
    for dst, n in ((train_hb, n_train), (val_hb, n_val)):
        for _ in range(n):
            b = _example_batch(rng)
            b = {k: v.astype(np.float64) if v.dtype == np.float32 else v
                 for k, v in b.items()}
            labels = rng.integers(0, 2, (B, 3)).astype(np.float64)
            dst.append((b, labels))
    LR = 1e-3
    EPOCHS = 4

    with jax.enable_x64(True):
        model = FAMEModel(num_ages=N_AGE, num_genders=N_GEN,
                          num_ethnicities=N_ETH, num_insurances=N_INS,
                          lab_token_count=LABS, hidden_size=H,
                          demo_layers=LAYERS, demo_heads=NH,
                          lab_layers=2, lab_heads=NH, dtype=jnp.float64)
        cfg = TrainConfig(lr=LR, weight_decay=0.01, grad_clip=1.0,
                          lambda_edd=LAMBDA_EDD, lambda_l1=LAMBDA_L1,
                          batch_size=B, num_epochs=EPOCHS, patience=10,
                          scheduler_factor=0.1, scheduler_patience=1,
                          threshold=0.5, beta=1.0, rng_impl="threefry",
                          deterministic_forward=True)
        trainer = FAMETrainer(model, cfg, pos_weight=POS_W)

        def device_batch(b, labels):
            return {"model_inputs": {k: jnp.asarray(v) for k, v in b.items()},
                    "labels": jnp.asarray(labels),
                    "weight": jnp.ones(B, jnp.float64)}

        train_loader = [device_batch(*x) for x in train_hb]
        val_loader = [device_batch(*x) for x in val_hb]

        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64),
            trainer.init_params(train_loader[0]))

        ref = TorchFAME().double()
        sd0 = fame_flax_to_torch(jax.tree_util.tree_map(np.asarray, params))
        ref.load_state_dict(
            {k: torch.tensor(v, dtype=torch.float64) for k, v in sd0.items()},
            strict=False)
        ref.eval()
        opt = torch.optim.AdamW(ref.parameters(), lr=LR, weight_decay=0.01)
        scheduler = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", factor=0.1, patience=1)
        pos_w_t = torch.tensor(POS_W, dtype=torch.float64)

        def torch_forward(b, w_mort):
            tb = {k: torch.tensor(v) for k, v in b.items()}
            return ref(tb, torch.tensor(w_mort, dtype=torch.float64))

        def torch_joint(out, b, labels):
            tl = torch.tensor(labels)
            bce = torch.nn.BCEWithLogitsLoss(pos_weight=pos_w_t)(
                out["fused_logits"], tl)
            leddi = reference_leddi(
                torch.sigmoid(out["fused_logits"]), tl,
                [torch.tensor(b[k]) for k in
                 ("age_ids", "ethnicity_ids", "insurance_ids")])
            l1 = torch.sum(torch.abs(ref.sig_weights))
            return bce + LAMBDA_EDD * (10 * leddi) + LAMBDA_L1 * l1

        # -- the torch replica of the reference epoch loop ----------------
        GROUPS = {"age": np.arange(N_AGE), "ethnicity": np.arange(N_ETH),
                  "insurance": np.arange(N_INS)}
        old_w = {t: np.array([0.33, 0.33, 0.33]) for t in
                 ("mortality", "los", "mechanical_ventilation")}
        ref_hist, ref_dynw = [], []
        best_val, best_sd = float("inf"), None
        for epoch in range(EPOCHS):
            running = 0.0
            for b, labels in train_hb:
                loss = torch_joint(torch_forward(b, old_w["mortality"]),
                                   b, labels)
                opt.zero_grad()
                loss.backward()
                torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=1.0)
                opt.step()
                running += loss.item()
            avg_train = running / len(train_hb)
            with torch.no_grad():
                val = np.mean([
                    torch.nn.BCEWithLogitsLoss(pos_weight=pos_w_t)(
                        torch_forward(b, old_w["mortality"])["fused_logits"],
                        torch.tensor(labels)).item()
                    for b, labels in val_hb])
            scheduler.step(val)
            ref_hist.append((avg_train, float(val), opt.param_groups[0]["lr"]))
            if val < best_val:
                best_val = val
                best_sd = {k: p.detach().clone()
                           for k, p in ref.named_parameters()}
            # dynamic-weight pass over the TRAIN loader (10_FAME.py:315-399)
            with torch.no_grad():
                preds = {t: {m: [] for m in ("demo", "lab", "text")}
                         for t in old_w}
                labs_all, sens_all = {t: [] for t in old_w}, \
                    {a: [] for a in GROUPS}
                for b, labels in train_hb:
                    out = torch_forward(b, old_w["mortality"])
                    for ti, task in enumerate(old_w):
                        for m in ("demo", "lab", "text"):
                            p = torch.sigmoid(
                                out["modality_logits"][m])[:, ti] > 0.5
                            preds[task][m].append(p.numpy().astype(float))
                        labs_all[task].append(labels[:, ti])
                    for a, key in (("age", "age_ids"),
                                   ("ethnicity", "ethnicity_ids"),
                                   ("insurance", "insurance_ids")):
                        sens_all[a].append(b[key])
            new_w = {}
            for task in old_w:
                y = np.concatenate(labs_all[task])
                eddis = []
                for m in ("demo", "lab", "text"):
                    yp = np.concatenate(preds[task][m])
                    per = [_reference_compute_eddi(
                        y, yp, np.concatenate(sens_all[a]), GROUPS[a])
                        for a in ("age", "ethnicity", "insurance")]
                    eddis.append(
                        np.sqrt(per[0]**2 + per[1]**2 + per[2]**2) / 3.0)
                e_max = max(eddis)
                upd = np.clip(1.0 * (e_max - np.asarray(eddis)), -0.05, 0.05)
                w = np.maximum(old_w[task] + upd, 0.1)
                new_w[task] = w / w.sum()
            old_w = new_w
            ref_dynw.append(np.stack([new_w[t] for t in new_w]))

        # -- our fit ------------------------------------------------------
        best_params, history = trainer.fit(params, train_loader, val_loader,
                                           verbose=False)

        assert len(history) == EPOCHS
        for e, (h, (rt, rv, rlr)) in enumerate(zip(history, ref_hist)):
            assert h["train_loss"] == pytest.approx(rt, rel=1e-8), f"epoch {e}"
            assert h["val_loss"] == pytest.approx(rv, rel=1e-8), f"epoch {e}"
            assert h["lr"] == pytest.approx(rlr, rel=1e-12), f"epoch {e}"
        for ti, task in enumerate(("mortality", "los",
                                   "mechanical_ventilation")):
            ours = np.asarray(trainer.tracked_dynamic_weights[task])
            np.testing.assert_allclose(
                ours, np.stack([w[ti] for w in ref_dynw]), atol=1e-12,
                err_msg=f"dynamic-weight trajectory diverged for {task}")

        final_sd = fame_flax_to_torch(
            jax.tree_util.tree_map(np.asarray, best_params))
        compared = 0
        for name, v in final_sd.items():
            if name not in best_sd:
                continue
            # 12 train steps of f64 Adam drift: measured max divergence
            # 4.7e-9 on one element in 393k (fp32 gives 2e-3 after ONE step).
            np.testing.assert_allclose(
                v, best_sd[name].numpy(), atol=1e-8, rtol=1e-5,
                err_msg=f"best-param divergence at {name}")
            compared += 1
        assert compared == len(best_sd)


@pytest.mark.slow
def test_multitask_trainer_trajectory_matches_torch():
    """Five steps of MultitaskTrainer's REAL compiled train_step — the
    baseline-family protocol chain (clip_by_global_norm_torch(1.0) -> plain
    Adam, the legacy-EDDI regime: FocalLoss gamma=2 + pos_weight,
    EDDI.py:346,538-545) — against torch clip_grad_norm_ + Adam, in float64,
    including a mid-run set_lr plateau decay.  Complements the FAME oracle:
    this pins the OTHER trainer and the optax.adam (no-wd) path, where
    zero-gradient params must stay frozen on both sides with no masking
    needed (plain Adam's update is m-hat/(sqrt(v-hat)+eps) = 0)."""
    import optax  # noqa: F401  (documents the transform under test)

    from fairmultimodal_tpu.models.legacy import LegacyEDDIFull
    from fairmultimodal_tpu.train.simple import (
        MultitaskTrainer,
        SimpleTrainConfig,
    )

    rng = np.random.default_rng(53)
    host_batches = []
    for _ in range(2):
        b = _example_batch(rng)
        b = {k: v.astype(np.float64) if v.dtype == np.float32 else v
             for k, v in b.items()}
        labels = rng.integers(0, 2, (B, 2)).astype(np.float64)
        host_batches.append((b, labels))
    LR = 1e-3

    with jax.enable_x64(True):
        model = LegacyEDDIFull(
            num_ages=N_AGE, num_genders=N_GEN, num_ethnicities=N_ETH,
            num_insurances=N_INS, lab_token_count=LABS, hidden_size=H,
            demo_layers=LAYERS, demo_heads=NH, lab_layers=2, lab_heads=NH,
            num_tasks=2, dtype=jnp.float64)
        cfg = SimpleTrainConfig(lr=LR, loss="focal", gamma=2.0,
                                optimizer="adam", grad_clip=1.0,
                                batch_size=B, rng_impl="threefry",
                                deterministic_forward=True)
        trainer = MultitaskTrainer(model, cfg, pos_weight=POS_W2)

        def device_batch(b, labels):
            return {"model_inputs": {k: jnp.asarray(v) for k, v in b.items()},
                    "labels": jnp.asarray(labels),
                    "weight": jnp.ones(B, jnp.float64)}

        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64),
            trainer.init_params(device_batch(*host_batches[0])))
        opt_state = trainer.tx.init(params)

        ref = TorchLegacyEDDI().double()
        sd0 = legacy_eddi_flax_to_torch(
            jax.tree_util.tree_map(np.asarray, params))
        missing, unexpected = ref.load_state_dict(
            {k: torch.tensor(v, dtype=torch.float64) for k, v in sd0.items()},
            strict=False)
        assert not unexpected
        ref.eval()
        opt = torch.optim.Adam(ref.parameters(), lr=LR)
        pw = torch.tensor(POS_W2, dtype=torch.float64)

        def torch_focal(lg, y, pwi):
            bce = torch.nn.functional.binary_cross_entropy_with_logits(
                lg, y, reduction="none", pos_weight=pwi)
            return (((1 - torch.exp(-bce)) ** 2.0) * bce).mean()

        def torch_loss(b, labels):
            logits, _ = ref({k: torch.tensor(v) for k, v in b.items()})
            return sum(torch_focal(logits[:, i], torch.tensor(labels[:, i]),
                                   pw[i]) for i in range(2))

        step_rng = jax.random.key(0, impl="threefry2x32")  # unused: no dropout
        for step in range(5):
            if step == 3:
                opt_state = trainer.set_lr(opt_state, LR * 0.1)
                for g in opt.param_groups:
                    g["lr"] = LR * 0.1
            b, labels = host_batches[step % 2]

            loss_ref = torch_loss(b, labels)
            opt.zero_grad()
            loss_ref.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=1.0)
            opt.step()

            params, opt_state, loss = trainer._train_step(
                params, opt_state, device_batch(b, labels), step_rng)
            assert float(loss) == pytest.approx(
                loss_ref.item(), rel=1e-8), f"step {step}"

        final_sd = legacy_eddi_flax_to_torch(
            jax.tree_util.tree_map(np.asarray, params))
        torch_sd = {k: p.detach().numpy() for k, p in ref.named_parameters()}
        compared = 0
        for name, v in final_sd.items():
            if name not in torch_sd:
                continue
            np.testing.assert_allclose(
                v, torch_sd[name], atol=1e-8, rtol=1e-5,
                err_msg=f"param trajectory diverged at {name} after 5 steps")
            compared += 1
        assert compared == len(torch_sd)
