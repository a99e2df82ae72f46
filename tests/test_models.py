"""Model forward-pass tests on tiny configs (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairmultimodal_tpu.models import (
    BEHRTCombined,
    BEHRTDemo,
    BEHRTLab,
    BertConfig,
    BertEncoderModel,
    FAMEModel,
    SigmoidFusionModel,
    AverageFusionModel,
    TextEncoder,
    encode_note_chunks,
)

TINY_BERT = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=16)


def test_bert_encoder_shapes():
    m = BertEncoderModel(TINY_BERT)
    ids = jnp.zeros((3, 5), jnp.int32)
    mask = jnp.ones((3, 5), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids, mask)["params"]
    out = m.apply({"params": params}, ids, mask)
    assert out.shape == (3, 5, 32)
    cls = m.apply({"params": params}, ids, mask, pool="cls")
    assert cls.shape == (3, 32)


def test_bert_attention_mask_blocks_padding():
    m = BertEncoderModel(TINY_BERT)
    rng = jax.random.PRNGKey(1)
    ids = jax.random.randint(rng, (2, 8), 0, 64)
    params = m.init(rng, ids, jnp.ones((2, 8), jnp.int32))["params"]
    mask = jnp.array([[1, 1, 1, 1, 0, 0, 0, 0]] * 2, jnp.int32)
    base = m.apply({"params": params}, ids, mask, pool="cls")
    # Change padded tokens: CLS must not move.
    ids2 = ids.at[:, 5:].set((ids[:, 5:] + 7) % 64)
    out2 = m.apply({"params": params}, ids2, mask, pool="cls")
    np.testing.assert_allclose(np.asarray(base), np.asarray(out2), atol=1e-5)


def test_behrt_lab_shapes_and_padding_invariance():
    m = BEHRTLab(lab_token_count=10, hidden_size=32, num_heads=2, num_layers=1,
                 pad_to=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10))
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (4, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_behrt_demo_forward():
    m = BEHRTDemo(num_ages=4, num_genders=2, num_ethnicities=5, num_insurances=6,
                  hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                  intermediate_size=64)
    b = 3
    args = (jnp.zeros((b, 1), jnp.int32), jnp.ones((b, 1), jnp.int32),
            jnp.array([0, 1, 9], jnp.int32),  # out-of-range id gets clipped
            jnp.zeros(b, jnp.int32), jnp.zeros(b, jnp.int32), jnp.zeros(b, jnp.int32))
    params = m.init(jax.random.PRNGKey(0), *args)["params"]
    out = m.apply({"params": params}, *args)
    assert out.shape == (b, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_behrt_combined_logits():
    m = BEHRTCombined(lab_token_count=12, hidden_size=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 12))
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    logits = m.apply({"params": params}, x)
    assert logits.shape == (5, 3)
    assert logits.dtype == jnp.float32


def _tiny_fame(b=4, labs=10):
    model = FAMEModel(num_ages=4, num_genders=2, num_ethnicities=5,
                      num_insurances=6, lab_token_count=labs,
                      text_embed_size=32, hidden_size=32, demo_layers=1,
                      demo_heads=2, lab_layers=1, lab_heads=2, fusion_hidden=16)
    batch = {
        "demo_dummy_ids": jnp.zeros((b, 1), jnp.int32),
        "demo_attn_mask": jnp.ones((b, 1), jnp.int32),
        "age_ids": jnp.zeros(b, jnp.int32),
        "gender_ids": jnp.zeros(b, jnp.int32),
        "ethnicity_ids": jnp.zeros(b, jnp.int32),
        "insurance_ids": jnp.zeros(b, jnp.int32),
        "lab_features": jax.random.normal(jax.random.PRNGKey(2), (b, labs)),
        "text_embedding": jax.random.normal(jax.random.PRNGKey(3), (b, 32)),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    return model, params, batch


def test_fame_forward_outputs():
    model, params, batch = _tiny_fame()
    out = model.apply({"params": params}, batch)
    assert out["fused_logits"].shape == (4, 3)
    assert set(out["modality_logits"]) == {"demo", "lab", "text"}
    assert out["sigmoid_weights"].shape == (768,) or out["sigmoid_weights"].shape == (3 * 256,)
    assert out["gated_vector"].shape[0] == 4
    assert np.all(np.isfinite(np.asarray(out["fused_logits"])))


def test_fame_dynamic_weights_change_output_and_mortality_row_rules_all():
    model, params, batch = _tiny_fame()
    w_a = jnp.full((3, 3), 0.33)
    w_b = jnp.array([[0.8, 0.1, 0.1]] * 3)
    out_a = model.apply({"params": params}, batch, dynamic_weights=w_a)
    out_b = model.apply({"params": params}, batch, dynamic_weights=w_b)
    assert not np.allclose(out_a["fused_logits"], out_b["fused_logits"])
    # Only row 0 (mortality) matters in reference-compat mode (10_FAME:283-285).
    w_c = w_b.at[1:].set(0.0)
    out_c = model.apply({"params": params}, batch, dynamic_weights=w_c)
    np.testing.assert_allclose(np.asarray(out_b["fused_logits"]),
                               np.asarray(out_c["fused_logits"]), atol=1e-6)


def test_fame_weight_compat_flag_flips_behavior():
    """reference_weight_compat=False applies each task's OWN weight row;
    True reuses the mortality row for all tasks (10_FAME.py:283-285)."""
    model, params, batch = _tiny_fame()
    fixed = FAMEModel(num_ages=4, num_genders=2, num_ethnicities=5,
                      num_insurances=6, lab_token_count=10,
                      text_embed_size=32, hidden_size=32, demo_layers=1,
                      demo_heads=2, lab_layers=1, lab_heads=2,
                      fusion_hidden=16, reference_weight_compat=False)
    # Same param structure: the non-compat trunk reuses the same modules.
    w_same = jnp.array([[0.5, 0.3, 0.2]] * 3)
    out_c = model.apply({"params": params}, batch, dynamic_weights=w_same)
    out_f = fixed.apply({"params": params}, batch, dynamic_weights=w_same)
    # Identical rows -> the two modes agree exactly (same trunk math).
    np.testing.assert_allclose(np.asarray(out_c["fused_logits"]),
                               np.asarray(out_f["fused_logits"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c["gated_vector"]),
                               np.asarray(out_f["gated_vector"]), atol=1e-5)
    # Distinct rows: compat ignores rows 1-2, fixed mode does not.
    w_diff = jnp.array([[0.5, 0.3, 0.2], [0.1, 0.8, 0.1], [0.2, 0.2, 0.6]])
    out_c2 = model.apply({"params": params}, batch, dynamic_weights=w_diff)
    out_f2 = fixed.apply({"params": params}, batch, dynamic_weights=w_diff)
    # Compat: only row 0 matters, so logits equal the w_same run's.
    np.testing.assert_allclose(np.asarray(out_c2["fused_logits"]),
                               np.asarray(out_c["fused_logits"]), atol=1e-6)
    # Fixed: task 0 still fuses with row 0 (unchanged), tasks 1-2 move.
    f1, f2 = np.asarray(out_f["fused_logits"]), np.asarray(out_f2["fused_logits"])
    np.testing.assert_allclose(f1[:, 0], f2[:, 0], atol=1e-6)
    assert not np.allclose(f1[:, 1], f2[:, 1])
    assert not np.allclose(f1[:, 2], f2[:, 2])


def test_fame_jit_and_grad():
    model, params, batch = _tiny_fame()

    @jax.jit
    def loss_fn(p):
        out = model.apply({"params": p}, batch)
        return jnp.sum(out["fused_logits"] ** 2)

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # text projector must receive gradient; demo bert too
    assert any("text_projector" in "/".join(map(str, p)) for p, _ in
               jax.tree_util.tree_flatten_with_path(g)[0])


def test_sigmoid_and_average_fusion_forward():
    b, h = 3, 32
    demo = jax.random.normal(jax.random.PRNGKey(0), (b, h))
    lab = jax.random.normal(jax.random.PRNGKey(1), (b, h))
    text = jax.random.normal(jax.random.PRNGKey(2), (b, h))
    m = SigmoidFusionModel(proj_dim=8, fusion_hidden=16)
    p = m.init(jax.random.PRNGKey(3), demo, lab, text)["params"]
    out = m.apply({"params": p}, demo, lab, text)
    assert out["logits"].shape == (b, 3)

    m2 = AverageFusionModel(proj_dim=8, fusion_hidden=16)
    p2 = m2.init(jax.random.PRNGKey(4), demo, text)["params"]
    out2 = m2.apply({"params": p2}, demo, text)
    assert out2["logits"].shape == (b, 3)
    assert out2["fused_embedding"].shape == (b, 16)


@pytest.fixture(scope="module")
def tiny_text_encoder():
    cfg = BertConfig(vocab_size=512, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=32)
    return TextEncoder.from_pretrained("definitely/not-downloadable",
                                       fallback_config=cfg)


def test_text_encoder_offline_fallback(tiny_text_encoder):
    ids, mask = tiny_text_encoder.tokenizer.encode("patient stable", max_length=16)
    # Tiny vocabs use compact special-token ids (full-size vocabs keep the
    # HF 101/102 convention); either way CLS + 2 words + SEP.
    assert ids[0] == tiny_text_encoder.tokenizer.cls_token_id
    assert mask.sum() == 4
    out = tiny_text_encoder.encode_ids(jnp.asarray(ids[None]), jnp.asarray(mask[None]))
    assert out.shape == (1, 32)


def test_encode_note_chunks_matches_per_note_loop(tiny_text_encoder):
    enc = tiny_text_encoder
    chunks = [
        ["patient stable", "sedated ventilator weaning"],
        [],                              # -> zero vector (10_FAME:153-154)
        ["afebrile lungs clear"],
        ["sepsis", "pressors", "lasix"],
    ]
    got = encode_note_chunks(enc, chunks, max_length=16, batch_size=3)
    assert got.shape == (4, 32)
    np.testing.assert_array_equal(got[1], 0.0)
    # Oracle: the reference's one-note-at-a-time loop.
    for pid, notes in enumerate(chunks):
        if not notes:
            continue
        embs = []
        for note in notes:
            ids, mask = enc.tokenizer.encode(note, max_length=16)
            embs.append(np.asarray(enc.encode_ids(jnp.asarray(ids[None]),
                                                  jnp.asarray(mask[None])))[0])
        np.testing.assert_allclose(got[pid], np.mean(embs, axis=0), atol=1e-4)


def test_encode_note_chunks_max_aggregation(tiny_text_encoder):
    chunks = [["patient stable", "sepsis pressors"]]
    got = encode_note_chunks(tiny_text_encoder, chunks, max_length=16,
                             batch_size=2, aggregation="max")
    ids1, m1 = tiny_text_encoder.tokenizer.encode("patient stable", 16)
    ids2, m2 = tiny_text_encoder.tokenizer.encode("sepsis pressors", 16)
    e1 = np.asarray(tiny_text_encoder.encode_ids(jnp.asarray(ids1[None]), jnp.asarray(m1[None])))[0]
    e2 = np.asarray(tiny_text_encoder.encode_ids(jnp.asarray(ids2[None]), jnp.asarray(m2[None])))[0]
    np.testing.assert_allclose(got[0], np.maximum(e1, e2), atol=1e-4)


def test_behrt_demo_broadcast_guard_poisons_per_row_tokens():
    """broadcast_dummy=True is exact only for row-constant dummy inputs; the
    guard must poison (NaN) outputs for per-row token inputs instead of
    returning silently wrong values."""
    from fairmultimodal_tpu.models.behrt import BEHRTDemo

    m = BEHRTDemo(num_ages=4, num_genders=2, num_ethnicities=5,
                  num_insurances=6, hidden_size=32, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=64)
    b = 4
    const = {
        "dummy_ids": jnp.zeros((b, 1), jnp.int32),
        "attn_mask": jnp.ones((b, 1), jnp.int32),
    }
    ids = jnp.zeros(b, jnp.int32)
    params = m.init(jax.random.PRNGKey(0), const["dummy_ids"],
                    const["attn_mask"], ids, ids, ids, ids)["params"]
    ok = m.apply({"params": params}, const["dummy_ids"], const["attn_mask"],
                 ids, ids, ids, ids)
    assert np.isfinite(np.asarray(ok)).all()
    per_row = jnp.arange(b, dtype=jnp.int32)[:, None] % 2
    bad = m.apply({"params": params}, per_row, const["attn_mask"],
                  ids, ids, ids, ids)
    assert np.isnan(np.asarray(bad)).all()


def test_bert_fused_megakernel_path_matches_xla():
    """BertEncoderModel(fused=True): two Pallas calls per layer (attention
    megakernel + gelu FFN, both with folded eps-1e-12 LN epilogues) against
    the XLA layer path, same params (the trees are bit-identical by
    construction).  Run under highest matmul precision: this CPU's default
    fp32 gemm is bf16 fastmath, which would otherwise dominate the
    comparison (see tests/test_fused_ffn.py note)."""
    import jax
    from fairmultimodal_tpu.models.bert import BertConfig, BertEncoderModel

    cfg = BertConfig(vocab_size=100, hidden_size=128, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=512,
                     max_position_embeddings=256)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 100, (2, 256)), jnp.int32)
    mask = jnp.asarray((np.arange(256)[None, :]
                        < np.array([200, 256])[:, None]).astype(np.int32))

    m_x = BertEncoderModel(cfg, fused=False)
    params = m_x.init(jax.random.PRNGKey(0), ids, mask)["params"]
    params_f = BertEncoderModel(cfg, fused=True).init(
        jax.random.PRNGKey(0), ids, mask)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, params_f)

    with jax.default_matmul_precision("highest"):
        out_x = m_x.apply({"params": params}, ids, mask, deterministic=True)
        out_f = BertEncoderModel(cfg, fused=True).apply(
            {"params": params}, ids, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=2e-4, atol=2e-4)
