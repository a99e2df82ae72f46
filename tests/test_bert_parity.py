"""Numerical parity of the Flax BERT against torch/HF ``BertModel``.

No network needed: a randomly initialized torch BertModel is constructed
from a config, its state_dict converted through
``models.bert.load_hf_bert_params``'s layout, and both models evaluated on
the same inputs.  This validates the exact weight-conversion path used for
BioClinicalBERT (emilyalsentzer checkpoints share the architecture)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fairmultimodal_tpu.models.bert import BertConfig, BertEncoderModel  # noqa: E402


def _convert_state_dict(sd, num_layers):
    """torch state_dict -> Flax param tree (mirrors load_hf_bert_params)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params = {
        "embeddings": {
            "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
            "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"]},
            "token_type_embeddings": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
            "layer_norm": ln("embeddings.LayerNorm"),
        }
    }
    for i in range(num_layers):
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
    return params


@pytest.mark.slow
def test_flax_bert_matches_torch_bert():
    hf_cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48, type_vocab_size=2)
    torch.manual_seed(0)
    torch_model = transformers.BertModel(hf_cfg)
    torch_model.eval()

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=48, type_vocab_size=2)
    flax_model = BertEncoderModel(cfg)
    params = _convert_state_dict(torch_model.state_dict(), 2)

    rng = np.random.default_rng(0)
    B, S = 3, 16
    ids = rng.integers(0, 120, (B, S)).astype(np.int64)
    mask = np.ones((B, S), np.int64)
    mask[0, 10:] = 0
    mask[2, 5:] = 0

    with torch.no_grad():
        ref = torch_model(input_ids=torch.tensor(ids),
                          attention_mask=torch.tensor(mask)
                          ).last_hidden_state.numpy()

    out = flax_model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                           jnp.asarray(mask, jnp.int32), deterministic=True)
    out = np.asarray(out)

    # Compare attended positions only — HF computes (meaningless) hidden
    # states at masked positions too, but downstream consumers (CLS pooling,
    # masked mean) never read them.
    for b in range(B):
        live = mask[b] > 0
        np.testing.assert_allclose(out[b, live], ref[b, live],
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_cls_pooling_matches_torch():
    hf_cfg = transformers.BertConfig(
        vocab_size=60, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, type_vocab_size=2)
    torch.manual_seed(1)
    torch_model = transformers.BertModel(hf_cfg)
    torch_model.eval()

    cfg = BertConfig(vocab_size=60, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=32, type_vocab_size=2)
    flax_model = BertEncoderModel(cfg)
    params = _convert_state_dict(torch_model.state_dict(), 1)

    ids = np.array([[2, 7, 9, 11]], np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref_cls = torch_model(input_ids=torch.tensor(ids),
                              attention_mask=torch.tensor(mask)
                              ).last_hidden_state[:, 0, :].numpy()
    cls = flax_model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                           jnp.asarray(mask, jnp.int32), deterministic=True,
                           pool="cls")
    np.testing.assert_allclose(np.asarray(cls), ref_cls, atol=2e-5, rtol=2e-5)
