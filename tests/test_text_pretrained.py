"""End-to-end coverage of the PRODUCTION HF-weight path, fully offline.

``TextEncoder.from_pretrained`` is the flagship's real-data day-1 path
(the reference loads emilyalsentzer/Bio_ClinicalBERT at 10_FAME.py:725-731
and 02_BioClinicalBERT.py:419-421).  No network is needed to test it: a
random-init ``transformers.BertModel`` + ``BertTokenizerFast`` saved with
``save_pretrained(tmpdir)`` exercises the REAL ``load_hf_bert_params``
converter, the REAL ``_HFTokenizerAdapter``, and the config derivation —
the paths a fallback-based test can never touch.

Pinned here:
- CLS embeddings through the production loader match the torch model.
- The module config is DERIVED from the checkpoint (a non-bert-base
  geometry would shape-mismatch under the old hardcoded
  ``bio_clinical_bert_config()``).
- The cache fingerprint is content-addressed: a changed checkpoint under
  the SAME name/path misses the cache instead of serving stale embeddings.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from fairmultimodal_tpu.models.text import (  # noqa: E402
    TextEncoder,
    encode_note_chunks,
)

# Deliberately NOT bert-base geometry: catches any hardcoded
# bio_clinical_bert_config() on the success path.
_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
          "the", "patient", "was", "intubated", "on", "arrival",
          "stable", "sepsis", "lactate", "elevated", "##s", "a", "b",
          "c", "notes", "chest", "pain", "no", "acute", "distress"]


def _save_checkpoint(tmpdir, seed: int):
    """Write a small random BertModel + tokenizer like a real HF snapshot."""
    cfg = transformers.BertConfig(
        vocab_size=len(_VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48, type_vocab_size=2)
    torch.manual_seed(seed)
    model = transformers.BertModel(cfg)
    model.eval()
    model.save_pretrained(tmpdir)
    vocab_file = f"{tmpdir}/vocab.txt"
    with open(vocab_file, "w") as f:
        f.write("\n".join(_VOCAB) + "\n")
    tok = transformers.BertTokenizerFast(vocab_file=vocab_file,
                                         do_lower_case=True)
    tok.save_pretrained(tmpdir)
    return model, tok


def test_from_pretrained_local_checkpoint_end_to_end(tmp_path):
    ckpt = str(tmp_path / "snapshot")
    model, tok = _save_checkpoint(ckpt, seed=0)

    enc = TextEncoder.from_pretrained(ckpt, require_weights=True)
    assert not enc.is_fallback
    # Config must be derived from the checkpoint, not bert-base.
    assert enc.config.hidden_size == 32
    assert enc.config.num_hidden_layers == 2
    assert enc.config.vocab_size == len(_VOCAB)

    notes = [["the patient was intubated on arrival",
              "sepsis lactate elevated"],
             [],                                      # zero-note patient
             ["chest pain no acute distress"]]
    max_len = 16
    ours = encode_note_chunks(enc, notes, max_length=max_len, batch_size=4)
    assert ours.shape == (3, 32)
    np.testing.assert_array_equal(ours[1], np.zeros(32, np.float32))

    # Torch oracle: same HF tokenizer + torch BertModel, CLS, mean-agg.
    for pid, chunks in enumerate(notes):
        if not chunks:
            continue
        batch = tok(chunks, max_length=max_len, padding="max_length",
                    truncation=True, return_tensors="pt")
        with torch.no_grad():
            cls = model(**batch).last_hidden_state[:, 0, :].numpy()
        np.testing.assert_allclose(ours[pid], cls.mean(axis=0),
                                   atol=2e-5, rtol=2e-5)


def test_hf_tokenizer_adapter_batch_matches_single(tmp_path):
    ckpt = str(tmp_path / "snapshot")
    _save_checkpoint(ckpt, seed=0)
    enc = TextEncoder.from_pretrained(ckpt, require_weights=True)
    texts = ["the patient was stable", "sepsis", "", "notes notes notes"]
    ids_b, mask_b = enc.tokenizer.encode_batch(texts, max_length=12)
    for i, t in enumerate(texts):
        ids_1, mask_1 = enc.tokenizer.encode(t, max_length=12)
        np.testing.assert_array_equal(ids_b[i], ids_1)
        np.testing.assert_array_equal(mask_b[i], mask_1)


def test_changed_checkpoint_same_name_misses_cache(tmp_path):
    """Content-addressed fingerprint: retraining/revising the checkpoint
    under the same path must invalidate cached embeddings."""
    ckpt = str(tmp_path / "snapshot")
    cache = str(tmp_path / "cache")
    notes = [["the patient was stable"]]

    _save_checkpoint(ckpt, seed=0)
    enc_a = TextEncoder.from_pretrained(ckpt, require_weights=True)
    emb_a = encode_note_chunks(enc_a, notes, max_length=16, cache_dir=cache)

    # Overwrite the SAME directory with different weights (new revision).
    _save_checkpoint(ckpt, seed=1)
    enc_b = TextEncoder.from_pretrained(ckpt, require_weights=True)
    assert enc_a.fingerprint != enc_b.fingerprint
    emb_b = encode_note_chunks(enc_b, notes, max_length=16, cache_dir=cache)
    assert not np.allclose(emb_a, emb_b), \
        "stale cache served after checkpoint change"

    # Same checkpoint again -> cache HIT (bit-identical round-trip).
    enc_b2 = TextEncoder.from_pretrained(ckpt, require_weights=True)
    assert enc_b2.fingerprint == enc_b.fingerprint
    emb_b2 = encode_note_chunks(enc_b2, notes, max_length=16,
                                cache_dir=cache)
    np.testing.assert_array_equal(emb_b, emb_b2)


def test_from_pretrained_dtype_fingerprint(tmp_path):
    """dtype is part of the cache identity (bf16 vs f32 embeddings differ)."""
    ckpt = str(tmp_path / "snapshot")
    _save_checkpoint(ckpt, seed=0)
    f32 = TextEncoder.from_pretrained(ckpt, require_weights=True)
    bf16 = TextEncoder.from_pretrained(ckpt, require_weights=True,
                                       dtype=jnp.bfloat16)
    assert f32.fingerprint != bf16.fingerprint
