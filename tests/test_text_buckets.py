"""Length-bucketed text encoding (encode_note_chunks ``buckets``).

Chunks route to the smallest bucket holding their token count and are
encoded at that padded length; CLS embeddings are mask-invariant, so
results must match the single-``max_length``-shape path to float tolerance
while skipping the pad compute (quadratic in padded length).
"""

import numpy as np
import pytest

from fairmultimodal_tpu.models.bert import BertConfig
from fairmultimodal_tpu.models.text import (
    HashingTokenizer,
    TextEncoder,
    encode_note_chunks,
)

_CFG = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=64,
                  max_position_embeddings=64)


@pytest.fixture(scope="module")
def encoder():
    return TextEncoder.from_pretrained("no/such-model", fallback_config=_CFG)


def _mixed_chunks():
    # token counts straddling the {8, 16, 32} bucket edges (incl. exactly-at)
    return [
        ["one two"],                                   # 4 tokens -> 8
        ["w " * 6],                                    # 8 tokens  -> 8 (edge)
        [" ".join(f"t{i}" for i in range(12))],        # 14 -> 16
        [],                                            # zero vector
        [" ".join(f"u{i}" for i in range(25)), "short note"],  # 27 -> 32, 4 -> 8
        [" ".join(f"v{i}" for i in range(40))],        # truncated -> 32
    ]


def test_bucketed_matches_single_shape(encoder):
    chunks = _mixed_chunks()
    ref = encode_note_chunks(encoder, chunks, max_length=32, batch_size=3,
                             buckets=[32])
    got = encode_note_chunks(encoder, chunks, max_length=32, batch_size=3,
                             buckets=[8, 16, 32])
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got[3], 0.0)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_progress_counts_all_chunks_once(encoder):
    seen = []
    encode_note_chunks(encoder, _mixed_chunks(), max_length=32, batch_size=2,
                       buckets=[8, 16, 32],
                       progress=lambda done, n: seen.append((done, n)))
    assert seen[-1][0] == seen[-1][1] == 6   # 6 non-empty chunks
    assert [d for d, _ in seen] == sorted(d for d, _ in seen)


def test_auto_buckets_and_env_off(encoder, monkeypatch):
    chunks = _mixed_chunks()
    # auto (None) on a small max_length collapses to a single bucket ->
    # identical to the explicit single-shape call
    ref = encode_note_chunks(encoder, chunks, max_length=32, batch_size=3,
                             buckets=[32])
    auto = encode_note_chunks(encoder, chunks, max_length=32, batch_size=3)
    np.testing.assert_allclose(auto, ref, rtol=1e-5, atol=1e-6)
    monkeypatch.setenv("FMTPU_TEXT_BUCKETS", "0")
    off = encode_note_chunks(encoder, chunks, max_length=32, batch_size=3)
    np.testing.assert_array_equal(off, ref)
    monkeypatch.setenv("FMTPU_TEXT_BUCKETS", "8,16,32")
    env = encode_note_chunks(encoder, chunks, max_length=32, batch_size=3)
    np.testing.assert_allclose(env, ref, rtol=1e-5, atol=1e-6)


def test_hashing_encode_batch_matches_per_text():
    tok = HashingTokenizer(28996)
    texts = ["alpha beta gamma", "x", " ".join(f"w{i}" for i in range(40)),
             "alpha beta gamma"]          # repeat exercises the word memo
    bids, bmask = tok.encode_batch(texts, max_length=16)
    for i, t in enumerate(texts):
        ids, mask = tok.encode(t, max_length=16)
        np.testing.assert_array_equal(bids[i], ids)
        np.testing.assert_array_equal(bmask[i], mask)


def test_buckets_clip_to_max_length(encoder):
    # oversized bucket entries clip; max_length is always present
    got = encode_note_chunks(encoder, _mixed_chunks(), max_length=16,
                             batch_size=4, buckets=[8, 512])
    ref = encode_note_chunks(encoder, _mixed_chunks(), max_length=16,
                             batch_size=4, buckets=[16])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
