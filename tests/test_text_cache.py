"""Persistent text-embedding cache (--text_cache / FMTPU_TEXT_CACHE).

The frozen-encoder precompute is a pure function of (weights, note text,
settings); ``encode_note_chunks`` stores it content-addressed and reuses it
across runs.  These tests pin the round trip, the key sensitivity, and the
env-var default.
"""

import glob
import os

import numpy as np
import pytest

from fairmultimodal_tpu.models.bert import BertConfig
from fairmultimodal_tpu.models.text import TextEncoder, encode_note_chunks

_TINY = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                   num_attention_heads=2, intermediate_size=64,
                   max_position_embeddings=64)


@pytest.fixture(scope="module")
def encoder():
    return TextEncoder.from_pretrained("no/such-model", fallback_config=_TINY)


_CHUNKS = [["alpha beta gamma", "delta epsilon"], [], ["zeta eta"]]


def _encode(encoder, cache_dir, chunks=_CHUNKS, **kw):
    return encode_note_chunks(encoder, chunks, max_length=16, batch_size=4,
                              cache_dir=cache_dir, **kw)


def test_cache_round_trip_and_no_reencode(encoder, tmp_path, monkeypatch):
    cache = str(tmp_path / "cache")
    first = _encode(encoder, cache)
    files = glob.glob(os.path.join(cache, "text_emb_*.npz"))
    assert len(files) == 1
    # Second call must come from the cache: poison the encode path.
    monkeypatch.setattr(
        encoder, "encode_ids",
        lambda *a, **k: pytest.fail("cache miss: encode_ids called"))
    second = _encode(encoder, cache)
    np.testing.assert_array_equal(first, second)
    assert second.dtype == np.float32


def test_cache_key_sensitivity(encoder, tmp_path):
    cache = str(tmp_path / "cache")
    _encode(encoder, cache)
    # changed note text, changed max_length, changed aggregation -> new keys
    _encode(encoder, cache, chunks=[["alpha beta CHANGED"], [], ["zeta eta"]])
    encode_note_chunks(encoder, _CHUNKS, max_length=8, batch_size=4,
                       cache_dir=cache)
    _encode(encoder, cache, aggregation="max")
    # different encoder identity (fallback seed) -> new key
    other = TextEncoder.from_pretrained("no/such-model",
                                        fallback_config=_TINY, seed=7)
    _encode(other, cache)
    assert len(glob.glob(os.path.join(cache, "text_emb_*.npz"))) == 5


def test_cache_fingerprint_without_from_pretrained(encoder, tmp_path):
    # Manual construction has no fingerprint attr -> weight-sample digest.
    manual = TextEncoder(encoder.config, encoder.params, encoder.tokenizer)
    assert manual.fingerprint is None
    fp = manual.cache_fingerprint()
    assert fp.startswith("params:") and manual.cache_fingerprint() == fp
    cache = str(tmp_path / "cache")
    a = _encode(manual, cache)
    b = _encode(manual, cache)
    np.testing.assert_array_equal(a, b)


def test_env_var_default(encoder, tmp_path, monkeypatch):
    cache = str(tmp_path / "env_cache")
    monkeypatch.setenv("FMTPU_TEXT_CACHE", cache)
    out = encode_note_chunks(encoder, _CHUNKS, max_length=16, batch_size=4)
    assert glob.glob(os.path.join(cache, "text_emb_*.npz"))
    monkeypatch.setattr(
        encoder, "encode_ids",
        lambda *a, **k: pytest.fail("cache miss: encode_ids called"))
    again = encode_note_chunks(encoder, _CHUNKS, max_length=16, batch_size=4)
    np.testing.assert_array_equal(out, again)


def test_all_empty_cohort_cached(encoder, tmp_path):
    cache = str(tmp_path / "cache")
    out = _encode(encoder, cache, chunks=[[], [], []])
    np.testing.assert_array_equal(out, np.zeros_like(out))
    assert glob.glob(os.path.join(cache, "text_emb_*.npz"))
