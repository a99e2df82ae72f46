"""Text modality: BioClinicalBERT note encoding, batched the TPU way.

The reference encodes every note chunk one at a time with batch size 1 and a
host sync per note (``10_FAME.py:144-173`` — its hottest loop).  Here all
(patient, chunk) pairs are flattened into one padded ``[N_chunks, max_len]``
int32 array, encoded in large fixed-shape batches on device, and mean-reduced
back to patients with a segment-sum — patients with zero notes get the zero
vector exactly like the reference (``10_FAME.py:153-154``).

Weights: :meth:`TextEncoder.from_pretrained` converts the HF torch checkpoint
when it is available locally; otherwise (no-egress CI) it deterministically
random-initializes the same architecture — embedding *quality* then differs
but every shape/dtype contract holds, which is what the tests pin down.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fairmultimodal_tpu.models.bert import (
    BertConfig,
    BertEncoderModel,
    bio_clinical_bert_config,
    load_hf_bert_params,
)

__all__ = ["TextEncoder", "encode_note_chunks", "HashingTokenizer"]


def _text_cache_key(encoder: "TextEncoder", note_chunks, max_length: int,
                    aggregation: str, buckets: Sequence[int]) -> str:
    """Content-addressed key: encoder identity x cohort notes x settings.

    Buckets are part of the key: bucketed padding is mask-invariant in
    exact arithmetic but shifts matmul tiling by last-ulp amounts, and the
    cache must stay bit-stable per configuration."""
    h = hashlib.blake2b(digest_size=16)
    h.update(encoder.cache_fingerprint().encode())
    h.update(f"|L{max_length}|{aggregation}|n{len(note_chunks)}"
             f"|b{','.join(map(str, buckets))}".encode())
    for chunks in note_chunks:
        h.update(b"\x00")                      # patient boundary
        for c in chunks:
            if isinstance(c, str):
                h.update(c.encode("utf-8", "replace"))
                h.update(b"\x01")
    return h.hexdigest()


def _text_cache_store(cache_path: Optional[str], embeddings: np.ndarray
                      ) -> None:
    if cache_path is None:
        return
    os.makedirs(os.path.dirname(cache_path), exist_ok=True)
    # Unique tmp name: concurrent processes sharing a cache dir must not
    # interleave writes into one tmp file (os.replace of a torn file would
    # poison the cache); failed writes are removed instead of left behind.
    tmp = f"{cache_path}.tmp.{os.getpid()}"
    try:
        np.savez_compressed(tmp, embeddings=embeddings)
        # np.savez appends .npz to paths without the suffix.
        src = tmp if os.path.exists(tmp) else tmp + ".npz"
        os.replace(src, cache_path)
    except BaseException:
        for p in (tmp, tmp + ".npz"):
            try:
                os.remove(p)
            except OSError:
                pass
        raise


def _params_sample_digest(params) -> str:
    """Digest of a deterministic sample of the param tree.

    Slices BEFORE device_get so each leaf costs one small transfer (a full
    tree pull is ~33 ms/leaf over the axon tunnel).  Four leaves sorted by
    path cover the embedding tables + first-layer weights — any retrained /
    revised checkpoint differs there."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    h = hashlib.blake2b(digest_size=16)
    for path, leaf in sorted(leaves, key=lambda kv: str(kv[0]))[:4]:
        h.update(str(path).encode())
        h.update(str(jnp.shape(leaf)).encode())
        sample = np.asarray(jax.device_get(jnp.ravel(leaf)[:256]),
                            np.float32)
        h.update(sample.tobytes())
    return h.hexdigest()


class HashingTokenizer:
    """Deterministic offline stand-in for a WordPiece tokenizer.

    Maps whitespace tokens to stable ids via blake2 hashing.  Used when the
    HF vocab is unavailable (tests, air-gapped machines); shares the CLS=101
    / SEP=102 / PAD=0 convention so downstream code is tokenizer-agnostic.
    """

    pad_token_id = 0

    def __init__(self, vocab_size: int = 28996):
        self.vocab_size = vocab_size
        # HF-convention ids for real-sized vocabs; compact ids for tiny test
        # vocabs (any base >= vocab would produce out-of-range gathers).
        self.cls_token_id = 101 if vocab_size > 1000 else 1
        self.sep_token_id = 102 if vocab_size > 1000 else 2
        self._base = 1000 if vocab_size > 1000 else 3
        # Word-id memo: cohorts repeat a bounded vocabulary millions of
        # times, and the per-word blake2s dominates host tokenization time
        # in the bucketed encode (the device work is ~5 s at reference
        # scale; see CLAUDE.md text-encode log).
        self._memo: dict = {}

    def _tok(self, word: str) -> int:
        t = self._memo.get(word)
        if t is None:
            h = int.from_bytes(
                hashlib.blake2s(word.encode(), digest_size=4).digest(),
                "little")
            t = self._base + (h % (self.vocab_size - self._base))
            self._memo[word] = t
        return t

    def encode(self, text: str, max_length: int = 512) -> Tuple[np.ndarray, np.ndarray]:
        ids = [self.cls_token_id] + [self._tok(w) for w in text.split()][: max_length - 2]
        ids.append(self.sep_token_id)
        attn = [1] * len(ids)
        pad = max_length - len(ids)
        return (np.array(ids + [0] * pad, np.int32),
                np.array(attn + [0] * pad, np.int32))

    def encode_batch(self, texts: Sequence[str], max_length: int = 512
                     ) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, text in enumerate(texts):
            row = [self._tok(w) for w in text.split()][: max_length - 2]
            k = len(row) + 2
            ids[i, 0] = self.cls_token_id
            ids[i, 1:k - 1] = row
            ids[i, k - 1] = self.sep_token_id
            mask[i, :k] = 1
        return ids, mask


class _HFTokenizerAdapter:
    def __init__(self, hf_tokenizer):
        self.t = hf_tokenizer

    def encode(self, text: str, max_length: int = 512):
        out = self.t(text, max_length=max_length, padding="max_length",
                     truncation=True, return_tensors="np")
        return (out["input_ids"][0].astype(np.int32),
                out["attention_mask"][0].astype(np.int32))

    def encode_batch(self, texts: Sequence[str], max_length: int = 512):
        # One call into the (Rust-backed) fast tokenizer for the whole
        # cohort instead of a Python call per chunk.
        out = self.t(list(texts), max_length=max_length,
                     padding="max_length", truncation=True,
                     return_tensors="np")
        return (out["input_ids"].astype(np.int32),
                out["attention_mask"].astype(np.int32))


class TextEncoder:
    """Frozen BERT text encoder producing CLS embeddings."""

    def __init__(self, config: BertConfig, params, tokenizer, dtype=jnp.float32,
                 mesh=None):
        self.config = config
        # The text encoder is FROZEN everywhere in the reference (the
        # BioClinicalBERT embeddings are precomputed, 10_FAME.py:725-731), so
        # the encode path uses the kernels' inference variants that skip the
        # backward-only residual streams (ops/fused_*: *_infer).
        self.module = BertEncoderModel(config, dtype=dtype, infer_fast=True)
        self.params = params
        self.tokenizer = tokenizer
        self.mesh = mesh

        def apply_fn(p, ids, mask):
            return self.module.apply({"params": p}, ids, mask,
                                     deterministic=True, pool="cls")

        dp_size = dict(mesh.shape).get("data", 1) if mesh is not None else 1
        if mesh is not None and dp_size > 1 and \
                dict(mesh.shape).get("model", 1) == 1:
            # Pure-DP mesh: shard chunk rows over the data axis via shard_map
            # (manual SPMD), the same mode that carries the Pallas megakernels
            # on real multi-chip TPU (GSPMD can't partition Mosaic custom
            # calls — see train/loop.py).  Each shard encodes its rows
            # independently (no collectives: per-chunk forward only); results
            # match single-device to last-ulp (per-shard matmul tiling
            # reassociates — pinned in tests/test_parallel_dp.py).
            from jax.sharding import PartitionSpec as P

            self._dp_size = dp_size
            self._encode_batch = jax.jit(jax.shard_map(
                apply_fn, mesh=mesh,
                in_specs=(P(), P("data"), P("data")), out_specs=P("data")))
        else:
            self._dp_size = 1
            self._encode_batch = jax.jit(apply_fn)

    #: True when this encoder fell back to random init + HashingTokenizer
    #: (set by :meth:`from_pretrained`; manual constructions leave it False).
    is_fallback: bool = False

    #: Stable identity string for the embedding cache (set by
    #: :meth:`from_pretrained`); manual constructions leave it None and the
    #: cache falls back to hashing a sample of the weights.
    fingerprint: Optional[str] = None

    def cache_fingerprint(self) -> str:
        """Identity of (weights, geometry) for keying cached embeddings."""
        if self.fingerprint is not None:
            return self.fingerprint
        # Manually constructed encoder: digest a deterministic sample of the
        # params.
        return (f"params:{_params_sample_digest(self.params)}"
                f"|h{self.config.hidden_size}")

    @classmethod
    def from_pretrained(
        cls,
        model_name: str = "emilyalsentzer/Bio_ClinicalBERT",
        dtype=jnp.float32,
        fallback_config: Optional[BertConfig] = None,
        seed: int = 0,
        require_weights: bool = False,
        mesh=None,
    ) -> "TextEncoder":
        """HF weights + tokenizer when reachable, deterministic random init
        with a hashing tokenizer otherwise.

        The fallback keeps every shape/dtype contract but its embedding
        *quality* is garbage for real data, so it warns loudly (tests pass an
        explicit ``fallback_config`` and get no warning).  With
        ``require_weights=True`` the fallback is fatal instead — use it for
        any real-data run (the reference's text modality is the *pretrained*
        frozen Bio_ClinicalBERT, 10_FAME.py:725-731; random init silently
        breaks AUROC/EDDI parity).
        """
        try:
            # Config is DERIVED from the loaded checkpoint (geometry, LN eps,
            # dropout) — a hardcoded bio_clinical_bert_config() would shape-
            # mismatch any non-bert-base checkpoint loaded under this path.
            params, config = load_hf_bert_params(model_name,
                                                 return_config=True)
            import transformers

            tok = _HFTokenizerAdapter(
                transformers.AutoTokenizer.from_pretrained(model_name))
            fallback = False
        except Exception as e:
            if require_weights:
                raise RuntimeError(
                    f"HF weights for {model_name!r} are required "
                    f"(--require_hf_weights) but could not be loaded: {e}"
                ) from e
            if fallback_config is None:
                import warnings

                warnings.warn(
                    f"HF weights for {model_name!r} unavailable ({e}); using "
                    f"DETERMINISTIC RANDOM INIT + HashingTokenizer. Text "
                    f"embeddings will be meaningless on real data — pass "
                    f"require_weights=True (--require_hf_weights) to make "
                    f"this fatal.", stacklevel=2)
            from fairmultimodal_tpu.utils.rng import threefry_key

            config = fallback_config or bio_clinical_bert_config()
            module = BertEncoderModel(config, dtype=dtype)
            dummy = jnp.zeros((1, 8), jnp.int32)
            # Typed threefry key: a raw PRNGKey would follow the process-global
            # prng impl, which the trainers flip to unsafe_rbg (utils/rng.py) —
            # fallback init must be identical regardless of what ran earlier.
            params = module.init(threefry_key(seed), dummy,
                                 jnp.ones((1, 8), jnp.int32))["params"]
            tok = HashingTokenizer(config.vocab_size)
            fallback = True
        enc = cls(config, params, tok, dtype=dtype, mesh=mesh)
        enc.is_fallback = fallback
        # HF path: content-address the fingerprint with a weight-sample
        # digest — "{model_name}|hf" alone would silently serve stale cached
        # embeddings if the checkpoint under the same name changed (revision
        # update, refreshed local dir).  The fallback path is already fully
        # determined by (seed, geometry).
        weight_id = (f"fallback:{seed}" if fallback
                     else f"hf:{_params_sample_digest(params)}")
        enc.fingerprint = (
            f"{model_name}|{weight_id}"
            f"|{np.dtype(jnp.dtype(dtype)).name}"
            f"|h{config.hidden_size}L{config.num_hidden_layers}"
            f"v{config.vocab_size}")
        return enc

    def encode_ids(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        """[N, S] -> [N, H] CLS embeddings."""
        return self._encode_batch(self.params, input_ids, attention_mask)


def encode_note_chunks(
    encoder: TextEncoder,
    note_chunks: Sequence[List[str]],
    max_length: int = 512,
    batch_size: int = 32,
    aggregation: str = "mean",
    progress: Optional[Callable[[int, int], None]] = None,
    cache_dir: Optional[str] = None,
    buckets: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Per-patient aggregated text embeddings, batched.

    Replaces ``apply_bioclinicalbert_on_patient_notes`` (10_FAME.py:144-173):
    same math — per-chunk CLS embeddings aggregated (mean or max) per patient,
    zero vector for patients without notes — but all chunks are encoded in
    fixed-shape device batches instead of one Python-loop inference per note.

    Args:
      encoder: frozen text encoder.
      note_chunks: per-patient list of chunk strings (possibly empty).
      max_length: tokenizer truncation length (512 for 02/05/10; 128 for
        03/04/06/07/08 — pass accordingly).
      batch_size: chunk-level device batch size (pad to fixed shape).
      aggregation: "mean" or "max" over a patient's chunks.
      cache_dir: persistent embedding cache (defaults to the
        ``FMTPU_TEXT_CACHE`` env var / ``--text_cache`` CLI flag).  The
        encoder is frozen, so embeddings are a pure function of (weights,
        notes, settings): results are stored content-addressed by a
        blake2b key over the encoder fingerprint, every chunk string, and
        (max_length, aggregation), and reused across runs — at reference
        scale the precompute is ~377 s of a ~1100 s FAME run and the
        reference redoes it every invocation.  Batch size and mesh layout
        are excluded from the key: chunks are encoded row-independently in
        fixed shapes, so they do not change the result (beyond last-ulp
        matmul tiling reassociation under a mesh).
      buckets: sequence-length buckets for the padded encode.  Default
        (None) auto-selects {64, 128, 256, 512} clipped to ``max_length``:
        each chunk is routed to the smallest bucket holding its token
        count and encoded at that padded length — a small fixed set of
        compiled shapes instead of one.  CLS embeddings are mask-invariant,
        so bucketing does not change results beyond last-ulp matmul
        tiling; what it removes is pad compute (attention is quadratic in
        padded length — a 40-token note padded to 512 pays ~64x the
        attention FLOPs it needs; real MIMIC cohorts average one short
        final chunk per patient, synthetic cohorts are nearly all-pad).
        ``FMTPU_TEXT_BUCKETS`` overrides: ``0`` disables (single
        ``max_length`` shape), or a comma list like ``128,512``.

    Returns [n_patients, hidden] float32.
    """
    if buckets is None:
        env = os.environ.get("FMTPU_TEXT_BUCKETS", "").strip()
        if env in ("0", "off"):
            buckets = [max_length]
        elif env:
            buckets = [int(b) for b in env.split(",")]
        else:
            buckets = [b for b in (64, 128, 256) if b < max_length]
            buckets.append(max_length)
    buckets = sorted({min(int(b), max_length) for b in buckets} | {max_length})

    if cache_dir is None:
        cache_dir = os.environ.get("FMTPU_TEXT_CACHE") or None
    cache_path = None
    if cache_dir:
        key = _text_cache_key(encoder, note_chunks, max_length, aggregation,
                              buckets)
        cache_path = os.path.join(cache_dir, f"text_emb_{key}.npz")
        if os.path.exists(cache_path):
            with np.load(cache_path) as z:
                cached = z["embeddings"]
            if cached.shape[0] == len(note_chunks):
                if progress is not None:
                    progress(cached.shape[0], cached.shape[0])
                return np.asarray(cached, np.float32)

    n_patients = len(note_chunks)
    hidden = encoder.config.hidden_size
    dp = getattr(encoder, "_dp_size", 1)
    if dp > 1 and batch_size % dp:
        # shard_map needs row counts divisible by the data axis; rounding up
        # only adds pad rows (encoded and discarded), never changes results.
        batch_size += dp - batch_size % dp

    flat_texts: List[str] = []
    owners: List[int] = []
    for pid, chunks in enumerate(note_chunks):
        for c in chunks:
            if isinstance(c, str) and c.strip():
                flat_texts.append(c)
                owners.append(pid)
    out = np.zeros((n_patients, hidden), np.float32)
    if not flat_texts:
        _text_cache_store(cache_path, out)
        return out

    n = len(flat_texts)
    if hasattr(encoder.tokenizer, "encode_batch"):
        ids, mask = encoder.tokenizer.encode_batch(flat_texts,
                                                   max_length=max_length)
        ids = np.asarray(ids, np.int32)
        mask = np.asarray(mask, np.int32)
    else:
        ids = np.zeros((n, max_length), np.int32)
        mask = np.zeros((n, max_length), np.int32)
        for i, text in enumerate(flat_texts):
            ids[i], mask[i] = encoder.tokenizer.encode(
                text, max_length=max_length)

    # Keep a bounded window of encode batches in flight: dispatch is async,
    # so the device pipeline stays full while the host pulls results a few
    # batches behind.  A blocking pull per batch costs a tunnel round-trip
    # each (measured 412 chunks/s sync vs 883 windowed at batch 128 on the
    # axon v5e); an UNBOUNDED queue degrades with depth on the tunnel
    # (676 chunks/s at 300 queued) — window 8 is the measured sweet spot.
    window = 8
    embs = np.zeros((n, hidden), np.float32)
    pending: List[Tuple[np.ndarray, jax.Array]] = []
    done = 0

    def drain_one():
        nonlocal done
        sel, cls = pending.pop(0)
        embs[sel] = np.asarray(cls)[: len(sel)]
        # Progress tracks COMPLETED work (drained batches), not dispatches —
        # a dispatch-time callback would report 100% with up to `window`
        # batches still pending on device.
        done += len(sel)
        if progress is not None:
            progress(done, n)

    # Route each chunk to the smallest bucket holding its token count; one
    # compiled [rows_b, bucket] shape per non-empty bucket.  Rows per batch
    # scale inversely with bucket length (constant token budget): shorter
    # buckets take proportionally more rows per dispatch, so the dispatch
    # count — the bottleneck once pad FLOPs are gone (~33 ms/round-trip on
    # the axon tunnel vs ~10 ms device time at S=64) — drops by the same
    # factor as the sequence length.  Capped at 8x so activation memory
    # stays bounded for tiny test bucket sets.
    lengths = mask.sum(axis=1)
    bucket_of = np.searchsorted(np.asarray(buckets), lengths)
    for b_i, b_len in enumerate(buckets):
        idxs = np.nonzero(bucket_of == b_i)[0]
        rows_b = batch_size * min(8, max(1, buckets[-1] // b_len))
        for start in range(0, len(idxs), rows_b):
            sel = idxs[start:start + rows_b]
            bi = ids[sel, :b_len]
            bm = mask[sel, :b_len]
            if len(sel) < rows_b:  # keep one compiled shape per bucket
                pad = rows_b - len(sel)
                bi = np.pad(bi, ((0, pad), (0, 0)))
                bm = np.pad(bm, ((0, pad), (0, 0)))
            pending.append(
                (sel, encoder.encode_ids(jnp.asarray(bi), jnp.asarray(bm))))
            if len(pending) >= window:
                drain_one()
    while pending:
        drain_one()

    owners_arr = np.asarray(owners)
    if aggregation == "mean":
        counts = np.zeros(n_patients, np.float32)
        np.add.at(out, owners_arr, embs)
        np.add.at(counts, owners_arr, 1.0)
        nz = counts > 0
        out[nz] /= counts[nz, None]
    elif aggregation == "max":
        # -inf init so negative components survive the max; note-less
        # patients keep the zero vector.
        tmp = np.full((n_patients, hidden), -np.inf, np.float32)
        np.maximum.at(tmp, owners_arr, embs)
        has = np.zeros(n_patients, bool)
        has[owners_arr] = True
        out[has] = tmp[has]
    else:
        raise ValueError(f"unknown aggregation {aggregation!r}")
    _text_cache_store(cache_path, out)
    return out
