"""Batch inference / serving path.

The reference has no inference story beyond reloading ``best_model_<ts>.pt``
inside the training scripts; production deployment needs a standalone
predictor.  :class:`FAMEPredictor` loads an exported ``best_model_*.npz``
(utils.checkpoint.save_params_npz format) plus calibrated thresholds and runs
fixed-shape jitted batches — padding the tail batch so a single compiled
program serves any cohort size.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd

from fairmultimodal_tpu import TASKS
from fairmultimodal_tpu.data.featurize import assemble_features
from fairmultimodal_tpu.models.fusion import FAMEModel
from fairmultimodal_tpu.models.text import TextEncoder, encode_note_chunks
from fairmultimodal_tpu.pipelines.fame import build_model_arrays
from fairmultimodal_tpu.utils.checkpoint import load_metadata_npz, load_params_npz

from fairmultimodal_tpu.utils.rng import threefry_key

__all__ = ["FAMEPredictor", "run_fame_inference"]


class FAMEPredictor:
    """Jitted fixed-shape batch predictor over a trained FAME model."""

    def __init__(self, model: FAMEModel, params, thresholds: Optional[Dict] = None,
                 batch_size: int = 256,
                 dynamic_weights: Optional[np.ndarray] = None):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.params = params
        self.batch_size = batch_size
        self.thresholds = thresholds or {t: 0.5 for t in TASKS}
        dw = (np.full((3, 3), 0.33, np.float32)
              if dynamic_weights is None else dynamic_weights)
        self._dw = jnp.asarray(dw)

        def fwd(p, mi, dw):
            out = model.apply({"params": p}, mi, dynamic_weights=dw,
                              deterministic=True)
            return jax.nn.sigmoid(out["fused_logits"])

        self._fwd = jax.jit(fwd)

    def predict_arrays(self, arrays: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Model-input arrays [N, ...] -> {"probs": [N, 3], "preds": [N, 3]}.

        Dispatch runs a bounded window ahead of the result pulls so batch
        N+1's transfer/compute overlaps pulling batch N (a blocking pull per
        batch costs a device round-trip each — see data/device.py)."""
        import jax.numpy as jnp

        n = len(next(iter(arrays.values())))
        bs = self.batch_size
        probs = np.zeros((n, 3), np.float32)
        window = 4
        pending = []

        def drain_one():
            start, stop, out = pending.pop(0)
            probs[start:stop] = np.asarray(out)[: stop - start]

        for start in range(0, n, bs):
            stop = min(start + bs, n)
            chunk = {k: v[start:stop] for k, v in arrays.items()}
            if stop - start < bs:  # pad tail to the compiled shape
                pad = bs - (stop - start)
                chunk = {k: np.concatenate(
                    [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                    for k, v in chunk.items()}
            pending.append((start, stop, self._fwd(
                self.params, {k: jnp.asarray(v) for k, v in chunk.items()},
                self._dw)))
            if len(pending) >= window:
                drain_one()
        while pending:
            drain_one()
        thr = np.asarray([self.thresholds[t] for t in TASKS], np.float32)
        return {"probs": probs, "preds": (probs > thr).astype(np.int32)}

    def benchmark(self, iters: int = 20, seed: int = 0) -> Dict[str, float]:
        """Measured serving throughput at the compiled batch shape.

        Times ``iters`` back-to-back forward dispatches on synthetic inputs
        with one final block (the same pattern as bench.py — per-call timing
        is unreliable on tunneled devices).  Returns batch latency (ms,
        amortized) and patients/sec.
        """
        import time

        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        bs = self.batch_size
        m = self.model
        mi = {
            "demo_dummy_ids": jnp.zeros((bs, 1), jnp.int32),
            "demo_attn_mask": jnp.ones((bs, 1), jnp.int32),
            "age_ids": jnp.asarray(rng.integers(0, m.num_ages, bs), jnp.int32),
            "gender_ids": jnp.asarray(rng.integers(0, m.num_genders, bs), jnp.int32),
            "ethnicity_ids": jnp.asarray(
                rng.integers(0, m.num_ethnicities, bs), jnp.int32),
            "insurance_ids": jnp.asarray(
                rng.integers(0, m.num_insurances, bs), jnp.int32),
            "lab_features": jnp.asarray(
                rng.normal(0, 1, (bs, m.lab_token_count)), jnp.float32),
            "text_embedding": jnp.asarray(
                rng.normal(0, 1, (bs, m.text_embed_size)), jnp.float32),
        }
        # Timing rules learned the hard way on tunneled devices (CLAUDE.md):
        # (1) independent repeated dispatches "time" at PFLOP/s-impossible
        # rates; (2) a data-dependency chain must consume EVERY output
        # element (jnp.sum) or XLA narrows each step to one batch row;
        # (3) even then, block_until_ready returns before remote completion
        # here — only fetching a VALUE truly synchronizes.  So: dependent
        # host-loop chain, terminated by a scalar fetch.  Validated sane:
        # 37 ms per 256-batch = ~99 TFLOP/s, matching the train step's MFU,
        # and ~3.3x the fwd+bwd training throughput (the fwd:fwd+bwd ratio).
        mix = jax.jit(lambda t, o: t + 1e-30 * jnp.sum(o.astype(jnp.float32)))
        t = mi["text_embedding"]
        out = self._fwd(self.params, {**mi, "text_embedding": t}, self._dw)
        t = mix(t, out)
        float(jnp.sum(t))            # warmup both programs, full sync
        t0 = time.perf_counter()
        t = mi["text_embedding"]
        for _ in range(iters):
            out = self._fwd(self.params, {**mi, "text_embedding": t},
                            self._dw)
            t = mix(t, out)
        float(jnp.sum(t))            # value fetch = the only real barrier
        dt = time.perf_counter() - t0
        return {"batch_size": float(bs),
                "batch_latency_ms": 1e3 * dt / iters,
                "patients_per_sec": bs * iters / dt}


def run_fame_inference(
    structured: pd.DataFrame,
    unstructured: pd.DataFrame,
    params_path: str,
    thresholds: Optional[Dict] = None,
    text_encoder: Optional[TextEncoder] = None,
    text_max_length: int = 512,
    model_kwargs: Optional[Dict] = None,
    out_csv: Optional[str] = None,
    verbose: bool = True,
) -> pd.DataFrame:
    """Cohort CSVs + exported params -> per-patient risk table."""
    bundle = assemble_features(structured, unstructured)
    if text_encoder is None:
        text_encoder = TextEncoder.from_pretrained()
    bundle.text_embeddings = encode_note_chunks(
        text_encoder, bundle.note_chunks, max_length=text_max_length)
    arrays = build_model_arrays(bundle)

    meta = load_metadata_npz(params_path) or {}
    n_ages, n_gen, n_eth, n_ins = bundle.vocab_sizes()
    kwargs = dict(num_ages=n_ages, num_genders=n_gen, num_ethnicities=n_eth,
                  num_insurances=n_ins,
                  lab_token_count=bundle.num_lab_features,
                  text_embed_size=bundle.text_embeddings.shape[1])
    # Self-describing checkpoints: the geometry stored at export time wins
    # (explicit model_kwargs override both).
    kwargs.update(meta.get("model", {}))
    kwargs.update(model_kwargs or {})
    if thresholds is None and "thresholds" in meta:
        thresholds = meta["thresholds"]
    model = FAMEModel(**kwargs)

    import jax

    example = {k: v[:1] for k, v in arrays.items()}
    import jax.numpy as jnp

    like = model.init(threefry_key(0),
                      {k: jnp.asarray(v) for k, v in example.items()})["params"]
    params = load_params_npz(params_path, like)

    dw = (np.asarray(meta["dynamic_weights"], np.float32)
          if "dynamic_weights" in meta else None)
    pred = FAMEPredictor(model, params, thresholds, dynamic_weights=dw)
    out = pred.predict_arrays(arrays)
    table = pd.DataFrame({"subject_id": bundle.subject_id})
    for i, t in enumerate(TASKS):
        table[f"{t}_prob"] = out["probs"][:, i]
        table[f"{t}_pred"] = out["preds"][:, i]
    if out_csv:
        table.to_csv(out_csv, index=False)
        if verbose:
            print(f"Wrote predictions for {len(table)} patients to {out_csv}")
    return table
