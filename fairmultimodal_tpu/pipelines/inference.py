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
        """Model-input arrays [N, ...] -> {"probs": [N, 3], "preds": [N, 3]}."""
        import jax.numpy as jnp

        n = len(next(iter(arrays.values())))
        bs = self.batch_size
        probs = np.zeros((n, 3), np.float32)
        for start in range(0, n, bs):
            stop = min(start + bs, n)
            chunk = {k: v[start:stop] for k, v in arrays.items()}
            if stop - start < bs:  # pad tail to the compiled shape
                pad = bs - (stop - start)
                chunk = {k: np.concatenate(
                    [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                    for k, v in chunk.items()}
            out = np.asarray(self._fwd(
                self.params, {k: jnp.asarray(v) for k, v in chunk.items()},
                self._dw))
            probs[start:stop] = out[: stop - start]
        thr = np.asarray([self.thresholds[t] for t in TASKS], np.float32)
        return {"probs": probs, "preds": (probs > thr).astype(np.int32)}


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

    like = model.init(jax.random.PRNGKey(0),
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
