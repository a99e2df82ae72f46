#!/usr/bin/env python
"""Smoke-test the production HF-weight path against a REAL checkpoint.

The offline test (``tests/test_text_pretrained.py``) exercises
``TextEncoder.from_pretrained`` end-to-end with a random-init
``transformers.BertModel`` saved to a tmpdir.  What it cannot cover is the
real released Bio_ClinicalBERT checkpoint (network-blocked in the build
environment).  Run this script anywhere the checkpoint is reachable:

    python scripts/smoke_hf_checkpoint.py                      # hub download
    python scripts/smoke_hf_checkpoint.py /path/to/checkpoint  # local dir

It loads the checkpoint through the REAL production path
(``load_hf_bert_params`` + ``_HFTokenizerAdapter``, require_weights=True),
encodes a clinical-note sample, and compares CLS embeddings against the
torch ``BertModel`` forward (eval mode, same tokenizer) — the exact parity
contract of the reference's frozen text modality
(10_FAME.py:725-731, 02_BioClinicalBERT.py:419-439).

Exit codes: 0 = parity holds (max |Δ| ≤ 2e-4 fp32), 1 = divergence,
2 = checkpoint unreachable (environment, not code).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ATOL = 2e-4  # fp32 accumulation-order noise across 12 layers

SAMPLES = [
    "Patient admitted with acute respiratory failure requiring mechanical "
    "ventilation. History of COPD and CHF.",
    "pt c/o chest pain x2 days. EKG unremarkable. troponin negative x3. "
    "d/c home with f/u cardiology.",
    "Assessment and Plan: 1. Sepsis - continue vancomycin and zosyn. "
    "2. AKI - likely prerenal, IVF.",
    "",  # empty note: tokenizer must still emit CLS/SEP
]


def main() -> int:
    model_name = sys.argv[1] if len(sys.argv) > 1 else (
        "emilyalsentzer/Bio_ClinicalBERT")

    try:
        import torch
        import transformers

        torch_model = transformers.BertModel.from_pretrained(model_name)
        tok = transformers.AutoTokenizer.from_pretrained(model_name)
    except Exception as e:
        print(f"SKIP: checkpoint {model_name!r} unreachable: {e}")
        return 2

    from fairmultimodal_tpu.models.text import TextEncoder

    enc = TextEncoder.from_pretrained(model_name, require_weights=True)
    assert not enc.is_fallback

    torch_model.eval()
    worst = 0.0
    for text in SAMPLES:
        ids, mask = enc.tokenizer.encode(text, max_length=128)
        with torch.no_grad():
            out = torch_model(
                input_ids=torch.tensor(ids[None].astype(np.int64)),
                attention_mask=torch.tensor(mask[None].astype(np.int64)),
            ).last_hidden_state[:, 0, :].numpy()
        ours = np.asarray(enc.encode_ids(ids[None], mask[None]))
        delta = float(np.max(np.abs(ours - out)))
        worst = max(worst, delta)
        status = "ok" if delta <= ATOL else "DIVERGED"
        print(f"  {status}  maxΔ={delta:.2e}  note={text[:48]!r}")

    print(f"fingerprint: {enc.fingerprint}")
    if worst > ATOL:
        print(f"FAIL: worst CLS divergence {worst:.2e} > {ATOL:.0e}")
        return 1
    print(f"PASS: worst CLS divergence {worst:.2e} ≤ {ATOL:.0e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
