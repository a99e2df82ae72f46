"""FairMultimodal-TPU: a TPU-native rebuild of the FAME fairness-aware
multimodal EHR prediction framework (reference: AI-for-Health-Data/FairMultimodal).

The reference is a single-GPU PyTorch research pipeline; this package is a
ground-up JAX/Flax/Pallas redesign:

- featurizers are batched, jit-compiled transforms (``fairmultimodal_tpu.data``)
- encoders are Flax transformers with Pallas fused attention on TPU
  (``fairmultimodal_tpu.models``, ``fairmultimodal_tpu.ops``)
- the fairness engine (EDDI / Equalized Odds) runs on-device via segment
  reductions instead of host numpy loops (``fairmultimodal_tpu.fairness``)
- training scales over a ``jax.sharding.Mesh`` with data/model parallelism
  (``fairmultimodal_tpu.parallel``, ``fairmultimodal_tpu.train``)

Public surface mirrors the reference's numbered pipeline (00_data .. 10_FAME)
through ``fairmultimodal_tpu.cli`` and the thin wrappers in ``scripts/``.
"""

__version__ = "0.1.0"

TASKS = ("mortality", "los", "mechanical_ventilation")
# Label column names in the reference CSVs (00_data.py:303,310,315).
LABEL_COLUMNS = ("short_term_mortality", "los_binary", "mechanical_ventilation")
# Fairness code spaces expected by the reference (10_FAME.py:353-355,887-889).
EXPECTED_AGE_CODES = (0, 1, 2, 3)
EXPECTED_ETHNICITY_CODES = (0, 1, 2, 3, 4)
EXPECTED_INSURANCE_CODES = (0, 1, 2, 3, 4, 5)
# Human-readable subgroup names in reference print order
# (02_BioClinicalBERT.py:255-278 fixed orders; 10_FAME.py:644-691 mappers).
AGE_BUCKET_LABELS = ("15-29", "30-49", "50-69", "70-89")
ETHNICITY_LABELS = ("Asian", "Black", "Hispanic", "Other", "White")
INSURANCE_LABELS = ("Government", "Medicaid", "Medicare", "Other",
                    "Private", "Self Pay")
