"""Data layer: ETL (host pandas, runs once), featurizers (batched transforms),
splits (iterative multilabel stratification), synthetic MIMIC-shaped data for
tests, and fixed-shape batch iterators for jitted training.
"""

from fairmultimodal_tpu.data.split import (
    multilabel_stratified_split,
    reference_three_way_split,
)
from fairmultimodal_tpu.data.featurize import FeatureBundle, assemble_features
from fairmultimodal_tpu.data.device import DeviceLoader
from fairmultimodal_tpu.data.loader import BatchIterator, pad_to_multiple
from fairmultimodal_tpu.data.prefetch import PrefetchLoader, prefetch_to_device

__all__ = [
    "DeviceLoader",
    "PrefetchLoader",
    "prefetch_to_device",
    "multilabel_stratified_split",
    "reference_three_way_split",
    "FeatureBundle",
    "assemble_features",
    "BatchIterator",
    "pad_to_multiple",
]
