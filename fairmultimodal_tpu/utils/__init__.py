"""Utilities: checkpointing, profiling/tracing, NaN debugging, PRNG selection."""

from fairmultimodal_tpu.utils.checkpoint import (
    save_params_npz,
    load_params_npz,
    load_metadata_npz,
    Checkpointer,
)
from fairmultimodal_tpu.utils.debug import check_finite_tree, enable_nan_checks
from fairmultimodal_tpu.utils.profiling import Timer, profile_to, throughput, trace
from fairmultimodal_tpu.utils.rng import make_rng, threefry_key

__all__ = [
    "save_params_npz",
    "load_params_npz",
    "load_metadata_npz",
    "Checkpointer",
    "check_finite_tree",
    "enable_nan_checks",
    "Timer",
    "profile_to",
    "throughput",
    "trace",
    "make_rng",
    "threefry_key",
]
