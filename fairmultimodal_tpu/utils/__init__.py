"""Utilities: checkpointing, config plumbing, timing helpers."""

from fairmultimodal_tpu.utils.checkpoint import (
    save_params_npz,
    load_params_npz,
    Checkpointer,
)

__all__ = ["save_params_npz", "load_params_npz", "Checkpointer"]
