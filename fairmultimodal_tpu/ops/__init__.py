"""TPU compute ops: attention (Pallas fused kernel with XLA fallback),
segment reductions, and fused losses.
"""

from fairmultimodal_tpu.ops.attention import attention_reference, multi_head_attention
from fairmultimodal_tpu.ops.flash_attention import flash_attention
from fairmultimodal_tpu.ops.fused_ffn import can_use_fused_ffn, fused_ffn
from fairmultimodal_tpu.ops.losses import (
    bce_with_logits,
    focal_loss,
    sigmoid,
)

__all__ = ["multi_head_attention", "attention_reference", "flash_attention",
           "fused_ffn", "can_use_fused_ffn",
           "bce_with_logits", "focal_loss", "sigmoid"]
