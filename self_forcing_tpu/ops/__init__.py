from self_forcing_tpu.ops.attention import (
    dense_attention,
    flash_attention,
    decode_attention,
)
from self_forcing_tpu.ops.masks import (
    IntervalMask,
    block_causal_mask,
    block_causal_mask_i2v,
    teacher_forcing_mask,
)

__all__ = [
    "dense_attention",
    "flash_attention",
    "decode_attention",
    "IntervalMask",
    "block_causal_mask",
    "block_causal_mask_i2v",
    "teacher_forcing_mask",
]
