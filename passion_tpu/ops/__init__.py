"""Core TPU-native tensor ops: resize, normalization, attention masking.

These are the numerical primitives whose semantics must match the PyTorch
reference bit-for-bit-ish (golden-tested against torch CPU in tests/):
trilinear align_corners=True upsampling, InstanceNorm3d, nearest upsampling,
and traced (loop-free) attention-mask construction replacing the reference's
per-forward-call Python/numpy mask building (code/models/mask.py:5-36).
"""

from passion_tpu.ops.resize import (  # noqa: F401
    resize_trilinear,
    upsample_trilinear,
    upsample_nearest,
)
from passion_tpu.ops.norm import instance_norm  # noqa: F401
from passion_tpu.ops.attn_mask import (  # noqa: F401
    fusion_attention_bias,
    cross_key_bias,
    NEG_INF,
)
