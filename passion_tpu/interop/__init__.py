"""Interop: import PyTorch reference checkpoints into passion_tpu params."""

from passion_tpu.interop.torch_weights import (  # noqa: F401
    load_torch_checkpoint,
    m2ftrans_params_from_torch,
    mmformer_params_from_torch,
    rfnet_params_from_torch,
)
