"""PASSION-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for incomplete
multi-modal 3D medical image segmentation under imbalanced missing rates.

Re-designed from scratch with the capabilities of the PyTorch reference
(Jun-Jie-Shi/PASSION, ACM MM'24): RFNet / mmFormer / M2FTrans backbones,
missing-modality masking, pixel-/semantic-wise self-distillation, and
preference-aware regularization — all expressed as pure functions compiled
by XLA, with data-parallel scaling via `jax.sharding` meshes.

Layout convention: channels-last `(B, H, W, Z, C)` everywhere (TPU-native),
versus the reference's `(B, C, H, W, Z)`. Stacked per-modality tensors are
`(B, M=4, H, W, Z, C)`. Modality order: FLAIR, T1ce, T1, T2
(reference: code/train.py:42-50).
"""

__version__ = "0.1.0"

from passion_tpu import masks  # noqa: F401
