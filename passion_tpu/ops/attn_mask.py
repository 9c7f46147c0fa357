"""Traced, vectorized attention-mask construction.

The reference builds attention masks with Python loops + numpy on the host
on EVERY forward call and ships them to the device
(code/models/mask.py:5-36, used at m2ftrans.py:350 and blocks.py:289) — a
hot-path serialization. Here the same masks are pure jnp functions of the
(B, 4) modality mask, traced straight into the XLA graph.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from passion_tpu.masks import NUM_MODALS

# Large negative additive bias standing in for -inf in masked softmax.
# Finite so that bf16/fp32 softmax of a fully-masked row stays NaN-free.
NEG_INF = -1e9


def fusion_attention_bias(mask: jnp.ndarray, tokens_per_block: int) -> jnp.ndarray:
    """Additive bias for the M2FTrans bottleneck's masked self-attention.

    Token layout: 4 modality blocks of `tokens_per_block` tokens followed by
    one fusion block. Visibility rules (reference mask_gen_fusion,
    code/models/mask.py:5-22):
      * modality tokens attend only within their own modality block;
      * fusion tokens attend to fusion tokens and to the blocks of PRESENT
        modalities.

    Args:
      mask: (B, 4) bool/float modality-present mask.
      tokens_per_block: tokens per modality block (patch_size**3).

    Returns:
      (B, 1, N, N) float32 additive bias with 0 where visible and NEG_INF
      where masked; broadcastable over heads.
    """
    p = tokens_per_block
    n_blocks = NUM_MODALS + 1
    n = p * n_blocks
    block_id = np.repeat(np.arange(n_blocks), p)  # (N,)
    same_block = (block_id[:, None] == block_id[None, :])  # (N, N)
    row_is_fusion = block_id[:, None] == NUM_MODALS  # (N, 1)
    col_block = block_id  # (N,)

    mask = jnp.asarray(mask, dtype=jnp.bool_)  # (B, 4)
    # col_present[b, c] for modality columns; fusion columns always "present".
    col_present = jnp.concatenate(
        [mask, jnp.ones((mask.shape[0], 1), dtype=jnp.bool_)], axis=1
    )[:, col_block]  # (B, N)
    allow = jnp.asarray(same_block)[None] | (
        jnp.asarray(row_is_fusion)[None] & col_present[:, None, :]
    )  # (B, N, N)
    bias = jnp.where(allow, 0.0, NEG_INF).astype(jnp.float32)
    return bias[:, None, :, :]


def cross_key_bias(mask: jnp.ndarray, channels_per_modality: int) -> jnp.ndarray:
    """Additive key bias for the MultiMask channel cross-attention.

    Keys are 4 concatenated per-modality channel groups; key channels of
    absent modalities are masked out (reference mask_gen_cross4,
    code/models/mask.py:25-36).

    Args:
      mask: (B, 4) modality-present mask.
      channels_per_modality: key channels contributed per modality.

    Returns:
      (B, 1, 4*channels_per_modality) float32 additive bias (0 / NEG_INF),
      broadcastable over query channels.
    """
    mask = jnp.asarray(mask, dtype=jnp.bool_)
    allowed = jnp.repeat(mask, channels_per_modality, axis=1)  # (B, 4*Ck)
    bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)
    return bias[:, None, :]
