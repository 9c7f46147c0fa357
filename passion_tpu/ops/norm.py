"""Normalization primitives with exact PyTorch semantics.

The reference's default norm is `nn.InstanceNorm3d(planes)` with its torch
defaults — affine=False, track_running_stats=False, eps=1e-5, biased variance
(code/models/blocks.py:12-23). This is a pure per-(sample, channel) spatial
normalization with no parameters, so it lives here as a function rather than
a flax module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over spatial dims of a channels-last (B, ..., C) tensor.

    Normalizes each (batch, channel) slice over all interior (spatial) axes
    using the biased variance, matching torch `nn.InstanceNorm3d` defaults.
    """
    axes = tuple(range(1, x.ndim - 1))
    # fp32 statistics regardless of activation dtype for numerical parity.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype)
