"""Normalization primitives with exact PyTorch semantics.

The reference's default norm is `nn.InstanceNorm3d(planes)` with its torch
defaults — affine=False, track_running_stats=False, eps=1e-5, biased variance
(code/models/blocks.py:12-23). This is a pure per-(sample, channel) spatial
normalization with no parameters, so it lives here as a function rather than
a flax module.

The backward is a hand-written custom VJP. Plain autodiff of the fp32-stats
form saves full-size FP32 residuals — `convert(x)` and `(x - mean) * inv` —
for every norm in the network, which on the 80^3 training step materialized
~50 ms/step of f32 scale-1 tensors (PROFILE.md r3 trace: the
`f32[40,40,40,6,64]` class). The analytic VJP needs only the original
activation `x` (already live — it is the producing conv's output) plus the
per-(sample, channel) `mean`/`inv` scalars, and recomputes `x_hat` in the
backward pass, so no full-size fp32 residual exists anywhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _stats(x: jnp.ndarray, eps: float):
    """fp32 per-(sample, channel) spatial mean and rsqrt(var + eps)."""
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    return mean, jax.lax.rsqrt(var + eps)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over spatial dims of a channels-last (B, ..., C) tensor.

    Normalizes each (batch, channel) slice over all interior (spatial) axes
    using the biased variance, matching torch `nn.InstanceNorm3d` defaults.
    Statistics are computed in fp32 regardless of activation dtype for
    numerical parity; the result is cast back to the input dtype.
    """
    mean, inv = _stats(x, eps)
    return ((x.astype(jnp.float32) - mean) * inv).astype(x.dtype)


def _in_fwd(x, eps):
    mean, inv = _stats(x, eps)
    y = ((x.astype(jnp.float32) - mean) * inv).astype(x.dtype)
    return y, (x, mean, inv)


def _in_bwd(eps, res, g):
    # Standard biased-variance norm backward:
    #   dx = inv * (g - mean(g) - x_hat * mean(g * x_hat))
    # with x_hat recomputed from the saved activation (no fp32 residual).
    x, mean, inv = res
    axes = tuple(range(1, x.ndim - 1))
    gf = g.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * inv
    mg = jnp.mean(gf, axis=axes, keepdims=True)
    mgx = jnp.mean(gf * xhat, axis=axes, keepdims=True)
    dx = inv * (gf - mg - xhat * mgx)
    return (dx.astype(x.dtype),)


instance_norm.defvjp(_in_fwd, _in_bwd)
