"""Separable trilinear / nearest resampling for channels-last 3D volumes.

`jax.image.resize` does not reproduce PyTorch's `align_corners=True`
trilinear grid (reference uses `nn.Upsample(scale_factor=2, mode='trilinear',
align_corners=True)` throughout, e.g. code/models/rfnet.py:54,110-112), so we
implement the align-corners grid math explicitly as three small dense
interpolation matrices applied per axis. The matrices are trace-time
constants, so XLA fuses the three contractions onto the MXU — far faster on
TPU than a gather-based kernel.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# Interpolation must stay fp32-exact on the MXU (bf16 default would drift
# from torch's align_corners grid by ~1e-3).
_PRECISION = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) linear-interpolation matrix, float32."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    elif align_corners:  # single output point maps to origin
        src = np.zeros((1,), dtype=np.float64)
    else:
        scale = in_size / out_size
        src = np.clip((np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5, 0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    w = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - w)
    np.add.at(m, (rows, hi), w)
    return m


def resize_trilinear(x: jnp.ndarray, out_shape, align_corners: bool = True) -> jnp.ndarray:
    """Resize (B, H, W, Z, C) volume to spatial `out_shape` = (H', W', Z').

    The per-axis contractions run in the INPUT dtype: in the bf16 serving
    path the scale-1 operands are ~1.2 GB per fuse pass and forcing f32
    doubled their HBM traffic (r4 fuse trace: ~20 ms/pass in f32 upsample
    fusions + the layout copy they fed). The MXU still accumulates in f32
    (precision=HIGHEST); only the stored operands/results round to bf16 —
    the same rounding every other activation in the bf16 path carries.
    fp32 parity runs (compute_dtype=None) are bit-unchanged: f32 in, f32
    compute.
    """
    b, h, w, z, c = x.shape
    oh, ow, oz = out_shape
    dtype = x.dtype
    xf = x
    if oh != h:
        mh = jnp.asarray(_linear_matrix(h, oh, align_corners)).astype(dtype)
        xf = jnp.einsum("oh,bhwzc->bowzc", mh, xf, precision=_PRECISION)
    if ow != w:
        mw = jnp.asarray(_linear_matrix(w, ow, align_corners)).astype(dtype)
        xf = jnp.einsum("ow,bhwzc->bhozc", mw, xf, precision=_PRECISION)
    if oz != z:
        mz = jnp.asarray(_linear_matrix(z, oz, align_corners)).astype(dtype)
        xf = jnp.einsum("oz,bhwzc->bhwoc", mz, xf, precision=_PRECISION)
    return xf.astype(dtype)


def upsample_trilinear(x: jnp.ndarray, scale: int, align_corners: bool = True) -> jnp.ndarray:
    """Upsample (B, H, W, Z, C) by integer `scale` (torch Upsample parity)."""
    if scale == 1:
        return x
    _, h, w, z, _ = x.shape
    return resize_trilinear(x, (h * scale, w * scale, z * scale), align_corners)


# Implementation switch for upsample2_trilinear_s2d, resolved by real-chip
# measurement (scripts/profile-driven): 'conv' materializes the 2x volume
# conventionally and enters S2D via the stride-2 identity conv (canonical
# layouts end-to-end); 'einsum' emits phase-minor channels directly but its
# per-axis (k, p) merge reshapes forced XLA into transposed-layout copies
# (~3-5 ms each across the 5-pass decoder, r3 train trace). Env override
# PASSION_UPSAMPLE_S2D for perf experiments.
UPSAMPLE_S2D_IMPL = os.environ.get("PASSION_UPSAMPLE_S2D", "conv")


def upsample2_trilinear_s2d(x: jnp.ndarray, align_corners: bool = True) -> jnp.ndarray:
    """x2 trilinear upsample emitted in space-to-depth layout.

    (B, H, W, Z, C) -> (B, H, W, Z, C*8) == space_to_depth(upsample_trilinear
    (x, 2)) exactly (phase-minor channel layout, ops/s2d.py).
    """
    if UPSAMPLE_S2D_IMPL == "conv":
        from passion_tpu.ops import s2d

        return s2d.space_to_depth(upsample_trilinear(x, 2, align_corners))
    b, h, w, z, c = x.shape
    dtype = x.dtype
    out = x.astype(jnp.float32)
    # Each axis contraction appends its phase bit as the NEW minormost
    # channel factor (k -> k*2 + p), so after H, W, Z the channel index is
    # c*8 + px*4 + py*2 + pz — the phase-minor S2D layout — built entirely
    # by channels-minor einsum+reshape (no phase stacking on interior axes,
    # which forced XLA into transposed layouts and full-tensor copies).
    for size, spec in ((h, "opi,biwzk->bowzkp"),
                       (w, "opi,bhizk->bhozkp"),
                       (z, "opi,bhwik->bhwokp")):
        m = jnp.asarray(_linear_matrix(size, 2 * size, align_corners))
        mp = jnp.stack([m[0::2], m[1::2]], axis=1)  # (out, phase, in)
        out = jnp.einsum(spec, mp, out, precision=_PRECISION)
        out = out.reshape(out.shape[:4] + (-1,))
    return out.astype(dtype)


def upsample_nearest(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Nearest-neighbor upsample matching torch `nn.Upsample(mode='nearest')`.

    Torch nearest picks source index floor(dst * in/out) == floor(dst/scale)
    for integer scales; for integer upsampling this equals a repeat.
    """
    if scale == 1:
        return x
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    x = jnp.repeat(x, scale, axis=3)
    return x
