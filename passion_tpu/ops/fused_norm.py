"""Pallas-fused InstanceNorm + LeakyReLU for the inference hot path.

The prenorm/postnorm conv units run `leaky_relu(instance_norm(x))` ~50x per
forward (reference blocks.py:300-370). A TPU trace of the sliding-window
fuse pass shows XLA spending more time on the norm/activation traffic than
on the convolutions themselves: the fp32 statistics pass materializes
converted temporaries, mean and variance reduce in separate passes, and the
normalize and LeakyReLU run as separate elementwise sweeps.

This kernel pair does the op at its bandwidth roofline:
  * pass 1 (stats): ONE read of the bf16 tensor accumulating per-channel
    sum and sum-of-squares simultaneously (fp32 in registers only);
  * pass 2 (apply): one read + one write doing normalize + LeakyReLU fused.
Tensors with narrow channel tails (C < 128) are reinterpreted as
(rows, 128)-lane slabs so the VPU runs with full lanes — a (64000, 64)
bf16 tensor otherwise wastes half of every memory tile.

`phase_group=8` folds statistics over space-to-depth phase channels
(channel = orig*8 + phase, ops/s2d.py), matching `instance_norm_s2d`.

The fused path is OPT-IN (`enabled()`) and inference-only: the training
step differentiates through the jnp implementation (no custom VJP needed),
and the engines enable fusion inside their jitted inference traces.
Numerics match the jnp path to float tolerance (tests/test_ops.py).
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ENABLED = False
_MAX_CHUNK_ROWS = 4096
_MIN_PALLAS_ELEMS = 1 << 21  # below ~2M elements XLA's version is fine


def is_enabled() -> bool:
    return bool(_ENABLED)


@contextmanager
def enabled(on=True):
    """Enable the fused Pallas kernels for code traced inside this context
    (trace-time flag: wrap the jit-ed function body, not the call).

    `on` is False, True, or "mixed": mixed applies the Pallas kernel only
    where its layout is free — channel counts that are already a multiple
    of the 128-lane width, so the (rows, lanes) view is a no-op reshape —
    and leaves the narrow-channel sites (whose lane-packed reinterpret
    pins a row-major layout on the operand, forcing boundary copies in
    surrounding fusions) to XLA's native norm."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = on
    try:
        yield
    finally:
        _ENABLED = prev


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chunk_rows(rows: int, sublane: int) -> int | None:
    """Largest multiple of `sublane` dividing `rows`, capped at
    _MAX_CHUNK_ROWS; None if rows isn't sublane-aligned."""
    if rows % sublane:
        return None
    best = None
    for ch in range(sublane, min(rows, _MAX_CHUNK_ROWS) + 1, sublane):
        if rows % ch == 0:
            best = ch
    return best


def _stats_kernel(x_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        # per-lane pilot (first row): sums accumulate SHIFTED moments so
        # E[x^2]-E[x]^2 never cancels when |mean| >> std (the out block is
        # revisited across j steps, so the pilot persists in VMEM)
        out_ref[0, 2, :] = x_ref[0, 0, :].astype(jnp.float32)

    pilot = out_ref[0, 2, :]
    xf = x_ref[0].astype(jnp.float32) - pilot[None, :]  # (CH, L)
    out_ref[0, 0, :] += jnp.sum(xf, axis=0)
    out_ref[0, 1, :] += jnp.sum(xf * xf, axis=0)


def _make_apply_kernel(negative_slope: float):
    def _apply_kernel(x_ref, mean_ref, scale_ref, o_ref):
        x = x_ref[0].astype(jnp.float32)  # (CH, L)
        # (x - mean) * inv, NOT x*scale + shift: the latter cancels two
        # O(|mean|*inv) terms and loses ~|mean|/std digits when |mean| >> std
        y = (x - mean_ref[0]) * scale_ref[0]  # broadcast (1, L)
        o_ref[0] = jnp.where(y >= 0, y, y * negative_slope).astype(o_ref.dtype)

    return _apply_kernel


def _pallas_norm_lrelu(x3, c, count, phase_group, eps, negative_slope):
    """x3: (B, R, L) lane-packed view (lane l holds channel l % c);
    c: true channel count; count: elements per statistics channel."""
    b, r, l = x3.shape
    sublane = 16 if x3.dtype == jnp.bfloat16 else 8
    ch = _chunk_rows(r, sublane)
    if ch is None:
        return None
    grid = (b, r // ch)
    stats = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, ch, l), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, l), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, l), jnp.float32),
        interpret=_interpret(),
    )(x3)

    # Per-lane pilot-shifted moments -> per-lane (mean, M2), then Chan's
    # stable parallel-variance merge over duplicate lanes (L = reps * C)
    # and phase groups. Tiny (B, L) arrays — plain jnp.
    s, s2, pil = stats[:, 0], stats[:, 1], stats[:, 2]
    nl = float(r)  # rows per lane
    mean_l = pil + s / nl
    m2_l = s2 - (s * s) / nl
    reps = l // c
    pg = phase_group
    mean_g = mean_l.reshape(b, reps, c // pg, pg)
    m2_g = m2_l.reshape(b, reps, c // pg, pg)
    n = float(count)
    assert abs(nl * reps * pg - n) < 0.5, (r, reps, pg, count)
    mean = jnp.mean(mean_g, axis=(1, 3))  # (B, C/pg); equal n per lane
    m2 = (jnp.sum(m2_g, axis=(1, 3))
          + nl * jnp.sum(jnp.square(mean_g - mean[:, None, :, None]),
                         axis=(1, 3)))
    var = m2 / n
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    scale_c = inv
    mean_c = mean
    if phase_group > 1:
        scale_c = jnp.repeat(scale_c, phase_group, axis=1)
        mean_c = jnp.repeat(mean_c, phase_group, axis=1)
    if reps > 1:
        scale_c = jnp.tile(scale_c, (1, reps))
        mean_c = jnp.tile(mean_c, (1, reps))
    scale = scale_c[:, None, :]  # (B, 1, L)
    meanb = mean_c[:, None, :]

    return pl.pallas_call(
        _make_apply_kernel(float(negative_slope)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ch, l), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ch, l), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        interpret=_interpret(),
    )(x3, meanb, scale)


def instance_norm_lrelu(x, eps: float = 1e-5, negative_slope: float = 0.2,
                        phase_group: int = 1):
    """Fused `leaky_relu(instance_norm(x))` with torch InstanceNorm3d
    semantics (biased variance, fp32 statistics).

    x: (B, ..., C) channels-last; statistics per (batch, channel) over all
    interior axes. With phase_group=8 the statistics additionally pool over
    groups of 8 phase channels (S2D layout, ops/s2d.py `instance_norm_s2d`).
    Falls back to the jnp implementation when fusion is disabled or for
    shapes the kernel doesn't cover; under autodiff the custom-JVP rule
    differentiates the jnp implementation, so a grad traced inside an
    `enabled()` context never hits the VJP-less pallas_call.
    """
    return _inl(x, eps, negative_slope, phase_group)


@partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3))
def _inl(x, eps, negative_slope, phase_group):
    if (_ENABLED and x.ndim >= 3
            and int(np.prod(x.shape)) >= _MIN_PALLAS_ELEMS):
        b = x.shape[0]
        c = x.shape[-1]
        spatial = int(np.prod(x.shape[1:-1]))
        if _ENABLED == "mixed":
            ok_c = c % 128 == 0
        else:
            ok_c = (c % 128 == 0) or (128 % c == 0
                                      and (spatial * c) % 128 == 0)
        if ok_c and c % phase_group == 0:
            if c % 128 == 0:
                l, rows = c, spatial
            else:
                l, rows = 128, spatial * c // 128
            out = _pallas_norm_lrelu(x.reshape(b, rows, l), c,
                                     spatial * phase_group, phase_group,
                                     eps, negative_slope)
            if out is not None:
                return out.reshape(x.shape)
    return _inl_jnp(x, eps, negative_slope, phase_group)


@_inl.defjvp
def _inl_jvp(eps, negative_slope, phase_group, primals, tangents):
    (x,), (dx,) = primals, tangents
    return jax.jvp(lambda v: _inl_jnp(v, eps, negative_slope, phase_group),
                   (x,), (dx,))


def _inl_jnp(x, eps, negative_slope, phase_group):
    if phase_group > 1:
        shape = x.shape
        v = x.reshape(shape[:-1] + (shape[-1] // phase_group, phase_group))
        axes = tuple(range(1, v.ndim - 2)) + (v.ndim - 1,)
        vf = v.astype(jnp.float32)
        mean = jnp.mean(vf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(vf - mean), axis=axes, keepdims=True)
        y = ((vf - mean) * jax.lax.rsqrt(var + eps)).reshape(shape)
        y = y.astype(x.dtype)
    else:
        axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return jax.nn.leaky_relu(y, negative_slope=negative_slope)
