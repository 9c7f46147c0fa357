#!/usr/bin/env python
"""TPU timings for the grouped encoder convs in the TRAINING trace.

The train-step profile (scripts/trace_train.py + xplane_stats.py) shows the
backward of feature_group_count=4 convs executed as pathological non-MXU
fusions (43 ms for a ~4 GFLOP input-gradient at stage 2). Candidates:

  grouped:   lax.conv feature_group_count=4 (current Conv3d groups=4)
  dense_bd:  dense conv with a block-diagonal kernel expanded at trace time
             from the same per-group parameters (4x FLOPs, MXU path)

Measured per encoder stage shape (mmFormer dims), value+grad of a
sum-of-squares loss, bf16 activations / fp32 params (the train-step regime).

Usage: python scripts/grouped_conv_bwd.py [batch]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def conv(x, w, groups):
    # the model's Conv3d: explicit reflect pad, then VALID conv
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "VALID",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        feature_group_count=groups)


def expand_bd(w, groups):
    k1, k2, k3, cig, co = w.shape
    cog = co // groups
    full = jnp.zeros((k1, k2, k3, cig * groups, co), w.dtype)
    for g in range(groups):
        full = full.at[..., g * cig:(g + 1) * cig,
                       g * cog:(g + 1) * cog].set(
            w[..., g * cog:(g + 1) * cog])
    return full


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    rng = np.random.default_rng(0)
    G = 4

    @partial(jax.jit, static_argnums=(2,))
    def g_grouped(x, w, groups):
        def loss(x, w):
            y = conv(x, w, groups)
            return jnp.sum(jnp.square(y.astype(jnp.float32))), y
        (_, y), (gx, gw) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(x, w)
        return gx, gw, y

    @partial(jax.jit, static_argnums=(2,))
    def g_dense(x, w, groups):
        def loss(x, w):
            y = conv(x, expand_bd(w, groups), 1)
            return jnp.sum(jnp.square(y.astype(jnp.float32))), y
        (_, y), (gx, gw) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(x, w)
        return gx, gw, y

    # (spatial, per-group channels) for mmFormer encoder stages 2..5
    for s, c in ((40, 16), (20, 32), (10, 64), (5, 128)):
        x = jnp.asarray(rng.standard_normal((b, s, s, s, G * c)),
                        jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, c, G * c)) * 0.05,
                        jnp.float32)
        tg = timeit(g_grouped, x, w, G)
        td = timeit(g_dense, x, w, G)
        # parity
        gxg, gg, yg = g_grouped(x, w, G)
        gxd, gd, yd = g_dense(x, w, G)
        err = float(jnp.max(jnp.abs(gg - gd)) / (jnp.max(jnp.abs(gg)) + 1e-9))
        print(f"stage {s}^3 x{G}x{c}ch  grouped {tg*1e3:8.2f} ms   "
              f"dense_bd {td*1e3:8.2f} ms   speedup {tg/td:5.2f}x   "
              f"grad_rel_err {err:.2e}")


if __name__ == "__main__":
    main()
