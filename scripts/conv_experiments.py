#!/usr/bin/env python
"""Empirical TPU timings for candidate 3D-conv formulations of the encoder
stage-1 block (the profiler shows the conv encoder is ~70% of inference).

Candidates (all bf16, wb=16 windows of 80^3):
  stage_breakdown: current grouped encoder truncated at each stage
  f1_grouped:   current — grouped conv (feature_group_count=4), C=32 flat
  f2_dense:     same shapes, dense conv (block-diagonal weights at runtime)
  f3_s2d:       space-to-depth(2): 40^3 x 32ch domain, dense 3^3 convs at
                C=256 (full MXU tiles, 4x FLOPs, zero tile padding)
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


def inorm_lrelu(x):
    mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    return jnp.where(y >= 0, y, 0.2 * y)


def conv3(x, w, groups=1, stride=1, reflect=True):
    if reflect:
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode="reflect")
        pad = "VALID"
    else:
        pad = "SAME"
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, pad,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        feature_group_count=groups, preferred_element_type=jnp.bfloat16)


def main():
    wb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((wb, 80, 80, 80, 4)), bf)

    # f1: grouped stage-1: c1 4->32 g4, c2/c3 32->32 g4 + residual
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, 1, 32)) * 0.1, bf)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 32)) * 0.1, bf)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 32)) * 0.1, bf)

    @jax.jit
    def f1(x):
        h = inorm_lrelu(conv3(x, w1, groups=4))
        r = inorm_lrelu(conv3(h, w2, groups=4))
        r = inorm_lrelu(conv3(r, w3, groups=4))
        return h + r

    # f2: dense with block-diagonal weights (same math, dense MXU op)
    def blockdiag(w, gi, go):  # (3,3,3,gi,4*go) -> (3,3,3,4*gi,4*go)
        full = np.zeros((3, 3, 3, 4 * gi, 4 * go), np.float32)
        wn = np.asarray(w, np.float32)
        for m in range(4):
            full[..., m * gi:(m + 1) * gi, m * go:(m + 1) * go] = \
                wn[..., :, m * go:(m + 1) * go]
        return jnp.asarray(full, bf)

    w1d = blockdiag(w1, 1, 8)
    w2d = blockdiag(w2, 8, 8)
    w3d = blockdiag(w3, 8, 8)

    @jax.jit
    def f2(x):
        h = inorm_lrelu(conv3(x, w1d))
        r = inorm_lrelu(conv3(h, w2d))
        r = inorm_lrelu(conv3(r, w3d))
        return h + r

    # f3: space-to-depth(2) domain: (wb, 40,40,40, 32); dense 3^3 convs at
    # C 32->256, 256->256, 256->256 (stand-in cost model for exact S2D math)
    xs2d = jnp.asarray(rng.standard_normal((wb, 40, 40, 40, 32)), bf)
    v1 = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 256)) * 0.1, bf)
    v2 = jnp.asarray(rng.standard_normal((3, 3, 3, 256, 256)) * 0.1, bf)
    v3 = jnp.asarray(rng.standard_normal((3, 3, 3, 256, 256)) * 0.1, bf)

    @jax.jit
    def f3(xs):
        h = inorm_lrelu(conv3(xs, v1, reflect=False))
        r = inorm_lrelu(conv3(h, v2, reflect=False))
        r = inorm_lrelu(conv3(r, v3, reflect=False))
        return h + r

    # f4: like f3 but 2^3 kernels (the true S2D support for k=3,s=1 is
    # c in {-1,0,1} per axis, but most taps are empty; 2^3 is the dense
    # cost floor if we split into two shifted 2^3 convs)
    v1b = jnp.asarray(rng.standard_normal((2, 2, 2, 32, 256)) * 0.1, bf)
    v2b = jnp.asarray(rng.standard_normal((2, 2, 2, 256, 256)) * 0.1, bf)

    @jax.jit
    def f4(xs):
        h = inorm_lrelu(conv3(xs, v1b, reflect=False))
        r = inorm_lrelu(conv3(h, v2b, reflect=False))
        return h + r

    for name, fn, arg in (("f1_grouped", f1, x), ("f2_dense", f2, x),
                          ("f3_s2d_k3", f3, xs2d), ("f4_s2d_k2", f4, xs2d)):
        t = timeit(fn, arg)
        print(f"{name}: {t * 1e3:8.2f} ms  ({t / wb * 1e3:.3f} ms/window)",
              flush=True)

    # sanity: f1 == f2 numerically
    d = float(jnp.max(jnp.abs(f1(x).astype(jnp.float32)
                              - f2(x).astype(jnp.float32))))
    print("f1 vs f2 max abs diff:", d, flush=True)


if __name__ == "__main__":
    main()
