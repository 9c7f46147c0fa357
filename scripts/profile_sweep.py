#!/usr/bin/env python
"""Breakdown profiling for the sliding-window bench (run on the real chip).

Times, for an 80-cube-window backbone:
  * tunnel round-trip latency of a trivial jitted op;
  * pure batched window forward (no gather/scatter);
  * encoder-only forward;
  * the full SlidingWindowInference engine;
per window batch size. All timings force a small device->host fetch —
`block_until_ready` alone is unreliable over the axon tunnel.

Usage: python scripts/profile_sweep.py [model] [wb1 wb2 ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, n=3):
    import jax

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(jax.device_get(jax.numpy.ravel(leaf)[0]))

    fetch(fn())  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from passion_tpu.engine.sliding_window import SlidingWindowInference, window_coords
    from passion_tpu.models import get_model

    name = sys.argv[1] if len(sys.argv) > 1 else "mmformer"
    wbs = [int(a) for a in sys.argv[2:]] or [8, 16]
    PATCH = 80
    model = get_model(name, mask_type="idt", patch_size=PATCH)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, PATCH, PATCH, PATCH, 4), jnp.float32),
                        jnp.ones((1, 4), bool))
    n_win = len(window_coords((240, 240, 155), PATCH))
    print(f"model={name} windows/case={n_win}", flush=True)

    trivial = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    t_rt = timeit(lambda: trivial(z), n=20)
    print(f"tunnel round-trip (trivial jit call): {t_rt * 1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((240, 240, 155, 4)).astype(np.float32)
    mask = np.array([True, True, True, True])

    bf16 = jnp.bfloat16
    p16 = jax.tree_util.tree_map(
        lambda v: v.astype(bf16) if hasattr(v, "dtype") and v.dtype == jnp.float32 else v,
        params)

    for wb in wbs:
        x = jnp.asarray(rng.standard_normal((wb, PATCH, PATCH, PATCH, 4)), bf16)
        mb = jnp.ones((wb, 4), bool)
        calls = -(-n_win // wb)

        fwd = jax.jit(lambda p, x, m: model.apply(p, x, m))
        t_fwd = timeit(lambda: fwd(p16, x, mb)) * calls

        enc = jax.jit(lambda p, x, m: model.apply(
            p, x, m, method=type(model).encode))
        t_enc = timeit(lambda: enc(p16, x, mb)) * calls

        engine = SlidingWindowInference(model.apply, num_cls=4, patch=PATCH,
                                        window_batch=wb)
        prepared = engine.prepare(vol)
        t_full = timeit(lambda: engine.run(params, prepared, mask))

        print(f"wb={wb:3d}: encoder {t_enc:6.3f}s  forward {t_fwd:6.3f}s "
              f"({calls} calls)  engine {t_full:6.3f}s  "
              f"scatter+rest {t_full - t_fwd:6.3f}s  "
              f"-> {1.0 / t_full:.3f} cases/s", flush=True)


if __name__ == "__main__":
    main()
