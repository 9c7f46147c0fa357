#!/usr/bin/env python
"""Split the per-mask fuse pass: pure fuse forward vs scatter-add/engine
overhead, plus sub-component timings. Run on the real chip.

Usage: python scripts/profile_fuse.py [model] [window_batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, n=5):
    # block_until_ready is unreliable over the axon tunnel; force a small
    # device->host fetch instead (see profile_sweep.py).
    import jax

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(jax.device_get(jax.numpy.ravel(leaf)[0]))

    fetch(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from passion_tpu.engine.sliding_window import SlidingWindowSweep
    from passion_tpu.models import get_model

    name = sys.argv[1] if len(sys.argv) > 1 else "mmformer"
    wb = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    model = get_model(name, mask_type="idt", patch_size=80)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 80, 80, 80, 4), jnp.float32),
                        jnp.ones((1, 4), bool))
    engine = SlidingWindowSweep(model, num_cls=4, patch=80, window_batch=wb)
    vol = np.random.default_rng(0).standard_normal(
        (240, 240, 155, 4)).astype(np.float32)
    prepared = engine.prepare(vol)
    fts = engine.encode_case(params, prepared)
    mask = jnp.ones((4,), bool)
    mask_b = jnp.broadcast_to(mask[None], (wb, 4))
    nchunks = int(prepared["coords"].shape[0])

    p16 = engine._cast(params)
    ft0 = jax.tree_util.tree_map(lambda v: v[0], fts)  # first chunk

    fuse_fwd = jax.jit(lambda p, ft, m: model.apply(
        p, ft, m, method=type(model).fuse_inference))
    t_fwd = timeit(lambda: fuse_fwd(p16, ft0, mask_b))
    print(f"fuse forward / chunk ({wb} windows): {t_fwd * 1e3:8.2f} ms "
          f"-> x{nchunks} = {t_fwd * nchunks * 1e3:8.1f} ms/mask")

    t_full = timeit(lambda: engine._fuse_labels_device(
        params, prepared, fts, np.ones(4, bool)))
    print(f"full fuse+scatter+argmax per mask  : {t_full * 1e3:8.1f} ms")
    print(f"scatter/argmax/overhead            : "
          f"{(t_full - t_fwd * nchunks) * 1e3:8.1f} ms")

    if name == "mmformer":
        # sub-components on one chunk
        inter = jax.jit(lambda p, ft, m: model.apply(
            p, jax.tree_util.tree_map(
                lambda v: v, ft), m,
            method=type(model).fuse_inference))
        x1s = ft0["x1s"]
        print(f"feature tensor shapes: x1s={x1s.shape} "
              + " ".join(str(t.shape) for t in ft0["rest"])
              + f" intra={ft0['intra'].shape}")


if __name__ == "__main__":
    main()
