#!/usr/bin/env python
"""Breakdown of the 15-mask sweep (run on the real chip): encode time,
per-mask fuse time, dispatch overhead. Guides where the next speedup is.

Usage: python scripts/profile_sweep_breakdown.py [model] [window_batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from passion_tpu.engine.sliding_window import SlidingWindowSweep
    from passion_tpu.masks import MASK_ARRAY
    from passion_tpu.models import get_model

    name = sys.argv[1] if len(sys.argv) > 1 else "mmformer"
    # default: auto window_batch (None) — the shipped bench/eval config
    wb = int(sys.argv[2]) if len(sys.argv) > 2 else None
    model = get_model(name, mask_type="idt", patch_size=80)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 80, 80, 80, 4), jnp.float32),
                        jnp.ones((1, 4), bool))
    engine = SlidingWindowSweep(model, num_cls=4, patch=80, window_batch=wb)
    vol = np.random.default_rng(0).standard_normal(
        (240, 240, 155, 4)).astype(np.float32)
    masks = [np.asarray(m) for m in MASK_ARRAY]
    prepared = engine.prepare(vol)

    # warm up / compile everything
    labs = engine.sweep_labels(params, prepared, masks)
    assert len(labs) == 15

    # NOTE: on the axon tunnel platform jax.block_until_ready returns after
    # dispatch (no-op sync) — every timed region must end in a small host
    # fetch (the 2-bit packed labels, ~2.3 MB) to observe device completion.
    # Probe ordering holds ONE feature set at a time: RFNet/M2FTrans fit
    # the r4-validated single-set envelope at auto wb=75 but not two full
    # sets side by side (the old re-encode probe OOMed them).
    def fuse_fetch(f, m):
        return np.asarray(engine._fuse_labels_device(params, prepared, f, m))

    t0 = time.perf_counter()
    fts = engine.encode_case(params, prepared)
    fuse_fetch(fts, masks[14])
    t_enc_fuse = time.perf_counter() - t0  # encode + 1 fuse

    t0 = time.perf_counter()
    fuse_fetch(fts, masks[14])
    t_fuse1 = time.perf_counter() - t0
    t_enc = t_enc_fuse - t_fuse1

    t0 = time.perf_counter()
    pending = [engine._fuse_labels_device(params, prepared, fts, m)
               for m in masks]
    for x in pending:
        np.asarray(x)
    t_fuse15 = time.perf_counter() - t0

    # host label cost: D2H fetch + 2-bit unpack + crop, one settled volume
    # (np.asarray of the packed labels IS the sync — see the NOTE above)
    done = engine._fuse_labels_device(params, prepared, fts, masks[0])
    np.asarray(done)
    t0 = time.perf_counter()
    _ = engine.fetch_labels(prepared, done)
    t_fetch1 = time.perf_counter() - t0

    del fts, done, pending  # free the probe feature set BEFORE the final
    # sweep encodes its own — RFNet/M2FTrans fit one set, not two

    t0 = time.perf_counter()
    labs = engine.sweep_labels(params, prepared, masks)
    t_total = time.perf_counter() - t0

    nchunks = int(prepared["coords"].shape[0])
    print(f"model={name} wb={wb} chunks={nchunks}")
    print(f"encode_case          : {t_enc:7.3f}s")
    print(f"fuse 1 mask          : {t_fuse1:7.3f}s")
    print(f"fuse 15 masks (pipe) : {t_fuse15:7.3f}s  ({t_fuse15 / 15:.3f}s/mask)")
    print(f"label fetch+unpack   : {t_fetch1:7.3f}s/mask (host, overlappable)")
    print(f"sweep_labels total   : {t_total:7.3f}s  -> {15 / t_total:.3f} mask-cases/s")


if __name__ == "__main__":
    main()
