#!/usr/bin/env python
"""HBM-roofline accounting for the sweep at the shipped (auto wb=75) config.

VERDICT r3 item 1: the bandwidth-bound argument for mfu_sweep ~3% was
qualitative — this script makes it quantitative. For the encode and
per-mask fuse programs it reports, from the COMPILED TPU executables:

  * FLOPs (XLA cost analysis) and bytes accessed (HBM traffic the compiled
    program performs — reads + writes, post-fusion);
  * the two roofline time floors: compute (FLOPs / bf16 peak) and memory
    (bytes / HBM bandwidth), and which binds;
  * measured wall time per program (block_until_ready), and the fraction
    of the binding roofline actually achieved;
  * the implied mask-cases/s ceiling for the whole 15-mask sweep if every
    program ran exactly at its roofline.

Run on the real chip: `python scripts/roofline_sweep.py [model]`.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

PATCH = 80
VOLUME_SHAPE = (240, 240, 155)
N_MASKS = 15
# v5e: 197 TF/s dense bf16, 819 GB/s HBM (BASELINE.md)
PEAK_FLOPS = 197e12
PEAK_BW = 819e9


def _analyze(jitted, *args, **kwargs):
    compiled = jitted.lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return flops, byts


def _timed(fn, reps=5):
    """fn must END in a small host fetch: on the axon tunnel platform
    `jax.block_until_ready` returns after dispatch (~no-op; measured 30 ms
    for a matmul whose honest wall time is seconds), so the only reliable
    sync is materializing a (small) result on the host."""
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.mean(ts)), float(np.min(ts))


def main():
    from passion_tpu.engine.sliding_window import SlidingWindowSweep
    from passion_tpu.masks import MASK_ARRAY
    from passion_tpu.models import get_model

    name = sys.argv[1] if len(sys.argv) > 1 else "mmformer"
    model = get_model(name, mask_type="idt", patch_size=PATCH)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, PATCH, PATCH, PATCH, 4), jnp.float32),
                        jnp.ones((1, 4), bool))
    engine = SlidingWindowSweep(model, num_cls=4, patch=PATCH)
    vol = np.random.default_rng(0).standard_normal(
        VOLUME_SHAPE + (4,)).astype(np.float32)
    prepared = engine.prepare(vol)
    mask = jnp.asarray(np.ones((4,), bool))
    pack = prepared["xpad"].shape[2] % 4 == 0

    rows = {}

    fe, be = _analyze(engine._jit_encode, params, prepared["xpad"],
                      prepared["coords"])
    fts = engine.encode_case(params, prepared)
    ff, bf = _analyze(engine._jit_fuse_labels, params, fts, prepared["wgt"],
                      mask, cosets=prepared["cosets"], pack=pack)

    def fuse_once(f):
        return np.asarray(engine._jit_fuse_labels(
            params, f, prepared["wgt"], mask, cosets=prepared["cosets"],
            pack=pack))

    # fuse alone (stored features), synced by the ~2.3 MB packed-label fetch
    tf, tf_best = _timed(lambda: fuse_once(fts))

    # encode + fuse chained, same fetch; encode = difference
    def enc_fuse():
        f2 = engine._jit_encode(params, prepared["xpad"], prepared["coords"])
        return fuse_once(f2)

    tef, tef_best = _timed(enc_fuse)
    rows["encode"] = (fe, be, max(tef - tf, 0.0), max(tef_best - tf_best,
                                                      0.0))
    rows["fuse_labels"] = (ff, bf, tf, tf_best)

    out = {"model": name, "peak_flops": PEAK_FLOPS, "peak_bw": PEAK_BW}
    print(f"{'program':<12} {'TFLOP':>7} {'GB':>8} {'t_comp':>8} {'t_mem':>8}"
          f" {'bound':>6} {'meas':>8} {'best':>8} {'%roof':>6}")
    for k, (fl, by, tm, tb) in rows.items():
        t_comp = fl / PEAK_FLOPS
        t_mem = by / PEAK_BW
        bound = "mem" if t_mem > t_comp else "comp"
        roof = max(t_comp, t_mem)
        pct = 100.0 * roof / tm
        print(f"{k:<12} {fl/1e12:7.3f} {by/1e9:8.2f} {t_comp:8.4f} "
              f"{t_mem:8.4f} {bound:>6} {tm:8.4f} {tb:8.4f} {pct:5.1f}%")
        out[k] = dict(tflop=fl / 1e12, gb=by / 1e9, t_comp=t_comp,
                      t_mem=t_mem, bound=bound, t_meas=tm, t_best=tb,
                      pct_of_roofline=pct)

    # sweep ceiling if every program ran AT its roofline
    roof_sweep = (max(out["encode"]["t_comp"], out["encode"]["t_mem"])
                  + N_MASKS * max(out["fuse_labels"]["t_comp"],
                                  out["fuse_labels"]["t_mem"]))
    meas_sweep = out["encode"]["t_meas"] + N_MASKS * out["fuse_labels"]["t_meas"]
    out["sweep_roofline_mask_cases_per_s"] = N_MASKS / roof_sweep
    out["sweep_measured_serial_mask_cases_per_s"] = N_MASKS / meas_sweep
    print(f"sweep ceiling at roofline: {N_MASKS / roof_sweep:.2f} "
          f"mask-cases/s; serial measured: {N_MASKS / meas_sweep:.2f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
