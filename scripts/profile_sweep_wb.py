#!/usr/bin/env python
"""Measure SlidingWindowSweep throughput vs window_batch on the real chip.

The 50%-overlap window protocol yields 75 windows per 240x240x155 case
(predict.py:182-195 in the reference); window_batch=16 pads to 80 windows
(6.7% structural waste), wb=15/25 divide 75 evenly. This harness times the
exact bench.py sweep protocol (15-mask sweep_labels, mean + best of N) per
wb so the default can be chosen from measurement (PROFILE.md open item).

Measured (v5e, mean/best of 5): wb=16 1.84/1.96, wb=15 1.97/1.98,
wb=25 2.02/2.03, wb=50 1.91/1.91, wb=75 2.83/2.92 mask-cases/s — one
chunk per case wins; the engine default is now auto (PROFILE.md).

Usage: python scripts/profile_sweep_wb.py [wb1 wb2 ...]   (default: 16 25 75)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from passion_tpu.engine.sliding_window import SlidingWindowSweep
    from passion_tpu.masks import MASK_ARRAY
    from passion_tpu.models import get_model, init_params

    wbs = [int(a) for a in sys.argv[1:]] or [16, 25, 75]
    PATCH = 80
    model = get_model("mmformer", mask_type="idt", patch_size=PATCH)
    params = init_params(model, jax.random.PRNGKey(0), patch_size=PATCH)
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((240, 240, 155, 4)).astype(np.float32)
    masks = [np.asarray(m) for m in MASK_ARRAY]

    for wb in wbs:
        engine = SlidingWindowSweep(model, num_cls=4, patch=PATCH,
                                    window_batch=wb)
        prepared = engine.prepare(vol)
        t0 = time.perf_counter()
        out = engine.sweep_labels(params, prepared, masks)  # compile+warmup
        t_compile = time.perf_counter() - t0
        assert len(out) == 15
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            engine.sweep_labels(params, prepared, masks)
            times.append(time.perf_counter() - t0)
        best, mean = min(times), float(np.mean(times))
        print(f"wb={wb:3d}: compile+warm {t_compile:6.1f}s  "
              f"mean {15 / mean:.3f} best {15 / best:.3f} mask-cases/s  "
              f"(per-sweep mean {mean:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
