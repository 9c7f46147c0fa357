#!/usr/bin/env python
"""Benchmark: BraTS sliding-window inference throughput (cases/sec/chip).

Protocol (BASELINE.md): one full 240x240x155 BraTS case evaluated with the
reference's 80-cube 50%-overlap sliding window (75 windows/case,
code/utils/predict.py:182-215) through the flagship mmFormer backbone —
the inner loop of the 15-combination x 100-case evaluation sweep.

Baseline: the reference publishes no numbers. The comparison constant below
is an analytic estimate of the PyTorch reference on its documented hardware
(1x RTX 3090, README.md:41-44): mmFormer inference at 80^3 batch-1 costs
~70 ms/window on a 3090 (35-layer 3D conv encoder stack at 8..128 channels +
505-token transformer), i.e. ~5.3 s -> ~0.19 cases/sec for the 75-window
loop. We use 0.2 cases/sec; `vs_baseline` = measured / 0.2.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_CASES_PER_SEC = 0.2  # estimated RTX-3090 reference throughput (see above)
VOLUME_SHAPE = (240, 240, 155)
PATCH = 80
TIMED_PASSES = 3


def main():
    import jax
    import jax.numpy as jnp

    from passion_tpu.engine.sliding_window import SlidingWindowInference
    from passion_tpu.models import get_model

    model = get_model("mmformer", mask_type="idt", patch_size=PATCH)
    x_init = jnp.zeros((1, PATCH, PATCH, PATCH, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x_init, jnp.ones((1, 4), bool))

    engine = SlidingWindowInference(model.apply, num_cls=4, patch=PATCH,
                                    window_batch=16)  # bf16 serving dtype
    rng = np.random.default_rng(0)
    vol = rng.standard_normal(VOLUME_SHAPE + (4,)).astype(np.float32)
    mask = np.array([True, True, True, True])

    # The volume lives on device for the whole 15-mask sweep in real
    # evaluation (evaluator.run_test_sweep), so the timed unit is one
    # windowed pass returning argmax labels (the evaluation consumable).
    prepared = engine.prepare(vol)
    out = engine.infer_labels(params, prepared, mask)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(TIMED_PASSES):
        out = engine.infer_labels(params, prepared, mask)
    elapsed = time.perf_counter() - t0
    cases_per_sec = TIMED_PASSES / elapsed

    assert out.shape == VOLUME_SHAPE and out.dtype == np.uint8
    print(json.dumps({
        "metric": "brats_sliding_window_inference",
        "value": round(cases_per_sec, 4),
        "unit": "cases/sec/chip (mmFormer, 240x240x155, 75x80^3 windows)",
        "vs_baseline": round(cases_per_sec / REF_CASES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
