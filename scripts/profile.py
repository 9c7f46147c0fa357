#!/usr/bin/env python
"""jax.profiler tracing harness (SURVEY §5 tracing/profiling row).

Captures an XLA/TPU trace of the two hot paths — the sliding-window sweep
and the jitted PASSION train step — viewable in TensorBoard
(`tensorboard --logdir <outdir>`) or Perfetto.

Usage:
  python scripts/profile.py sweep  [outdir]   # 15-mask sweep of one case
  python scripts/profile.py train  [outdir]   # 3 PASSION train steps
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


def profile_sweep(outdir: str):
    import jax
    import jax.numpy as jnp

    from passion_tpu.engine.sliding_window import SlidingWindowSweep
    from passion_tpu.masks import MASK_ARRAY
    from passion_tpu.models import get_model

    model = get_model("mmformer", mask_type="idt", patch_size=80)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 80, 80, 80, 4), jnp.float32),
                        jnp.ones((1, 4), bool))
    # auto window_batch (None): same one-chunk-per-case program bench.py
    # and eval.py run — keep the trace representative of the shipped config
    engine = SlidingWindowSweep(model, num_cls=4, patch=80)
    vol = np.random.default_rng(0).standard_normal(
        (240, 240, 155, 4)).astype(np.float32)
    masks = [np.asarray(m) for m in MASK_ARRAY]
    prepared = engine.prepare(vol)
    engine.sweep_labels(params, prepared, masks)  # compile outside the trace
    with jax.profiler.trace(outdir):
        engine.sweep_labels(params, prepared, masks)
    print(f"trace written to {outdir}")


def profile_train(outdir: str, batch_size: int = 2):
    import jax
    import jax.numpy as jnp

    from passion_tpu.engine.schedule import make_optimizer, set_learning_rate
    from passion_tpu.engine.train_loop import make_train_step
    from passion_tpu.models import get_model, init_params

    model = get_model("mmformer", mask_type="idt", patch_size=80)
    params = init_params(model, jax.random.PRNGKey(0), patch_size=80)
    tx = make_optimizer()
    opt_state = set_learning_rate(tx.init(params), 2e-4)
    step = make_train_step(model, tx, use_passion=True, with_dropout=True)
    rng = np.random.default_rng(0)
    lab = rng.integers(0, 4, size=(batch_size, 80, 80, 80))
    batch = {
        "x": jnp.asarray(rng.standard_normal(
            (batch_size, 80, 80, 80, 4)), jnp.float32),
        "target": jnp.asarray(np.eye(4, dtype=np.float32)[lab]),
        "mask": jnp.ones((batch_size, 4), bool),
    }
    args = (jnp.ones((4,), jnp.float32), jnp.ones((4,), jnp.float32),
            jnp.asarray(4.0, jnp.float32))
    key = jax.random.PRNGKey(1)
    params, opt_state, _ = step(params, opt_state, batch, *args, key, False)
    with jax.profiler.trace(outdir):
        for _ in range(3):
            key, sub = jax.random.split(key)
            params, opt_state, m = step(params, opt_state, batch, *args,
                                        sub, False)
        jax.block_until_ready(m["loss"])
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/passion_trace_{mode}"
    (profile_sweep if mode == "sweep" else profile_train)(outdir)
