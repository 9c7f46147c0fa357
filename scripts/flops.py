#!/usr/bin/env python
"""XLA cost-analysis FLOP counts for the bench workloads.

Grounds bench.py's baselines (VERDICT r1 item 3): prints the compiled-model
FLOPs of (a) one full mmFormer inference forward on an 80^3 window — the
unit of work the REFERENCE executes 75x per mask-case on its RTX 3090
(predict.py:209-215) — and (b) our sweep engine's encode / per-mask fuse
programs and the PASSION train step, from which bench.py derives measured
MFU on the TPU chip.

Run on the bench device (TPU): `python scripts/flops.py`.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# share the compiled programs with bench.py / trace_train.py
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

PATCH = 80
VOLUME_SHAPE = (240, 240, 155)


def flops_of(jitted, *args, **kwargs) -> float:
    return float(jitted.lower(*args, **kwargs).compile().cost_analysis()["flops"])


def main():
    from passion_tpu.engine.sliding_window import SlidingWindowSweep
    from passion_tpu.models import get_model, init_params

    model = get_model("mmformer", mask_type="idt", patch_size=PATCH)
    params = init_params(model, jax.random.PRNGKey(0), patch_size=PATCH)

    out = {}

    # (a) one full single-window forward, batch 1 (the reference's unit)
    fwd = jax.jit(lambda p, x, m: model.apply(p, x, m))
    x1 = jnp.zeros((1, PATCH, PATCH, PATCH, 4), jnp.float32)
    m1 = jnp.ones((1, 4), bool)
    out["fwd_window_flops"] = flops_of(fwd, params, x1, m1)

    # (b) sweep engine programs at the bench config
    # auto window_batch: the shipped bench/eval configuration (one chunk
    # holding all 75 windows of the canonical case)
    engine = SlidingWindowSweep(model, num_cls=4, patch=PATCH)
    rng = np.random.default_rng(0)
    vol = rng.standard_normal(VOLUME_SHAPE + (4,)).astype(np.float32)
    prepared = engine.prepare(vol)
    out["sweep_encode_flops"] = flops_of(
        engine._jit_encode, params, prepared["xpad"], prepared["coords"])
    fts = engine.encode_case(params, prepared)
    mask = jnp.asarray(np.ones((4,), bool))
    out["sweep_fuse_flops_per_mask"] = flops_of(
        engine._jit_fuse, params, fts, prepared["wgt"], mask,
        cosets=prepared["cosets"], normalize=False)
    out["n_windows"] = int(prepared["n_windows"])

    # (c) PASSION train step (batch 1, canonical config)
    from passion_tpu.engine.schedule import make_optimizer, set_learning_rate
    from passion_tpu.engine.train_loop import make_train_step

    tx = make_optimizer()
    opt_state = set_learning_rate(tx.init(params), 2e-4)
    step = make_train_step(model, tx, use_passion=True, with_dropout=True)
    lab = rng.integers(0, 4, size=(1, PATCH, PATCH, PATCH))
    batch = {
        "x": jnp.zeros((1, PATCH, PATCH, PATCH, 4), jnp.float32),
        "target": jnp.asarray(np.eye(4, dtype=np.float32)[lab]),
        "mask": jnp.asarray(np.ones((1, 4), bool)),
    }
    out["train_step_flops"] = flops_of(
        step, params, opt_state, batch, jnp.ones((4,), jnp.float32),
        jnp.ones((4,), jnp.float32), jnp.asarray(4.0, jnp.float32),
        jax.random.PRNGKey(1), warmup=False)

    out["device_kind"] = jax.devices()[0].device_kind
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
