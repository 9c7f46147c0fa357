#!/usr/bin/env python
"""Roofline accounting for the PASSION train step (VERDICT r4 missing #3).

Mirrors scripts/roofline_sweep.py for the training hot loop
(/root/reference/code/train.py:198-321 rebuild, engine/train_loop.py): from
the COMPILED step executable it reports XLA cost-analysis FLOPs and bytes
accessed, the compute floor (bf16 peak) and memory floor (HBM bandwidth),
which one binds, the measured step time, and % of the binding roofline —
swept over the three decoder remat policies (none / conv / full), since the
policy trades recompute FLOPs for residual bytes and the roofline is the
honest way to compare them (not just wall clock).

Run on the real chip:
  python scripts/roofline_train.py [model] [batch]        # current policy
  PASSION_DECODER_REMAT=conv python scripts/roofline_train.py   # pin one
(each policy is a separate process: the remat mode is read at import).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PATCH = 80
PEAK_FLOPS = 197e12  # v5e dense bf16
PEAK_BW = 819e9      # v5e HBM


def measure(name: str, batch_size: int):
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from passion_tpu.engine.schedule import make_optimizer, set_learning_rate
    from passion_tpu.engine.train_loop import make_train_step
    from passion_tpu.models import get_model, init_params

    model = get_model(name, mask_type="idt", patch_size=PATCH)
    params = init_params(model, jax.random.PRNGKey(0), patch_size=PATCH)
    tx = make_optimizer()
    opt_state = set_learning_rate(tx.init(params), 2e-4)
    step = make_train_step(model, tx, use_passion=True, with_dropout=True)

    rng = np.random.default_rng(0)
    lab = rng.integers(0, 4, size=(batch_size, PATCH, PATCH, PATCH))
    masks = np.ones((batch_size, 4), bool)
    masks[0, :2] = [True, False]
    batch = {
        "x": jnp.asarray(rng.standard_normal(
            (batch_size, PATCH, PATCH, PATCH, 4)), jnp.float32),
        "target": jnp.asarray(np.eye(4, dtype=np.float32)[lab]),
        "mask": jnp.asarray(masks),
    }
    beta = jnp.ones((4,), jnp.float32)
    w = jnp.ones((4,), jnp.float32)
    temp = jnp.asarray(4.0, jnp.float32)
    key = jax.random.PRNGKey(1)

    # cost analysis of the compiled (non-donated re-trace would differ) step
    lowered = step.lower(params, opt_state, batch, beta, w, temp, key, False)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    state = {"params": params, "opt": opt_state, "key": key}

    def run(n):
        m = None
        for _ in range(n):
            state["key"], sub = jax.random.split(state["key"])
            state["params"], state["opt"], m = step(
                state["params"], state["opt"], batch, beta, w, temp, sub,
                False)
        # loss fetch = the only reliable device sync on the axon tunnel
        return float(m["loss"])

    run(2)  # warm
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        run(5)
        times.append((time.perf_counter() - t0) / 5)
    t_meas = float(np.mean(times))
    t_best = float(np.min(times))

    t_comp = flops / PEAK_FLOPS
    t_mem = byts / PEAK_BW
    bound = "mem" if t_mem > t_comp else "comp"
    roof = max(t_comp, t_mem)
    out = dict(
        model=name, batch=batch_size,
        remat=os.environ.get("PASSION_DECODER_REMAT", "conv"),
        tflop=flops / 1e12, gb=byts / 1e9,
        t_comp_ms=t_comp * 1e3, t_mem_ms=t_mem * 1e3, bound=bound,
        t_meas_ms=t_meas * 1e3, t_best_ms=t_best * 1e3,
        steps_per_s=1.0 / t_meas,
        pct_of_roofline=100.0 * roof / t_meas,
        mfu=flops / t_meas / PEAK_FLOPS,
    )
    print(json.dumps(out))
    return out


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "mmformer"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    if os.environ.get("PASSION_DECODER_REMAT"):
        measure(name, batch)
        return
    # sweep the three policies in child processes (module-level flag)
    for mode in ("none", "conv", "full"):
        env = dict(os.environ, PASSION_DECODER_REMAT=mode)
        print(f"--- remat={mode}", flush=True)
        subprocess.run([sys.executable, os.path.abspath(__file__), name,
                        str(batch)], env=env, check=False)


if __name__ == "__main__":
    main()
