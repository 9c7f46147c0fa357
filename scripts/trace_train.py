#!/usr/bin/env python
"""Capture a jax.profiler trace of the jitted PASSION train step and print
the top HLO ops by self time (xprof converter) — the evidence base for
PROFILE.md's Pallas decisions.

Usage: python scripts/trace_train.py [model] [batch_size] [outdir]
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    # Share bench.py's persistent compile cache: the 80^3 PASSION train-step
    # compile through the axon tunnel can exceed 20 min cold.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from passion_tpu.engine.schedule import make_optimizer, set_learning_rate
    from passion_tpu.engine.train_loop import make_train_step
    from passion_tpu.models import get_model, init_params

    name = sys.argv[1] if len(sys.argv) > 1 else "mmformer"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/train_trace"

    model = get_model(name, mask_type="idt", patch_size=80)
    params = init_params(model, jax.random.PRNGKey(0), patch_size=80)
    tx = make_optimizer()
    opt_state = set_learning_rate(tx.init(params), 2e-4)
    step = make_train_step(model, tx, use_passion=True,
                           with_dropout=(name != "rfnet"))
    rng = np.random.default_rng(0)
    lab = rng.integers(0, 4, size=(bs, 80, 80, 80))
    batch = {
        "x": jnp.asarray(rng.standard_normal((bs, 80, 80, 80, 4)),
                         jnp.float32),
        "target": jnp.asarray(np.eye(4, dtype=np.float32)[lab]),
        "mask": jnp.ones((bs, 4), bool),
    }
    args = (jnp.ones((4,), jnp.float32), jnp.ones((4,), jnp.float32),
            jnp.asarray(4.0, jnp.float32))
    key = jax.random.PRNGKey(1)
    params, opt_state, m = step(params, opt_state, batch, *args, key, False)
    _ = float(m["loss"])  # compile + settle outside the trace
    with jax.profiler.trace(outdir):
        for _ in range(3):
            key, sub = jax.random.split(key)
            params, opt_state, m = step(params, opt_state, batch, *args,
                                        sub, False)
        _ = float(m["loss"])
    print("trace captured", outdir)

    xplanes = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane files found")
        return
    # aggregate with the pure-python XPlane reader (the shipped
    # tensorboard-plugin-profile converter's generated protos are
    # binary-incompatible with this environment's protobuf)
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run([sys.executable, os.path.join(here, "xplane_stats.py"),
                    xplanes[0], "60"], check=False)
    print("full dump: python scripts/xplane_stats.py", xplanes[0], "100000")


if __name__ == "__main__":
    main()
