#!/usr/bin/env python
"""Capture a jax.profiler trace of the per-mask fuse pass and print the top
HLO ops by self time (via the xprof/tensorboard-plugin-profile converter).

Usage: python scripts/trace_fuse.py [model] [wb] [outdir]
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from passion_tpu.engine.sliding_window import SlidingWindowSweep
    from passion_tpu.models import get_model

    name = sys.argv[1] if len(sys.argv) > 1 else "mmformer"
    wb = int(sys.argv[2]) if len(sys.argv) > 2 else None  # None = auto (wb=75)
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/fuse_trace"

    model = get_model(name, mask_type="idt", patch_size=80)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 80, 80, 80, 4), jnp.float32),
                        jnp.ones((1, 4), bool))
    engine = SlidingWindowSweep(model, num_cls=4, patch=80, window_batch=wb)
    vol = np.random.default_rng(0).standard_normal(
        (240, 240, 155, 4)).astype(np.float32)
    prepared = engine.prepare(vol)
    fts = engine.encode_case(params, prepared)
    mask = np.ones(4, bool)

    lab = engine.infer_labels_masked(params, prepared, fts, mask)  # compile
    with jax.profiler.trace(outdir):
        for _ in range(3):
            lab = engine.infer_labels_masked(params, prepared, fts, mask)
    print("trace captured", outdir, lab.shape)

    xplanes = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                        recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    out = os.path.join(outdir, "hlo_stats.json")
    with open(out, "w") as f:
        f.write(data)
    print("wrote", out, len(data))


if __name__ == "__main__":
    main()
