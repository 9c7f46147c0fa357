#!/usr/bin/env python
"""Per-op roofline table for the per-mask FUSE program of the 15-mask sweep.

VERDICT r4 weak #1: the fuse pass runs at ~52% of its program-level memory
roofline, but only ~95 ms of the 285 ms pass was accounted op-by-op. This
script produces the missing per-op table:

  * runs the shipped fuse-labels program (mmFormer, auto wb=75, bf16) under
    `jax.profiler.trace` and aggregates per-HLO-op device SELF times on the
    "XLA Ops" lane (additive — the Async lane's copy-starts overlap compute
    and the Modules lane is the whole program);
  * computes each op's memory floor from the operand/result shapes embedded
    in its HLO long name (output + sum of operands, bytes / 819 GB/s) — a
    floor estimate: it ignores re-reads and counts whole operands that a
    fusion may only slice;
  * for convolution-shaped fusions (a (k,k,k,I,O) operand whose O matches
    the result minor dim) also computes the compute floor at the bf16 peak
    AND at the lane-limited MXU ceiling (O < 128 output channels fill O/128
    of the MXU lanes — the r4 shape-ceiling argument, PROFILE.md);
  * prints measured ms vs the binding floor, sorted by measured time, and
    flags every op >= `flag_ms` ms running under 80% of that floor.

Run on the real chip: python scripts/fuse_op_table.py [model] [reps] [top_n]
"""

from __future__ import annotations

import os
import re
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_BW = 819e9      # v5e HBM bytes/s (BASELINE.md)
PEAK_FLOPS = 197e12  # v5e dense bf16

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "s4": 1, "u4": 1,
}

_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([\d,]*)\]")


def _shapes_in(text: str):
    """[(dtype, [dims...])] for every shape token in an HLO long name."""
    out = []
    for dt, dims in _SHAPE_RE.findall(text):
        out.append((dt, [int(d) for d in dims.split(",")] if dims else []))
    return out


def op_floors(long_name: str):
    """(bytes, conv_flops or 0) for one HLO op long name.

    The long name is `%name = OUTSHAPE op(INSHAPE %a, INSHAPE %b, ...), ...`:
    the first shape is the result, the rest are operand shapes.
    """
    shapes = _shapes_in(long_name.split(", calls=")[0])
    if not shapes:
        return 0, 0, 0
    byts = sum(int(np.prod(dims or [1])) * _DTYPE_BYTES[dt]
               for dt, dims in shapes)
    out_dt, out_dims = shapes[0]
    conv_flops, out_ch = 0, 0
    if "convolution" in long_name or "fusion" in long_name:
        for dt, dims in shapes[1:]:
            if (len(dims) == 5 and dims[0] == dims[1] == dims[2]
                    and dims[0] <= 7 and out_dims
                    and dims[4] == out_dims[-1]):
                k3, ci, co = dims[0] ** 3, dims[3], dims[4]
                n_out = int(np.prod(out_dims)) // co
                conv_flops = 2 * n_out * k3 * ci * co
                out_ch = co
                break
    return byts, conv_flops, out_ch


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from passion_tpu.engine.sliding_window import SlidingWindowSweep
    from passion_tpu.models import get_model
    from scripts.xplane_stats import device_op_totals

    name = sys.argv[1] if len(sys.argv) > 1 else "mmformer"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    flag_ms = 5.0

    model = get_model(name, mask_type="idt", patch_size=80)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 80, 80, 80, 4), jnp.float32),
                        jnp.ones((1, 4), bool))
    engine = SlidingWindowSweep(model, num_cls=4, patch=80)
    vol = np.random.default_rng(0).standard_normal(
        (240, 240, 155, 4)).astype(np.float32)
    prepared = engine.prepare(vol)
    mask = jnp.asarray(np.ones((4,), bool))
    pack = prepared["xpad"].shape[2] % 4 == 0

    fts = engine.encode_case(params, prepared)

    def fuse_once():
        # np.asarray of the ~2.3 MB packed labels = the only reliable sync
        # on the axon tunnel (block_until_ready returns after dispatch)
        return np.asarray(engine._jit_fuse_labels(
            params, fts, prepared["wgt"], mask,
            cosets=prepared["cosets"], pack=pack))

    fuse_once()  # warm / compile
    t0 = time.perf_counter()
    for _ in range(3):
        fuse_once()
    wall = (time.perf_counter() - t0) / 3

    trace_dir = tempfile.mkdtemp(prefix="fuse_op_table_")
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            fuse_once()

    import glob
    pbs = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                           recursive=True))
    totals, _ = device_op_totals(pbs[-1])

    per_op = {}
    for (lane, op), (ps, occ) in totals.items():
        if lane != "XLA Ops":
            continue
        per_op[op] = (ps / 1e9 / reps, max(occ // reps, 1))
    dev_total = sum(v[0] for v in per_op.values())

    rows = []
    for op, (ms, occ) in per_op.items():
        byts, cflops, out_ch = op_floors(op)
        mem_floor = byts / PEAK_BW * 1e3 * occ
        comp_floor = cflops / PEAK_FLOPS * 1e3 * occ
        # lane-limited MXU ceiling for narrow-output convs (PROFILE.md r4)
        shape_floor = (cflops / (PEAK_FLOPS * min(out_ch, 128) / 128) * 1e3
                       * occ) if cflops else 0.0
        floor = max(mem_floor, comp_floor)
        rows.append((ms, occ, op, byts * occ, mem_floor, comp_floor,
                     shape_floor, floor))
    rows.sort(reverse=True)

    print(f"# fuse[{name}]: wall {wall*1e3:.1f} ms/pass, XLA-Ops device "
          f"timeline {dev_total:.1f} ms/pass, reps={reps}")
    print(f"{'meas':>7} {'x':>2} {'GB':>6} {'memfl':>6} {'cmpfl':>6} "
          f"{'shpfl':>6} {'%bind':>6}  op")
    acc = np.zeros(3)
    flagged = []
    for ms, occ, op, byts, mf, cf, sf, floor in rows[:top_n]:
        pct = 100.0 * floor / ms if ms and floor else 0.0
        pct_s = 100.0 * max(mf, sf) / ms if ms and (mf or sf) else 0.0
        acc += (ms, floor, max(mf, sf))
        mark = ""
        if ms >= flag_ms and floor and pct_s < 80.0:
            mark = "  <<< under-floor"
            flagged.append((op, ms, max(mf, sf)))
        short = re.sub(r"\{[^}]*\}", "", op)[:110]
        print(f"{ms:7.2f} {occ:2d} {byts/1e9:6.2f} {mf:6.2f} {cf:6.2f} "
              f"{sf:6.2f} {pct_s:5.1f}%  {short}{mark}")
    rest = dev_total - acc[0]
    print(f"{acc[0]:7.2f}           {acc[1]:6.2f}        {acc[2]:6.2f}"
          f"          TOP-{top_n} TOTAL (tail beyond top-{top_n}: "
          f"{rest:.1f} ms)")
    if flagged:
        print(f"\n{len(flagged)} op(s) >= {flag_ms} ms under 80% of their "
              "binding (mem/shape) floor:")
        for op, ms, fl in flagged:
            print(f"  - {ms:6.2f} ms (floor {fl:5.2f}) "
                  f"{re.sub(r'{[^}]*}', '', op)[:100]}")
    else:
        print(f"\nEvery op >= {flag_ms} ms runs >= 80% of its binding "
              "(mem or shape-limited-MXU) floor.")


if __name__ == "__main__":
    main()
