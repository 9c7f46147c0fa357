#!/usr/bin/env python
"""Per-op roofline table for the per-mask FUSE program of the 15-mask sweep.

VERDICT r4 weak #1: the fuse pass runs at ~52% of its program-level memory
roofline, but only ~95 ms of the 285 ms pass was accounted op-by-op. This
script produces the missing per-op table:

  * runs the shipped fuse-labels program (mmFormer, auto wb=75, bf16) under
    `jax.profiler.trace` and aggregates per-HLO-op device self times
    (scripts/xplane_stats.py reader);
  * parses the COMPILED HLO text for the same executable and computes each
    top-level op's bytes = |output| + sum |operands| (shape arithmetic —
    the standard bytes-accessed floor for a fused op; it slightly
    UNDER-counts ops that re-read an operand and OVER-counts fusions that
    only read a slice, so it is a floor estimate, not an exact measure);
  * joins the two on HLO op name and prints measured ms vs memory-floor ms
    (bytes / 819 GB/s) per op, sorted by measured time, with a flag on
    every op >= `flag_ms` running under 80% of its floor.

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

PEAK_BW = 819e9  # v5e HBM bytes/s (BASELINE.md)

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "token": 0, "opaque": 0, "s4": 1, "u4": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_INSTR_RE = re.compile(r"^\s+(?:ROOT\s+)?%?([\w\.\-]+)\s+=\s+(.+)$")


def _shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string (handles tuples by summing)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_hlo_bytes(hlo_text: str):
    """name -> (out_bytes, [operand names]) over ALL computations."""
    sizes: dict[str, int] = {}
    operands: dict[str, list] = {}
    for line in hlo_text.splitlines():
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, rhs = m.groups()
        # rhs: "bf16[75,40,40,40,64]{4,3,2,1,0} fusion(%a, %b), kind=..."
        # type string ends at the first space after the layout braces
        tm = re.match(r"^(\(?[\w\[\],\{\} ]*?\)?)\s+([a-z][\w\-]*)\(", rhs)
        if not tm:
            continue
        type_str, _op = tm.groups()
        sizes[name] = _shape_bytes(type_str)
        # operand names: %name tokens inside the first (...) argument list
        args = rhs[rhs.index("("):]
        ops = re.findall(r"%([\w\.\-]+)", args)
        # keep only operands that are instruction names (filters metadata)
        operands[name] = ops
    return sizes, operands


def op_floor_bytes(name: str, sizes: dict, operands: dict) -> int:
    outs = sizes.get(name, 0)
    ins = sum(sizes.get(o, 0) for o in operands.get(name, [])
              if o in sizes)
    return outs + ins


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
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 45
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

    # compiled HLO for the byte floors
    lowered = engine._jit_fuse_labels.lower(
        params, fts, prepared["wgt"], mask,
        cosets=prepared["cosets"], pack=pack)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    sizes, operands = parse_hlo_bytes(hlo)
    ca = compiled.cost_analysis()
    prog_bytes = float(ca.get("bytes accessed", 0.0))

    trace_dir = tempfile.mkdtemp(prefix="fuse_op_table_")
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            fuse_once()

    import glob
    pbs = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                           recursive=True))
    totals, lane_totals = device_op_totals(pbs[-1])

    # aggregate across lanes by op name, per rep
    per_op = defaultdict(lambda: [0.0, 0])
    for (_lane, op), (ps, occ) in totals.items():
        per_op[op][0] += ps / 1e9 / reps   # ms per fuse pass
        per_op[op][1] += occ // reps or occ
    dev_total = sum(v[0] for v in per_op.values())

    rows = []
    for op, (ms, occ) in per_op.items():
        base = op.split(" ")[0].lstrip("%")
        byts = op_floor_bytes(base, sizes, operands)
        floor = byts / PEAK_BW * 1e3 * max(occ, 1) if byts else 0.0
        rows.append((ms, occ, op, byts, floor))
    rows.sort(reverse=True)

    print(f"# fuse program: wall {wall*1e3:.1f} ms/pass, device timeline "
          f"{dev_total:.1f} ms/pass, cost-analysis bytes "
          f"{prog_bytes/1e9:.1f} GB -> program floor "
          f"{prog_bytes/PEAK_BW*1e3:.1f} ms")
    print(f"{'meas ms':>8} {'x':>3} {'GB':>7} {'floor':>7} {'%floor':>7}  op")
    acc_ms = acc_floor = 0.0
    flagged = []
    for ms, occ, op, byts, floor in rows[:top_n]:
        pct = 100.0 * floor / ms if ms else 0.0
        acc_ms += ms
        acc_floor += floor
        mark = ""
        if ms >= flag_ms and floor and pct < 80.0:
            mark = "  <<< under-floor"
            flagged.append(op)
        print(f"{ms:8.2f} {occ:3d} {byts*occ/1e9:7.2f} {floor:7.2f} "
              f"{pct:6.1f}%  {op[:90]}{mark}")
    rest = dev_total - acc_ms
    print(f"{acc_ms:8.2f}     {'':7} {acc_floor:7.2f}          TOP-{top_n} "
          f"TOTAL ({rest:.1f} ms in remaining tail ops)")
    if flagged:
        print(f"\n{len(flagged)} op(s) >= {flag_ms} ms under 80% of their "
              "memory floor:")
        for op in flagged:
            print(f"  - {op[:110]}")
    else:
        print(f"\nEvery op >= {flag_ms} ms runs >= 80% of its memory floor.")


if __name__ == "__main__":
    main()
