#!/usr/bin/env python
"""Minimal pure-python XSpace/XPlane trace reader.

`jax.profiler.trace` writes `*.xplane.pb` (the XLA profiler's XSpace proto).
The shipped tensorboard-plugin-profile converter is binary-incompatible with
this environment's TF, so this module decodes the proto with a hand-rolled
varint wire parser (the schema is small and stable:
xla/tsl/profiler/protobuf/xplane.proto) and prints per-op aggregate self
times for the TPU device plane — the evidence base for PROFILE.md.

Usage:
  python scripts/xplane_stats.py <trace_dir_or_xplane.pb> [top_n]

Output: one line per HLO op name aggregated over occurrences, sorted by
total duration, with the line (lane) it ran on, plus per-lane totals.
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


def _read_varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a serialized message."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wt == 1:  # fixed64
            val, i = buf[i:i + 8], i + 8
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            val, i = buf[i:i + ln], i + ln
        elif wt == 5:  # fixed32
            val, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _parse_event(buf):
    meta_id = dur_ps = 0
    occ = 1
    for f, _, v in _fields(buf):
        if f == 1:
            meta_id = v
        elif f == 3:
            dur_ps = v
        elif f == 5:
            occ = v
    return meta_id, dur_ps, occ


def _parse_line(buf):
    name = ""
    events = []
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 11 and not name:
            name = v.decode("utf-8", "replace")
        elif f == 4:
            events.append(_parse_event(v))
    return name, events


def _parse_event_metadata(buf):
    mid = 0
    name = ""
    for f, _, v in _fields(buf):
        if f == 1:
            mid = v
        elif f == 2:
            name = v.decode("utf-8", "replace")
    return mid, name


def _parse_metadata_entry(buf):
    """map<int64, XEventMetadata> entry."""
    key = 0
    val = (0, "")
    for f, _, v in _fields(buf):
        if f == 1:
            key = v
        elif f == 2:
            val = _parse_event_metadata(v)
    return key, val


def _parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3:
            lines.append(_parse_line(v))
        elif f == 4:
            k, (mid, mname) = _parse_metadata_entry(v)
            meta[k or mid] = mname
    return name, lines, meta


def parse_xspace(path):
    """Returns [(plane_name, [(line_name, [(meta_id, dur_ps, occ)])], meta)]."""
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for f_, _, v in _fields(buf):
        if f_ == 1:
            planes.append(_parse_plane(v))
    return planes


def device_op_totals(path, device_substr="TPU"):
    """Aggregate event durations per (line, op name) on device planes.

    Returns (totals, lane_totals): totals maps (line_name, op_name) ->
    [total_ps, occurrences]; lane_totals maps line_name -> total_ps.
    """
    totals = defaultdict(lambda: [0, 0])
    lane_totals = defaultdict(int)
    for pname, lines, meta in parse_xspace(path):
        if device_substr not in pname:
            continue
        for lname, events in lines:
            for mid, dur, occ in events:
                op = meta.get(mid, f"#{mid}")
                totals[(lname, op)][0] += dur
                totals[(lname, op)][1] += occ
                lane_totals[lname] += dur
    return totals, lane_totals


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    if os.path.isdir(target):
        pbs = sorted(glob.glob(os.path.join(target, "**", "*.xplane.pb"),
                               recursive=True))
        if not pbs:
            raise SystemExit(f"no xplane.pb under {target}")
        target = pbs[-1]  # newest session
    print(f"# {target}")
    totals, lane_totals = device_op_totals(target)
    if not totals:
        # CPU-only trace: fall back to host planes
        totals, lane_totals = device_op_totals(target, device_substr="")
    print("\n== lane totals ==")
    for lname, ps in sorted(lane_totals.items(), key=lambda kv: -kv[1]):
        print(f"{ps / 1e9:12.3f} ms  {lname}")
    print(f"\n== top {top_n} ops by total time ==")
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])[:top_n]
    for (lname, op), (ps, occ) in rows:
        print(f"{ps / 1e9:12.3f} ms  x{occ:<6d} [{lname}] {op}")


if __name__ == "__main__":
    main()
