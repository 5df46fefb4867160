#!/usr/bin/env python
"""Summarize a jax.profiler xplane.pb trace: top XLA ops by device time.

Pure-python wire-format parser (no tensorflow / tbp dependency — the
tensorboard_plugin_profile converter is incompatible with the TF build on
this image). Decodes just enough of the XSpace proto:

  XSpace.planes(1) -> XPlane{name(2), lines(3), event_metadata(4)}
  XLine{name(2), events(4)} -> XEvent{metadata_id(1), duration_ps(3)}
  XEventMetadata map entry -> {key(1), value(2)=XEventMetadata{id(1), name(2)}}

Usage: python tools/xplane_summary.py <trace.xplane.pb> [top_n] [steps]
"""
from __future__ import annotations

import sys
from collections import defaultdict


def _varint(buf: bytes, i: int):
    x = 0
    shift = 0
    while True:
        b = buf[i]
        x |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return x, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) for a proto message body."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, i = _varint(buf, i)
        elif wt == 1:  # 64-bit
            v, i = buf[i:i + 8], i + 8
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:  # 32-bit
            v, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def parse_planes(space: bytes):
    for field, _, v in _fields(space):
        if field == 1:
            yield v


def summarize_plane(plane: bytes):
    name = ""
    ev_names = {}
    op_time = defaultdict(float)
    op_count = defaultdict(int)
    lines = []
    for field, _, v in _fields(plane):
        if field == 2:
            name = v.decode(errors="replace")
        elif field == 4:  # event_metadata map entry
            meta_id, meta_name = 0, ""
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    meta_id = v2
                elif f2 == 2:  # XEventMetadata
                    for f3, _, v3 in _fields(v2):
                        if f3 == 2:
                            meta_name = v3.decode(errors="replace")
            ev_names[meta_id] = meta_name
        elif field == 3:
            lines.append(v)
    for line in lines:
        line_name = ""
        events = []
        for f2, _, v2 in _fields(line):
            if f2 == 2:
                line_name = v2.decode(errors="replace")
            elif f2 == 4:
                events.append(v2)
        # exact match: the device plane also carries an "Async XLA Ops" line
        # whose copy-start durations span their wait time — summing it
        # inflates totals ~10x (events overlap the synchronous timeline)
        if line_name != "XLA Ops":
            continue
        for ev in events:
            mid = dur = 0
            for f3, _, v3 in _fields(ev):
                if f3 == 1:
                    mid = v3
                elif f3 == 3:
                    dur = v3
            op_time[ev_names.get(mid, f"#{mid}")] += dur / 1e9  # ps -> ms
            op_count[ev_names.get(mid, f"#{mid}")] += 1
    return name, op_time, op_count


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    space = open(path, "rb").read()
    for plane in parse_planes(space):
        name, op_time, op_count = summarize_plane(plane)
        if not op_time:
            continue
        total = sum(op_time.values())
        print(f"== {name}: {total / steps:.1f} ms/step XLA-op time "
              f"({len(op_time)} distinct ops)")
        for op, ms in sorted(op_time.items(), key=lambda x: -x[1])[:top_n]:
            print(f"  {ms / steps:9.3f} ms/step {100 * ms / total:5.1f}% "
                  f"x{op_count[op] // steps:<5d} {op[:100]}")


if __name__ == "__main__":
    main()
