"""Trace-based device timing for jitted functions.

Wall-clock timing through the tunneled TPU is unreliable at sub-10ms
granularity (dispatch latency and async readback dominate), so this
measures on-device durations from a jax.profiler trace instead: each
candidate is jitted, warmed, run `iters` times under one trace, and the
per-call duration of its `jit_<name>` region is read out of the
trace.json the profiler writes.

Usage:
    from tools.tputime import device_time
    dt = device_time("mlp2d", fn, args, iters=10)   # seconds per call
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import tempfile

import jax


def _region_times(tracedir: str) -> dict[str, tuple[float, int]]:
    """Aggregate (total_us, count) of jit_* regions on the device track."""
    files = glob.glob(os.path.join(tracedir, "plugins/profile/*/*.trace.json.gz"))
    agg: dict[str, list[float]] = collections.defaultdict(lambda: [0.0, 0])
    for path in files:
        with gzip.open(path) as f:
            data = json.load(f)
        device_pids = {
            e["pid"]
            for e in data["traceEvents"]
            if e.get("ph") == "M"
            and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))
        }
        for e in data["traceEvents"]:
            if (
                e.get("ph") == "X"
                and e.get("pid") in device_pids
                and str(e.get("name", "")).startswith("jit_")
            ):
                name = e["name"].split("(")[0]
                agg[name][0] += e.get("dur", 0)
                agg[name][1] += 1
    return {k: (v[0], v[1]) for k, v in agg.items()}


def device_time(name: str, fn, args: tuple, iters: int = 10) -> float:
    """On-device seconds per call of jit(fn), measured via a profiler trace."""
    # Name the jit region (it shows up as jit_<name> in the device trace)
    # by giving the traced function the right __name__.
    def named(*a):
        return fn(*a)

    named.__name__ = name
    run = jax.jit(named)
    out = run(*args)
    jax.block_until_ready(out)
    tracedir = tempfile.mkdtemp(prefix="tputime_")
    try:
        jax.profiler.start_trace(tracedir)
        for _ in range(iters):
            out = run(*args)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        regions = _region_times(tracedir)
        key = f"jit_{name}"
        if key not in regions:
            raise RuntimeError(f"region {key} not in trace: {sorted(regions)}")
        total_us, count = regions[key]
        return total_us / count / 1e6
    finally:
        shutil.rmtree(tracedir, ignore_errors=True)


def compare(cases: dict[str, tuple], iters: int = 10) -> dict[str, float]:
    """Time several (fn, args) cases; returns seconds per call each."""
    out = {}
    for name, (fn, args) in cases.items():
        out[name] = device_time(name, fn, args, iters=iters)
        print(f"{name:32s} {out[name]*1e3:9.3f} ms")
    return out
