"""Summarize a jax.profiler Chrome trace: top device ops by total duration.

The axon tunnel makes host-side wall-clock unreliable (see memory notes), so
device-side traces are the ground truth for kernel time.

Usage:
    python -m keymorph_tpu.tools.trace_summary <trace_dir_or_json_gz> [top_n]

Library:
    profile_fn(fn, *args) -> (result, summary_list)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict


def find_trace_file(path: str):
    if path.endswith(".json.gz") or path.endswith(".json"):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True)
    )
    return hits[-1] if hits else None


def summarize_trace(trace_path: str, top_n: int = 20):
    """Return [(op_name, total_ms, count)] sorted by device time."""
    opener = gzip.open if trace_path.endswith(".gz") else open
    with opener(trace_path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # device lanes: TPU/device PIDs; find process names
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if any(k in name.lower() for k in ("tpu", "device", "/device", "xla")):
                device_pids.add(e["pid"])
    totals = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and (not device_pids or e.get("pid") in device_pids):
            name = e.get("name", "?")
            totals[name] += e.get("dur", 0) / 1000.0  # us -> ms
            counts[name] += 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]
    return [(name, ms, counts[name]) for name, ms in rows]


def profile_fn(fn, *args, top_n: int = 20, trace_dir=None):
    """Run `fn(*args)` under a profiler trace; return (result, summary)."""
    import jax

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="kmtrace_")
    jax.profiler.start_trace(trace_dir)
    out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    trace = find_trace_file(trace_dir)
    if trace is None:
        return out, []
    return out, summarize_trace(trace, top_n)


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    trace = find_trace_file(path)
    if trace is None:
        print(f"no trace file under {path}")
        return
    print(f"trace: {trace}")
    total = 0.0
    for name, ms, count in summarize_trace(trace, top_n):
        total += ms
        print(f"{ms:10.2f} ms  x{count:<5d} {name[:100]}")
    print(f"{'':>10}  (top-{top_n} total {total:.1f} ms)")


if __name__ == "__main__":
    main()
