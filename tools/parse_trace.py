"""Summarize a jax.profiler trace: per-kernel device time.

Usage: python tools/parse_trace.py /tmp/duckprof [top_n]

Finds the newest plugins/profile/*/\*.trace.json.gz under the given dir,
aggregates event durations on the device-compute lines, and prints the top
kernels by total time with their share of the trace's busy span.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/duckprof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(
        glob.glob(os.path.join(root, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    if not paths:
        print("no trace found under", root)
        return
    path = paths[-1]
    print("trace:", path)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # map pid/tid -> line name to keep only device compute lines
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
    totals = collections.Counter()
    counts = collections.Counter()
    t_min, t_max = None, None
    for e in events:
        if e.get("ph") != "X":
            continue
        line = names.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" not in line and "Steps" not in line and "TensorFlow Op" not in line:
            # keep op-level lines only; fall back to any line containing 'fusion'
            if "Ops" not in line:
                continue
        name = e.get("name", "?")
        dur = e.get("dur", 0)
        totals[name] += dur
        counts[name] += 1
        ts = e.get("ts", 0)
        t_min = ts if t_min is None else min(t_min, ts)
        t_max = max(t_max or 0, ts + dur)
    grand = sum(totals.values())
    print(f"total device-op time: {grand/1e3:.2f} ms across {sum(counts.values())} events")
    if t_min is not None:
        print(f"trace span: {(t_max - t_min)/1e3:.2f} ms")
    print(f"{'us_total':>10} {'n':>6} {'us_avg':>9}  name")
    for name, us in totals.most_common(top_n):
        print(f"{us:>10} {counts[name]:>6} {us/counts[name]:>9.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
