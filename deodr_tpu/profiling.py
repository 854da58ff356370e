"""Device-side profiling helpers.

The reference ships no profiling tooling (SURVEY.md §5: artifacts of external
profiler runs only). On TPU the useful observable is per-kernel *device* time
— host wall-clock through a tunneled or busy host can be several times the
device time and is the wrong signal for optimization. This module wraps
``jax.profiler`` and digests its trace into a per-op device-time table.

Usage::

    from deodr_tpu.profiling import device_profile

    with device_profile() as prof:
        out = step(params)          # jitted work
        jax.block_until_ready(out)
    print(prof.report(top=10))      # per-op device µs
    prof.times                      # {op_name: total_us}
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import shutil
import tempfile
from contextlib import contextmanager
from typing import Dict, Optional


class DeviceProfile:
    """Result of a :func:`device_profile` block."""

    def __init__(self) -> None:
        self.times: Dict[str, float] = {}  # op name -> total device us
        self.counts: Dict[str, int] = {}
        self.total_us: float = 0.0

    def _ingest(self, trace_dir: str) -> None:
        files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
        dur: collections.Counter = collections.Counter()
        cnt: collections.Counter = collections.Counter()
        total = 0.0
        for f in files:
            with gzip.open(f) as fh:
                data = json.load(fh)
            ev = data.get("traceEvents", [])
            pids = {
                e["pid"]: e["args"].get("name", "")
                for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
            }
            tids = {
                (e["pid"], e.get("tid")): e["args"].get("name", "")
                for e in ev
                if e.get("ph") == "M" and e.get("name") == "thread_name"
            }
            for e in ev:
                if e.get("ph") != "X" or "dur" not in e:
                    continue
                pname = pids.get(e["pid"], "")
                if "TPU" not in pname and "GPU" not in pname:
                    continue
                lane = tids.get((e["pid"], e.get("tid")), "")
                if lane == "XLA Ops":
                    dur[e["name"]] += e["dur"]
                    cnt[e["name"]] += 1
                elif lane == "XLA Modules":
                    total += e["dur"]
        self.times = dict(dur)
        self.counts = dict(cnt)
        self.total_us = total

    def report(self, top: int = 15, min_us: float = 1.0) -> str:
        rows = sorted(self.times.items(), key=lambda kv: -kv[1])
        lines = [f"device total: {self.total_us:.0f} us"]
        for name, us in rows[:top]:
            if us < min_us:
                break
            lines.append(f"{us:10.1f} us  x{self.counts.get(name, 0):5d}  {name[:90]}")
        return "\n".join(lines)


@contextmanager
def device_profile(trace_dir: Optional[str] = None, keep: bool = False):
    """Context manager: profile the enclosed (jitted) device work and expose
    per-op device times. ``jax.block_until_ready`` your outputs inside the
    block or the trace may miss trailing kernels."""
    import jax

    own = trace_dir is None
    if own:
        trace_dir = tempfile.mkdtemp(prefix="deodr_tpu_trace_")
    prof = DeviceProfile()
    try:
        with jax.profiler.trace(trace_dir):
            yield prof
    finally:
        try:
            prof._ingest(trace_dir)
        finally:
            if own and not keep:
                shutil.rmtree(trace_dir, ignore_errors=True)
