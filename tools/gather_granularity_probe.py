"""In-loop gather/scatter cost vs (row count, row width) at constant bytes.

The duck's footprint fetch gathers 129k 48 B rows from a (262144, 12) f32
table inside the fitting loop (~9 cyc/row) and its transpose scatters the
same rows back (~11 cyc/row). Pair/quad-expansion designs would halve or
quarter the row count at 3x/4x the row width — worth building only if the
in-loop per-row cost actually stays ~flat as rows widen, as round 3's
stray observation (49k x 768 B rows at 2.5 cyc/row in-loop) suggests.

Measures, inside a dependency-chained lax.scan on the real chip:
  gather+scatter of (n_rows x width) from/to a (262144 x width) table
for (129024, 12), (64512, 36), (32256, 48), and as a control the same
12-wide gather at the smaller row counts.

Usage: python tools/gather_granularity_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tool_cache")


def measure(n_rows: int, width: int, n_table: int = 262144, iters: int = 30) -> float:
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.rand(n_table, width).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n_table - 1, size=n_rows).astype(np.int32))

    def step(carry, _):
        t, acc = carry
        rows = t[idx] * 1.000001 + acc  # gather (+ data dependency)
        t2 = t.at[idx].add(rows * 1e-9)  # scatter-add back
        return (t2, acc * 0.999999), jnp.sum(rows[0])

    @jax.jit
    def run(t):
        (t2, _), s = jax.lax.scan(step, (t, jnp.zeros((n_rows, width), jnp.float32)), None, length=iters)
        return t2, s

    out = run(table)
    jax.block_until_ready(out)
    best = None
    t_in = out[0]
    for _ in range(3):
        t0 = time.time()
        out = run(t_in)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters * 1e3
        t_in = out[0]
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    cfgs = [
        (129024, 12),
        (64512, 12),
        (32256, 12),
        (64512, 36),
        (32256, 48),
        (129024, 24),
    ]
    for n, w in cfgs:
        ms = measure(n, w)
        cyc = ms * 1e-3 * 940e6 / n
        print(f"rows={n:7d} width={w:3d} ({w*4:4d} B): {ms:7.3f} ms/iter  {cyc:5.1f} cyc/row", flush=True)


if __name__ == "__main__":
    main()
