"""Analytic multi-chip scaling model, anchored in measurements.

Real multi-chip hardware is not reachable from this environment (one
tunneled TPU v5e chip), so the >=80% weak-scaling target cannot be measured
directly. This tool makes the claim FALSIFIABLE instead of rhetorical by
combining three hard numbers:

1. the all-reduced bytes per step, MEASURED from the compiled HLO of the
   view-sharded training step (every all-reduce op's shape, parsed from the
   8-device lowering — byte counts are platform-independent);
2. the per-step compute time, MEASURED on the real TPU chip by running the
   SAME shard_map-wrapped step on a 1-device mesh (this also exercises the
   shard_map + Mosaic compile path on real hardware — it is not simulated);
3. a published interconnect figure: TPU v5e exposes 4 ICI links per chip at
   400 Gbps each (1600 Gbps aggregate, i.e. ~200 GB/s); the model uses
   100 GB/s effective ring bandwidth per direction — half the aggregate —
   as a conservative allowance for protocol overhead.

The predicted weak-scaling efficiency over a 1-D ring of N chips is

    eff(N) = T_step / (T_step + T_ar(N)),
    T_ar(N) = 2·B·(N−1)/N / BW + hops·t_hop,   hops = 2·(N−1), t_hop = 1 µs

(standard ring all-reduce: reduce-scatter + all-gather, each moving
B·(N−1)/N bytes per chip; 1 µs/hop bounds per-step link latency). Writes
SCALING_r04.json next to this file's repo root.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# make the CPU backend expose 8 virtual devices BEFORE jax initializes; the
# TPU backend is unaffected
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1, "u8": 1}


def _build_inputs(n, height, width):
    import jax.numpy as jnp
    import numpy as np

    from deodr_tpu import default_camera
    from deodr_tpu.geometry.primitives import octahedron_mesh

    mesh = octahedron_mesh(3)
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    camera = default_camera(width, height, 60, np.asarray(mesh.vertices), rot)
    adj = mesh.adjacencies
    dtype = jnp.float32
    static = (
        jnp.asarray(mesh.faces), adj.edges_j, adj.edge_faces_j, adj.faces_edges_j,
        adj.degree_v_e_j, height, width, 1.0, 256,
        jnp.asarray(np.array([0.1, 0.2, 0.3]), dtype),
    )
    params = {
        "vertices": jnp.asarray(np.asarray(mesh.vertices), dtype),
        "quaternion": jnp.tile(jnp.asarray(np.array([0, 0, 0, 1.0]), dtype)[None], (n, 1)),
        "translation": jnp.zeros((n, 3), dtype),
        "mesh_color": jnp.asarray(np.array([0.5, 0.4, 0.3]), dtype),
        "light_directional": jnp.asarray(np.array([-0.1, -0.5, -0.4]), dtype),
        "light_ambient": jnp.asarray(0.6, dtype),
    }
    obs = jnp.zeros((n, height, width, 3), dtype)
    ext = jnp.tile(jnp.asarray(camera.extrinsic, dtype)[None], (n, 1, 1))
    intr = jnp.tile(jnp.asarray(camera.intrinsic, dtype)[None], (n, 1, 1))
    return static, params, obs, ext, intr


def main():
    import jax
    import numpy as np

    height = width = 128
    results = {}

    # --- 1) HLO-measured all-reduce bytes (8-device CPU lowering) ---
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deodr_tpu.parallel.sharding import make_device_mesh, _render_view

    import jax.numpy as jnp

    cpu = jax.devices("cpu")
    mesh8 = make_device_mesh(n_views=8, n_tiles=1, devices=cpu[:8])
    static, params, obs, ext, intr = _build_inputs(8, height, width)

    def loss_fn(params, obs, ext, intr):
        per_view = jax.vmap(
            lambda q, t, e, i, o: _render_view(
                params["vertices"], q, t, params["mesh_color"],
                params["light_directional"], params["light_ambient"], e, i, o, static,
            )
        )(params["quaternion"], params["translation"], ext, intr, obs)
        return jnp.sum(per_view)

    repl = NamedSharding(mesh8, P())
    shard = NamedSharding(mesh8, P("views"))
    grad_step = jax.jit(
        jax.value_and_grad(loss_fn),
        in_shardings=(repl, shard, shard, shard),
        out_shardings=(repl, repl),
    )
    txt = grad_step.lower(params, obs, ext, intr).compile().as_text()
    total_bytes = 0
    ops = []
    for line in txt.splitlines():
        if "= " not in line:
            continue
        rest = line.split("= ", 1)[1]
        # an all-reduce definition: "= <shape|tuple> all-reduce(..." (skip
        # -done, which re-lists the -start's shape)
        if " all-reduce(" not in rest and " all-reduce-start(" not in rest:
            continue
        shape_part = rest.split(" all-reduce", 1)[0]
        for dt, dims in re.findall(r"(f64|f32|bf16|f16|s32|u32|pred)\[([0-9,]*)\]", shape_part):
            n_el = 1
            for d in dims.split(","):
                if d:
                    n_el *= int(d)
            total_bytes += n_el * DTYPE_BYTES[dt]
            ops.append(f"{dt}[{dims}]")
    results["allreduce_bytes_per_step"] = total_bytes
    results["allreduce_ops"] = sorted(set(ops))
    results["allreduce_op_count"] = len(ops)

    # --- 2) real-chip step time through shard_map on a 1-device mesh ---
    tpu = [d for d in jax.devices() if d.platform != "cpu"]
    platform = tpu[0].platform if tpu else "cpu"
    mesh1 = make_device_mesh(n_views=1, n_tiles=1, devices=(tpu or cpu)[:1])
    static1, params1, obs1, ext1, intr1 = _build_inputs(1, height, width)
    from deodr_tpu.parallel.sharding import make_multiview_train_step

    step1 = make_multiview_train_step(static1, mesh1)
    out = step1(params1, obs1, ext1, intr1)
    jax.block_until_ready(out)
    # chain 20 dependent steps per dispatch so per-dispatch tunnel latency
    # does not inflate the compute time (inflating it would BIAS the
    # predicted efficiency upward)
    iters = 20

    def loop(params):
        for _ in range(iters):
            params, loss = step1(params, obs1, ext1, intr1)
        return params, loss

    p, loss = loop(params1)
    jax.block_until_ready((p, loss))
    best = None
    for _ in range(3):
        t0 = time.time()
        p, loss = loop(p)
        jax.block_until_ready((p, loss))
        dt = (time.time() - t0) / iters
        best = dt if best is None else min(best, dt)
    step_ms = best * 1e3
    results["step_ms_1dev_shardmap"] = round(step_ms, 3)
    results["step_platform"] = platform

    # --- 3) analytic ring all-reduce model with published v5e ICI figures ---
    BW = 100e9  # bytes/s effective ring bandwidth (v5e: 4x400 Gbps ICI aggregate ~200 GB/s; use half)
    T_HOP = 1e-6
    B = total_bytes
    pred = {}
    for n in (2, 4, 8, 16, 64):
        t_ar = 2.0 * B * (n - 1) / n / BW + 2.0 * (n - 1) * T_HOP
        pred[str(n)] = round((step_ms / 1e3) / (step_ms / 1e3 + t_ar), 4)
    results["predicted_weak_scaling_efficiency"] = pred
    results["assumptions"] = (
        "ring all-reduce over a 1-D 'views' mesh: T_ar = 2*B*(N-1)/N / BW + 2*(N-1)*1us; "
        "BW = 100 GB/s effective per-direction ring bandwidth (TPU v5e: 4 ICI links x 400 Gbps "
        "= ~200 GB/s aggregate per chip, halved for protocol overhead); B measured from the "
        "compiled 8-view HLO's all-reduce shapes; step time measured on the real chip through "
        "shard_map (1-device mesh), scene: 512-face octahedron sphere at 128x128, sigma=1"
    )

    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING_r04.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
