"""Weak-scaling efficiency benchmark for the view-parallel fitting step.

BASELINE.md target: >=80% scaling efficiency from 1 chip to N devices.
This harness measures it for `multiview_train_step`: N views sharded over an
N-device ("views", 1) mesh, shared-parameter gradients all-reduced by XLA.
Weak scaling: work per device is constant (1 view each), so

    efficiency(N) = T(1 view, 1 device) / T(N views, N devices)

On a real TPU slice/pod run it as-is (devices = all chips). Without one it
runs on a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8)
— timings there demonstrate the harness and the compiled collective
structure, not ICI bandwidth.

Prints one JSON line: {"devices": [...], "iter_ms": [...], "efficiency": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(height=128, width=128, n_subdiv=3, iters=20):
    force_cpu = "--cpu" in sys.argv or not os.environ.get("JAX_PLATFORMS")
    if force_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if force_cpu:
        # sitecustomize may pre-register an accelerator platform; override
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from deodr_tpu import default_camera
    from deodr_tpu.geometry.primitives import octahedron_mesh
    from deodr_tpu.parallel.sharding import make_device_mesh, make_multiview_train_step

    all_devices = jax.devices()
    mesh = octahedron_mesh(n_subdiv)
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    camera = default_camera(width, height, 60, np.asarray(mesh.vertices), rot)
    adj = mesh.adjacencies
    dtype = jnp.float32
    static = (
        jnp.asarray(mesh.faces),
        adj.edges_j,
        adj.edge_faces_j,
        adj.faces_edges_j,
        adj.degree_v_e_j,
        height,
        width,
        1.0,
        256,
        jnp.asarray(np.array([0.1, 0.2, 0.3]), dtype),
    )

    counts = [n for n in (1, 2, 4, 8) if n <= len(all_devices)]
    iter_ms = []
    for n in counts:
        dev_mesh = make_device_mesh(n_views=n, n_tiles=1, devices=all_devices[:n])
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
        step = make_multiview_train_step(static, dev_mesh)
        out = step(params, obs, ext, intr)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = step(params, obs, ext, intr)
        jax.block_until_ready(out)
        iter_ms.append((time.time() - t0) / iters * 1e3)

    eff = [iter_ms[0] / t for t in iter_ms]
    # on a virtual CPU mesh all "devices" share the same host cores, so
    # weak-scaling efficiency measures core contention, not ICI; the
    # meaningful CPU-mesh metric is the sharded step's cost relative to N
    # serialized single-view steps (<= 1.0 means the mesh/collective
    # machinery adds no overhead over running the views one by one)
    vs_serialized = [t / (n * iter_ms[0]) for n, t in zip(counts, iter_ms)]
    print(
        json.dumps(
            {
                "platform": jax.devices()[0].platform,
                "devices": counts,
                "iter_ms": [round(t, 2) for t in iter_ms],
                "efficiency": [round(e, 3) for e in eff],
                "vs_serialized": [round(v, 3) for v in vs_serialized],
            }
        )
    )


if __name__ == "__main__":
    main()
