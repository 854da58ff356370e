"""Scene-size sweep: throughput + memory across mesh size × resolution.

Answers the scalability question the duck bench cannot (4212 faces,
640×480): does the tiled/Pallas path hold up at 10k-130k faces and
1024²-2048² framebuffers, where the dense (n_tiles × N) binning mask would
be GBs and the planner must switch to two-level supertile binning
(ops/tiled.py::_bin_to_tiles_hier)?

For each config: build a subdivided-octahedron sphere, plan via
Scene3D._eager_plan (the production planner — prints the chosen tiling so
the supertile switch is visible), then time fwd+bwd (grads wrt ij+colors)
dependency-chained on device, exactly like tools/duck_tpu_bench.py.

Usage: python tools/size_sweep.py [--iters 5] [--configs small|full]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_config(level: int, res: int, sigma: float, iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from deodr_tpu import default_camera
    from deodr_tpu.geometry.primitives import octahedron_mesh
    from deodr_tpu.ops.render import render_scene
    from deodr_tpu.scene import Scene3D

    mesh = octahedron_mesh(level)
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    camera = default_camera(res, res, 60, np.asarray(mesh.vertices), rot)
    scene = Scene3D(sigma=sigma)
    scene.set_mesh(mesh)
    scene.set_light(np.array([-0.4, -0.4, -0.8]), 0.4)
    scene.set_background_color(np.array([0.2, 0.3, 0.5]))

    cap, tiling, aa_window, aa_tex_window, aa_tex_plan = scene._eager_plan(camera)
    print(f"# faces={mesh.nb_faces} res={res} sigma={sigma} tiling={tiling} cap={cap}",
          file=sys.stderr, flush=True)

    buffers, _ = scene._build_buffers(camera, *scene._diff_inputs(False), True, None)
    buffers = jax.tree.map(jnp.asarray, buffers)
    impl_arg = None if scene.impl in (None, "auto", "brute") else scene.impl

    def render(buf):
        image, _, _ = render_scene(
            buf, float(sigma), aa_edge_capacity=cap, tiling=tiling, impl=impl_arg,
            aa_window=aa_window, aa_tex_window=aa_tex_window, aa_tex_plan=aa_tex_plan,
        )
        return image

    obs = jnp.clip(jax.jit(render)(buffers) + 0.05, 0.0, 1.0)

    def one_step(params):
        ij, colors = params
        buf = dataclasses.replace(buffers, ij=ij, colors=colors)
        loss, grads = jax.value_and_grad(
            lambda p: jnp.sum((render(dataclasses.replace(buffers, ij=p[0], colors=p[1])) - obs) ** 2)
        )((ij, colors))
        return jax.tree.map(lambda p, g: p - 1e-12 * g, params, grads), loss

    @jax.jit
    def chained(params):
        return jax.lax.scan(lambda p, _: one_step(p), params, None, length=iters)

    params0 = (buffers.ij, buffers.colors)
    out = chained(params0)
    jax.block_until_ready(out)
    reps = 3
    # feed each rep's UPDATED params into the next: the runtime memoizes
    # identical repeated dispatches (a constant-input rep loop measured
    # 0.03 ms/iter for a ~100 ms workload) — every timed dispatch must
    # differ from the previous one
    params = out[0]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chained(params)
        params = out[0]
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / (reps * iters) * 1e3

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            mem = {"peak_bytes": int(stats.get("peak_bytes_in_use", 0))}
    except Exception:
        pass
    rec = {
        "faces": int(mesh.nb_faces),
        "res": res,
        "sigma": sigma,
        "ms_per_iter": round(ms, 2),
        "mpix_s": round(res * res / ms / 1e3, 1),
        "supertile": tiling.super_capacity if tiling else 0,
        **mem,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--configs", type=str, default="full")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tool_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.configs == "small":
        configs = [(5, 512, 1.0)]
    else:
        configs = [
            (5, 1024, 1.0),   # 8k faces
            (6, 1024, 1.0),   # 33k faces
            (7, 1024, 1.0),   # 131k faces
            (7, 2048, 1.0),   # 131k faces at 2048²
            (7, 2048, 0.0),
        ]
    for level, res, sigma in configs:
        run_config(level, res, sigma, args.iters)


if __name__ == "__main__":
    main()


def profile_config(level: int, res: int, sigma: float, trace_dir: str, iters: int = 3) -> None:
    """Like run_config but wraps one chained dispatch in a jax.profiler trace
    (parse with tools/parse_trace.py) instead of timing reps."""
    import jax
    import jax.numpy as jnp

    from deodr_tpu import default_camera
    from deodr_tpu.geometry.primitives import octahedron_mesh
    from deodr_tpu.ops.render import render_scene
    from deodr_tpu.scene import Scene3D
    import dataclasses

    mesh = octahedron_mesh(level)
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    camera = default_camera(res, res, 60, np.asarray(mesh.vertices), rot)
    scene = Scene3D(sigma=sigma)
    scene.set_mesh(mesh)
    scene.set_light(np.array([-0.4, -0.4, -0.8]), 0.4)
    scene.set_background_color(np.array([0.2, 0.3, 0.5]))
    cap, tiling, aa_window, aa_tex_window, aa_tex_plan = scene._eager_plan(camera)
    print(f"# tiling={tiling} cap={cap}", file=sys.stderr, flush=True)
    buffers, _ = scene._build_buffers(camera, *scene._diff_inputs(False), True, None)
    buffers = jax.tree.map(jnp.asarray, buffers)
    impl_arg = None if scene.impl in (None, "auto", "brute") else scene.impl

    def render(buf):
        image, _, _ = render_scene(
            buf, float(sigma), aa_edge_capacity=cap, tiling=tiling, impl=impl_arg,
            aa_window=aa_window, aa_tex_window=aa_tex_window, aa_tex_plan=aa_tex_plan,
        )
        return image

    obs = jnp.clip(jax.jit(render)(buffers) + 0.05, 0.0, 1.0)

    def one_step(params):
        ij, colors = params
        loss, grads = jax.value_and_grad(
            lambda p: jnp.sum((render(dataclasses.replace(buffers, ij=p[0], colors=p[1])) - obs) ** 2)
        )((ij, colors))
        return jax.tree.map(lambda p, g: p - 1e-12 * g, params, grads), loss

    @jax.jit
    def chained(params):
        return jax.lax.scan(lambda p, _: one_step(p), params, None, length=iters)

    params = (buffers.ij, buffers.colors)
    out = chained(params)
    jax.block_until_ready(out)
    jax.profiler.start_trace(trace_dir)
    out = chained(out[0])
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print("trace written to", trace_dir, file=sys.stderr)
