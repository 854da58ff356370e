"""Tile-height sweep on the real chip: microbench / duck / sphere scenes.

Measures fwd+bwd ms/iter for candidate (tile_h, edge_tile_h) pairs so the
planner's tile-height scoring can be fit to data instead of folklore.
Results append to /tmp/tile_sweep.jsonl (one JSON per line) so a timed-out
run keeps what it finished.

Usage:
  python tools/tile_sweep.py micro [sigma] [tile_h] [edge_tile_h]
  python tools/tile_sweep.py duck  [tile_h] [edge_tile_h]
  python tools/tile_sweep.py sphere LEVEL RES SIGMA [tile_h] [edge_tile_h]

With no tile args, sweeps the default candidate lists.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/tile_sweep.jsonl"


def record(rec):
    rec = dict(rec)
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def _bench_chained(run, args, chain, reps=3):
    import jax

    out = run(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*out[:len(args)])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / chain
        best = dt if best is None else min(best, dt)
    return best * 1e3


def micro(sigma, tile_h, edge_tile_h):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_scene
    from deodr_tpu.ops.render import render_scene
    from deodr_tpu.ops.tiled import suggest_tiling

    height = width = 512
    scene = build_scene(height, width)
    obs = jnp.zeros((height, width, 3), jnp.float32)
    tiling = suggest_tiling(
        np.asarray(scene.ij), np.asarray(scene.faces), height, width,
        sigma=float(sigma), edgeflags=np.ones((scene.faces.shape[0], 3), bool),
        tile_h=tile_h, margin=1.0, for_pallas=True, bucket_mode="exact",
    )
    if edge_tile_h:
        # edge capacity must be re-measured for this edge tile height
        et = suggest_tiling(
            np.asarray(scene.ij), np.asarray(scene.faces), height, width,
            sigma=float(sigma), edgeflags=np.ones((scene.faces.shape[0], 3), bool),
            tile_h=edge_tile_h, margin=1.0, for_pallas=True, bucket_mode="exact",
        )
        tiling = tiling._replace(edge_tile_h=edge_tile_h, edge_capacity=et.edge_capacity)

    def loss(ij, colors):
        b = dataclasses.replace(scene, ij=ij, colors=colors)
        img, _, _ = render_scene(
            b, float(sigma), aa_edge_capacity=600 if sigma > 0 else None,
            tiling=tiling, impl="pallas",
        )
        return jnp.sum((img - obs) ** 2)

    vg = jax.value_and_grad(loss, argnums=(0, 1))
    chain = 400

    @jax.jit
    def run(ij, colors):
        def step(carry, _):
            ij, colors = carry
            v, (gij, gc) = vg(ij, colors)
            return (ij - 1e-9 * gij, colors - 1e-9 * gc), v

        (ij, colors), _ = jax.lax.scan(step, (ij, colors), None, length=chain)
        return ij, colors

    ms = _bench_chained(run, (scene.ij, scene.colors), chain)
    record({"scene": "micro", "sigma": sigma, "tile_h": tile_h,
            "edge_tile_h": edge_tile_h, "ms": round(ms, 4),
            "mpix_s": round(height * width / ms / 1e3, 1),
            "tri_cap": tiling.triangle_capacity, "edge_cap": tiling.edge_capacity})


def scene3d_bench(scene, camera, iters=10, grad_wrt=("ij", "colors")):
    import jax
    import jax.numpy as jnp

    from deodr_tpu.ops.render import render_scene

    cap, tiling, aa_window, aa_tex_window, aa_tex_plan = scene._eager_plan(camera)
    buffers, _ = scene._build_buffers(camera, *scene._diff_inputs(False), True, None)
    buffers = jax.tree.map(jnp.asarray, buffers)

    def render(buf):
        image, _, _ = render_scene(
            buf, float(scene.sigma), aa_edge_capacity=cap, tiling=tiling, impl=None,
            aa_window=aa_window, aa_tex_window=aa_tex_window, aa_tex_plan=aa_tex_plan,
        )
        return image

    obs = jnp.clip(jax.jit(render)(buffers) + 0.05, 0.0, 1.0)
    names = [n for n in grad_wrt if getattr(buffers, n) is not None]

    def one_step(params):
        def lossf(p):
            return jnp.sum((render(dataclasses.replace(buffers, **dict(zip(names, p)))) - obs) ** 2)

        _, grads = jax.value_and_grad(lossf)(params)
        return tuple(p - 1e-12 * g for p, g in zip(params, grads)),

    @jax.jit
    def run(params):
        out, _ = jax.lax.scan(lambda p, _: (one_step(p)[0], 0.0), params, None, length=iters)
        return (out,)

    params0 = tuple(getattr(buffers, n) for n in names)
    ms = _bench_chained(run, (params0,), iters)
    return ms, tiling


def duck(tile_h, edge_tile_h):
    import deodr_tpu
    from deodr_tpu import ColoredTriMesh, default_camera
    from deodr_tpu.scene import Scene3D

    os.environ["DEODR_TILE_H"] = str(tile_h)
    os.environ["DEODR_EDGE_TILE_H"] = str(edge_tile_h)
    mesh = ColoredTriMesh.load(os.path.join(deodr_tpu.data_path, "duck.obj"))
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    camera = default_camera(640, 480, 60, np.asarray(mesh.vertices), rot)
    scene = Scene3D(sigma=1.0)
    scene.set_mesh(mesh)
    scene.set_light(np.array([-0.4, -0.4, -0.8]), 0.4)
    scene.set_background_color(np.array([0.2, 0.3, 0.5]))
    ms, tiling = scene3d_bench(scene, camera, iters=20, grad_wrt=("ij", "uv", "shade", "texture"))
    record({"scene": "duck", "sigma": 1.0, "tile_h": tiling.tile_h,
            "edge_tile_h": tiling.edge_tile_h, "ms": round(ms, 3),
            "tri_cap": tiling.triangle_capacity, "edge_cap": tiling.edge_capacity})


def sphere(level, res, sigma, tile_h, edge_tile_h):
    from deodr_tpu import default_camera
    from deodr_tpu.geometry.primitives import octahedron_mesh
    from deodr_tpu.scene import Scene3D

    os.environ["DEODR_TILE_H"] = str(tile_h)
    os.environ["DEODR_EDGE_TILE_H"] = str(edge_tile_h)
    mesh = octahedron_mesh(level)
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    camera = default_camera(res, res, 60, np.asarray(mesh.vertices), rot)
    scene = Scene3D(sigma=sigma)
    scene.set_mesh(mesh)
    scene.set_light(np.array([-0.4, -0.4, -0.8]), 0.4)
    scene.set_background_color(np.array([0.2, 0.3, 0.5]))
    ms, tiling = scene3d_bench(scene, camera, iters=5)
    record({"scene": f"sphere{level}", "res": res, "sigma": sigma,
            "tile_h": tiling.tile_h, "edge_tile_h": tiling.edge_tile_h,
            "ms": round(ms, 2), "mpix_s": round(res * res / ms / 1e3, 1),
            "tri_cap": tiling.triangle_capacity, "edge_cap": tiling.edge_capacity,
            "super": tiling.super_capacity, "faces": mesh.nb_faces})


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    what = sys.argv[1]
    rest = sys.argv[2:]
    if what == "micro":
        sigma = float(rest[0])
        micro(sigma, int(rest[1]), int(rest[2]) if len(rest) > 2 else 0)
    elif what == "duck":
        duck(int(rest[0]), int(rest[1]) if len(rest) > 1 else 0)
    elif what == "sphere":
        sphere(int(rest[0]), int(rest[1]), float(rest[2]), int(rest[3]),
               int(rest[4]) if len(rest) > 4 else 0)


if __name__ == "__main__":
    main()
