"""Duck scene TPU benchmark: textured+Gouraud σ=1 fwd+bwd ms/iteration.

The realistic-mesh counterpart of bench.py's microbenchmark: the duck
(4212 faces, 512² texture) at 640×480 with silhouette antialiasing and
gradients w.r.t. the 2.5D scene's differentiable surface (projected vertex
positions ij, uv, shade, texture) — the same quantity the reference core's
``renderScene_B`` produces. Compare against the reference C++ core fed the
exact same 2.5D scene (tools/duck_baseline.cpp; 12.6 ms fwd+bwd at σ=1 on
this host, single core).

Two numbers are reported:

- ``device``: K gradient steps dependency-chained inside ONE ``lax.scan``
  dispatch (each step consumes the previous step's gradients, so the
  runtime cannot elide work — see PERFORMANCE.md "Benchmarking pitfalls");
  this is the per-iteration device cost a fitting loop pays.
- ``wall``: one jitted step per host dispatch (what a host-driven loop
  through the tunnel pays).

Usage:
    python tools/duck_tpu_bench.py [--sigma 1.0] [--iters 20] [--profile DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigma", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--profile", type=str, default=None, help="jax.profiler trace dir")
    ap.add_argument("--impl", type=str, default=None)
    ap.add_argument(
        "--dump-hlo", type=str, default=None,
        help="write the chained step's optimized HLO here (fusion names match "
        "a --profile trace of the same run) and exit before timing",
    )
    ap.add_argument("--tex-plan", type=str, default=None,
                    help="override EdgeTexPlan as win_h,win_w,n_split,seg_cap,seg_len")
    ap.add_argument("--edge-tile-h", type=int, default=None)
    ap.add_argument("--edge-cap", type=int, default=None)
    args = ap.parse_args()

    import jax

    # persistent compilation cache: repeated tool runs skip XLA recompilation
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tool_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import deodr_tpu
    from deodr_tpu import ColoredTriMesh, default_camera
    from deodr_tpu.ops.render import render_scene
    from deodr_tpu.scene import Scene3D

    mesh = ColoredTriMesh.load(os.path.join(deodr_tpu.data_path, "duck.obj"))
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    camera = default_camera(640, 480, 60, np.asarray(mesh.vertices), rot)
    scene = Scene3D(sigma=args.sigma)
    if args.impl:
        scene.impl = args.impl
    scene.set_mesh(mesh)
    scene.set_light(np.array([-0.4, -0.4, -0.8]), 0.4)
    scene.set_background_color(np.array([0.2, 0.3, 0.5]))

    cap, tiling, aa_window, aa_tex_window, aa_tex_plan = scene._eager_plan(camera)
    if args.tex_plan:
        from deodr_tpu.ops.tiled import EdgeTexPlan

        wh, ww, ns, sc, sl = args.tex_plan.split(",")
        aa_tex_plan = EdgeTexPlan(
            win_h=int(wh), win_w=int(ww), n_split=int(ns),
            seg_capacity=int(sc), uv_segment_length=float(sl),
        )
    if args.edge_tile_h is not None:
        tiling = tiling._replace(edge_tile_h=args.edge_tile_h)
    if args.edge_cap is not None:
        tiling = tiling._replace(edge_capacity=args.edge_cap)
    impl_arg = None if scene.impl in (None, "auto", "brute") else scene.impl
    print(
        f"plan: cap={cap} tiling={tiling} aa_window={aa_window} "
        f"aa_tex_window={aa_tex_window} aa_tex_plan={aa_tex_plan} impl={impl_arg or 'default'}",
        file=sys.stderr,
    )

    buffers, _ = scene._build_buffers(camera, *scene._diff_inputs(False), True, None)
    buffers = jax.tree.map(jnp.asarray, buffers)

    def render(buf):
        image, _, _ = render_scene(
            buf,
            float(scene.sigma),
            aa_edge_capacity=cap,
            tiling=tiling,
            impl=impl_arg,
            aa_window=aa_window,
            aa_tex_window=aa_tex_window,
            aa_tex_plan=aa_tex_plan,
        )
        return image

    obs = np.asarray(jax.device_get(jax.jit(render)(buffers)))
    obs = jnp.asarray(np.clip(obs + 0.05, 0.0, 1.0))

    def loss_fn(params):
        ij, uv, shade, texture = params
        import dataclasses

        buf = dataclasses.replace(buffers, ij=ij, uv=uv, shade=shade, texture=texture)
        image = render(buf)
        return jnp.sum((image - obs) ** 2)

    def one_step(params):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        # dependency-chain: feed a gradient-scaled nudge back into the params
        new_params = jax.tree.map(lambda p, g: p - 1e-12 * g, params, grads)
        return new_params, loss

    @jax.jit
    def step(params):
        return one_step(params)

    k_scan = args.iters

    @jax.jit
    def chained(params):
        def body(p, _):
            p2, loss = one_step(p)
            return p2, loss

        return jax.lax.scan(body, params, None, length=k_scan)

    params0 = (buffers.ij, buffers.uv, buffers.shade, buffers.texture)

    if args.dump_hlo:
        txt = chained.lower(params0).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"wrote {args.dump_hlo} ({len(txt)} bytes)", file=sys.stderr)
        return

    # ---- wall: one dispatch per step ----
    params, loss = step(params0)  # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, loss = step(params)
    jax.block_until_ready(loss)
    wall_ms = (time.perf_counter() - t0) / args.iters * 1e3

    # ---- device: K steps chained in one dispatch ----
    out = chained(params0)  # compile
    jax.block_until_ready(out)
    reps = 3
    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chained(params0)
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    if args.profile:
        jax.profiler.stop_trace()
    device_ms = dt / (reps * k_scan) * 1e3
    loss_last = float(np.asarray(out[1][-1]))

    print(
        f'{{"metric": "duck_fwdbwd_ms", "sigma": {args.sigma}, '
        f'"device_ms": {device_ms:.2f}, "wall_ms": {wall_ms:.2f}, "loss": {loss_last:.3f}}}'
    )


if __name__ == "__main__":
    main()
