"""Headline benchmark: Mpixels/s/chip, forward+backward, 512x512.

Scene mirrors the reference's microbenchmark (reference:
tests/benchmark_rendering.py: 200 random untextured triangles) at 512x512,
with edge-overdraw antialiasing enabled (sigma=1) and full gradient
computation w.r.t. vertex positions and colors — the reference's headline
capability.

Baseline: the reference C++ core compiled with -O3 -march=native on this
host, single core, float64 (tools/baseline_bench.cpp): 27.51 Mpix/s
forward+backward at 512x512/sigma=1 (47.30 Mpix/s at sigma=0).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

# measured on this host via tools/baseline_bench.cpp (reference C++ core,
# single core): {"height":512,"width":512,"n_tri":200,"sigma":1,
# "fwdbwd_mpix_s":27.51}
BASELINE_FWDBWD_MPIX_S_SIGMA1 = 27.51
BASELINE_FWDBWD_MPIX_S_SIGMA0 = 47.30


def build_scene(height=512, width=512, n_tri=200, dtype=None):
    import jax.numpy as jnp

    from deodr_tpu.ops.render import SceneBuffers

    if dtype is None:
        dtype = jnp.float32
    rng = np.random.RandomState(0)
    centers = rng.rand(n_tri, 1, 2) * [width, height]
    tri = (centers + (rng.rand(n_tri, 3, 2) - 0.5) * 160).astype(np.float32)
    u = tri[:, 1] - tri[:, 0]
    w = tri[:, 2] - tri[:, 0]
    raw = u[:, 0] * w[:, 1] - w[:, 0] * u[:, 1]
    tri[raw > 0] = tri[raw > 0][:, [0, 2, 1]]
    ij = tri.reshape(-1, 2)
    faces = np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3)
    depths = (np.repeat(rng.rand(n_tri), 3) + 0.5).astype(np.float32)
    colors = rng.rand(3 * n_tri, 3).astype(np.float32)
    return SceneBuffers(
        faces=jnp.asarray(faces),
        faces_uv=jnp.asarray(faces),
        ij=jnp.asarray(ij, dtype),
        depths=jnp.asarray(depths, dtype),
        uv=jnp.zeros((3 * n_tri, 2), dtype),
        shade=jnp.zeros((3 * n_tri,), dtype),
        colors=jnp.asarray(colors, dtype),
        edgeflags=jnp.ones((n_tri, 3), bool),
        textured=jnp.zeros((n_tri,), bool),
        shaded=jnp.zeros((n_tri,), bool),
        texture=None,
        background_image=None,
        background_color=jnp.asarray(np.array([0.3, 0.5, 0.7]), dtype),
        height=height,
        width=width,
        clockwise=False,
        backface_culling=True,
        strict_edge=True,
        perspective_correct=False,
        integer_pixel_centers=True,
    )


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from deodr_tpu.ops.render import render_scene
    from deodr_tpu.ops.tiled import TilingConfig

    from deodr_tpu.ops.tiled import suggest_tiling

    height = width = 512
    scene = build_scene(height, width)
    obs = jnp.zeros((height, width, 3), jnp.float32)
    # tile height comes from the planner's own auto-pick (48-row tiles for
    # big-triangle scenes — the measured sweet spot, see suggest_tiling /
    # Scene3D._eager_plan), NOT a hand pin: the headline number must be
    # reachable through the production planning path
    tiling = suggest_tiling(
        np.asarray(scene.ij),
        np.asarray(scene.faces),
        height,
        width,
        sigma=1.0,
        edgeflags=np.ones((scene.faces.shape[0], 3), bool),
        margin=1.0,
        for_pallas=True,
        bucket_mode="exact",
    )
    assert tiling.tile_h == 48, f"planner auto-pick changed: {tiling}"
    def measure(sigma, chain=400, chain2=None):
        def loss(ij, colors):
            b = dataclasses.replace(scene, ij=ij, colors=colors)
            img, _, _ = render_scene(
                b, sigma, aa_edge_capacity=600 if sigma > 0 else None, tiling=tiling, impl="pallas"
            )
            return jnp.sum((img - obs) ** 2)

        vg = jax.value_and_grad(loss, argnums=(0, 1))

        # a production fitting loop is fully jitted: chain `chain` descent
        # steps per dispatch (each step depends on the previous one's
        # gradients) so the measurement reflects device throughput rather
        # than the host->TPU tunnel's per-dispatch latency
        def make_run(n):
            @jax.jit
            def run(ij, colors):
                def step(carry, _):
                    ij, colors = carry
                    v, (gij, gc) = vg(ij, colors)
                    return (ij - 1e-9 * gij, colors - 1e-9 * gc), v

                (ij, colors), vs = jax.lax.scan(step, (ij, colors), None, length=n)
                return ij, colors, vs

            return run

        def best_of(run, n, ij_r, colors_r, reps=3):
            # best-of-reps: the tunnel between host and TPU adds multi-ms
            # per-dispatch latency with high variance; the best rep is
            # closest to the device throughput a local deployment sees.
            # Each rep feeds the previous rep's updated params back in: the
            # runtime memoizes IDENTICAL repeated dispatches (measured
            # 0.03 ms for a ~100 ms workload in tools/size_sweep.py before
            # the same fix)
            best = None
            for _ in range(reps):
                t0 = time.time()
                out = run(ij_r, colors_r)
                jax.block_until_ready(out)
                dt = (time.time() - t0) / n
                ij_r, colors_r = out[0], out[1]
                best = dt if best is None else min(best, dt)
            return best, ij_r, colors_r

        run = make_run(chain)
        out = run(scene.ij, scene.colors)
        jax.block_until_ready(out)
        t_per, ij_r, colors_r = best_of(run, chain, out[0], out[1])
        mpix = height * width / t_per / 1e6
        if chain2 is None:
            return mpix, None
        # chain-length differencing separates the per-step DEVICE cost from
        # the fixed per-dispatch (tunnel) overhead: T(n) = F + n·d, so
        # d = (T(n2) − T(n1)) / (n2 − n1). Reported so the wall number can
        # be judged against what the hardware actually sustains.
        run2 = make_run(chain2)
        out2 = run2(ij_r, colors_r)
        jax.block_until_ready(out2)
        t2_per, _, _ = best_of(run2, chain2, out2[0], out2[1], reps=2)
        d_step = (t2_per * chain2 - t_per * chain) / (chain2 - chain)
        mpix_dev = height * width / d_step / 1e6 if d_step > 0 else mpix
        return mpix, mpix_dev

    # primary: the reference microbenchmark's configuration (sigma=0), with
    # gradients added; secondary: edge-antialiased (sigma=1). The sigma=1
    # wall number chains 1600 steps per dispatch so the tunnel's fixed
    # per-dispatch latency (~30 ms/dispatch in this environment; absent on
    # a directly-attached chip) stays under ~5% of the measurement; the
    # device-only rate comes from chain-length differencing.
    mpix_s0, _ = measure(0.0)
    mpix_s1, mpix_s1_dev = measure(1.0, chain=1600, chain2=400)
    print(
        f"sigma=1 (edge AA): {mpix_s1:.2f} Mpix/s/chip fwd+bwd "
        f"(device-only {mpix_s1_dev:.1f}; "
        f"vs single-core C {BASELINE_FWDBWD_MPIX_S_SIGMA1}: {mpix_s1 / BASELINE_FWDBWD_MPIX_S_SIGMA1:.2f}x)",
        file=sys.stderr,
    )

    # flagship scene: the duck (4212 faces, 512² texture, 640×480, σ=1,
    # full gradients incl. texture) — the reference C++ core on the same
    # 2.5D scene takes 12.6 ms/iter fwd+bwd (tools/duck_baseline.cpp).
    # Captured here so the driver records it, not only the docs.
    duck_ms = duck_dev_ms = None
    try:
        duck_ms, duck_dev_ms = measure_duck()
        print(
            f"duck sigma=1 fwd+bwd: {duck_ms:.2f} ms/iter wall, "
            f"{duck_dev_ms:.2f} device (reference C core: 12.6)",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover - keep the primary metric alive
        print(f"duck bench skipped: {e!r}", file=sys.stderr)

    # shard_map + Mosaic on the REAL chip (1-device mesh): the multi-chip
    # scale-out path's kernels compiling and running on hardware is a fact,
    # not a prediction — recorded so regressions in the sharded lowering
    # are caught by the driver (scaling_model.py holds the full comm model)
    shardmap_ms = None
    try:
        shardmap_ms = measure_shardmap_1dev(scene, tiling)
        print(f"shard_map+Mosaic fwd+bwd, 1-device mesh: {shardmap_ms:.2f} ms/iter", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"shard_map bench skipped: {e!r}", file=sys.stderr)

    record = {
        "metric": "fwd+bwd render throughput, 512x512, 200 tris, sigma=0, grads wrt ij+colors"
        f" (sigma=1: {round(mpix_s1, 1)} Mpix/s, {round(mpix_s1 / BASELINE_FWDBWD_MPIX_S_SIGMA1, 2)}x C)",
        "value": round(mpix_s0, 2),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s0 / BASELINE_FWDBWD_MPIX_S_SIGMA0, 2),
        "sigma1_mpix_s": round(mpix_s1, 1),
        "sigma1_device_mpix_s": round(mpix_s1_dev, 1) if mpix_s1_dev else None,
        "sigma1_wall_over_device": round(mpix_s1 / mpix_s1_dev, 3) if mpix_s1_dev else None,
    }
    if duck_ms is not None:
        record["duck_sigma1_ms"] = round(duck_ms, 2)
        record["duck_ref_cpp_ms"] = 12.6
        if duck_dev_ms is not None:
            record["duck_sigma1_device_ms"] = round(duck_dev_ms, 2)
    # texture fuse-hint bitwise fold probe (ops/common.py::_probe_fuse_hint):
    # False means XLA stopped folding the f32->bf16->f32 pair — the hint was
    # auto-disabled (loud warning) instead of quantizing texels, and the
    # duck number above was measured WITHOUT it
    try:
        from deodr_tpu.ops.common import _probe_fuse_hint

        record["tex_fuse_hint_ok"] = bool(_probe_fuse_hint())
    except Exception:  # pragma: no cover
        pass
    if shardmap_ms is not None:
        record["shardmap_pallas_1dev_ms"] = round(shardmap_ms, 2)
    print(json.dumps(record))


def measure_shardmap_1dev(scene, tiling, iters: int = 20) -> float:
    """sigma=1 fwd+bwd through make_tile_sharded_render (shard_map) with the
    Pallas kernels, on a 1-device mesh of the real chip."""
    import dataclasses as _dc
    import time as _time

    import jax
    import jax.numpy as jnp

    from deodr_tpu.parallel.sharding import make_device_mesh, make_tile_sharded_render

    mesh = make_device_mesh(n_views=1, n_tiles=1, devices=jax.devices()[:1])
    render = make_tile_sharded_render(
        scene, 1.0, mesh, aa_edge_capacity=600, tiling=tiling, impl="pallas"
    )

    def loss(ij, colors):
        img, _ = render(_dc.replace(scene, ij=ij, colors=colors))
        return jnp.sum(img**2)

    vg = jax.value_and_grad(loss, argnums=(0, 1))

    @jax.jit
    def chained(ij, colors):
        def step(carry, _):
            ij, colors = carry
            _, (gij, gc) = vg(ij, colors)
            return (ij - 1e-9 * gij, colors - 1e-9 * gc), None

        (ij, colors), _ = jax.lax.scan(step, (ij, colors), None, length=iters)
        return ij, colors

    out = chained(scene.ij, scene.colors)
    jax.block_until_ready(out)
    best = None
    for _ in range(3):
        t0 = _time.time()
        out = chained(*out)  # feed back: identical dispatches memoize
        jax.block_until_ready(out)
        dt = (_time.time() - t0) / iters * 1e3
        best = dt if best is None else min(best, dt)
    return best


def measure_duck(iters: int = 100, iters2: int = 20):
    """Duck-scene σ=1 fwd+bwd ms/iter, dependency-chained on device
    (condensed tools/duck_tpu_bench.py).

    Chains ``iters`` steps per dispatch — like a fitting loop, whose steps
    are fully jitted — so the tunnel's fixed per-dispatch latency
    (~30 ms/dispatch here, absent on a directly-attached chip) is amortized
    to <5% of the number; the returned (wall_ms, device_ms) pair separates
    the two via chain-length differencing (T(n) = F + n·d). Round 4
    measured with iters=20, which carried ~1.4 ms/iter of tunnel overhead.
    """
    import os

    import jax
    import jax.numpy as jnp

    import deodr_tpu
    from deodr_tpu import ColoredTriMesh, default_camera
    from deodr_tpu.ops.render import render_scene
    from deodr_tpu.scene import Scene3D

    mesh = ColoredTriMesh.load(os.path.join(deodr_tpu.data_path, "duck.obj"))
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    camera = default_camera(640, 480, 60, np.asarray(mesh.vertices), rot)
    scene = Scene3D(sigma=1.0)
    scene.set_mesh(mesh)
    scene.set_light(np.array([-0.4, -0.4, -0.8]), 0.4)
    scene.set_background_color(np.array([0.2, 0.3, 0.5]))
    cap, tiling, aa_window, aa_tex_window, aa_tex_plan = scene._eager_plan(camera)
    buffers, _ = scene._build_buffers(camera, *scene._diff_inputs(False), True, None)
    buffers = jax.tree.map(jnp.asarray, buffers)

    def render(buf):
        image, _, _ = render_scene(
            buf, 1.0, aa_edge_capacity=cap, tiling=tiling, impl=None,
            aa_window=aa_window, aa_tex_window=aa_tex_window, aa_tex_plan=aa_tex_plan,
        )
        return image

    obs = jnp.clip(jax.jit(render)(buffers) + 0.05, 0.0, 1.0)

    def one_step(params):
        ij, uv, shade, texture = params
        loss, grads = jax.value_and_grad(
            lambda p: jnp.sum(
                (render(dataclasses.replace(buffers, ij=p[0], uv=p[1], shade=p[2], texture=p[3])) - obs) ** 2
            )
        )(params)
        return jax.tree.map(lambda p, g: p - 1e-12 * g, params, grads), loss

    def make_chained(n):
        @jax.jit
        def chained(params):
            return jax.lax.scan(lambda p, _: one_step(p), params, None, length=n)

        return chained

    def best_of(fn, n, params, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.time()
            params, _ = fn(params)  # feed back: identical dispatches memoize
            jax.block_until_ready(params)
            dt = (time.time() - t0) / n * 1e3
            best = dt if best is None else min(best, dt)
        return best, params

    chained = make_chained(iters)
    params0 = (buffers.ij, buffers.uv, buffers.shade, buffers.texture)
    params, _ = chained(params0)
    jax.block_until_ready(params)
    wall_ms, params = best_of(chained, iters, params)
    device_ms = None
    if iters2 and iters2 != iters:
        chained2 = make_chained(iters2)
        params2, _ = chained2(params)
        jax.block_until_ready(params2)
        t2, _ = best_of(chained2, iters2, params2, reps=2)
        d = (wall_ms * iters - t2 * iters2) / (iters - iters2)
        device_ms = d if d > 0 else wall_ms
    return wall_ms, device_ms


def main_large():
    """Large-scene recorded benchmark (``bench.py --large``): the 131k-face /
    2048² two-level-supertile-binning configuration as a stored artifact
    (LARGE_r04.json) rather than a README claim. Reuses the size-sweep
    harness (tools/size_sweep.py) so the numbers stay comparable."""
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from size_sweep import run_config

    # resume semantics: first-time compiles/plans of the 131k-face configs
    # take minutes each, so a caller's timeout may land mid-run — configs
    # already recorded in the artifact are kept and skipped, each finished
    # config is flushed immediately, and a re-run completes the rest
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "LARGE_r05.json")
    faces_of = {5: 8192, 6: 32768, 7: 131072}
    records = []
    if os.path.exists(path):
        try:
            records = json.load(open(path)).get("configs", [])
        except Exception:
            records = []
    done = {(r["faces"], r["res"], r["sigma"]) for r in records}
    out = {"platform": jax.devices()[0].platform, "configs": records}
    # the full round-3 config list (round 4 dropped two for time; the
    # round-5 pair-expansion binning runs all five inside one window)
    for level, res, sigma in (
        (5, 1024, 1.0), (6, 1024, 1.0), (7, 1024, 1.0), (7, 2048, 1.0), (7, 2048, 0.0),
    ):
        if (faces_of[level], res, sigma) in done:
            continue
        records.append(run_config(level, res, sigma, iters=5))
        out = {"platform": jax.devices()[0].platform, "configs": records}
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--large" in sys.argv:
        main_large()
        sys.exit(0)
    try:
        main()
    except Exception as e:  # always emit one JSON line
        print(json.dumps({"metric": "bench failed", "value": 0, "unit": str(e)[:200], "vs_baseline": 0}))
        sys.exit(1)
