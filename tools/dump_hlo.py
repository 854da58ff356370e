"""Dump the optimized HLO of the duck-bench step function to a file.

Usage: python tools/dump_hlo.py /tmp/duck_step.hlo
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/duck_step.hlo"
    import jax

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
    scene = Scene3D(sigma=1.0)
    scene.set_mesh(mesh)
    scene.set_light(np.array([-0.4, -0.4, -0.8]), 0.4)
    scene.set_background_color(np.array([0.2, 0.3, 0.5]))

    cap, tiling, aa_window, aa_tex_window, aa_tex_plan = scene._eager_plan(camera)
    buffers, _ = scene._build_buffers(camera, *scene._diff_inputs(False), True, None)
    buffers = jax.tree.map(jnp.asarray, buffers)

    def render(buf):
        image, _, _ = render_scene(
            buf, 1.0, aa_edge_capacity=cap, tiling=tiling, impl="pallas",
            aa_window=aa_window, aa_tex_window=aa_tex_window, aa_tex_plan=aa_tex_plan,
        )
        return image

    obs = jnp.zeros((480, 640, 3), jnp.float32)

    def loss_fn(params):
        import dataclasses

        ij, uv, shade, texture = params
        buf = dataclasses.replace(buffers, ij=ij, uv=uv, shade=shade, texture=texture)
        image = render(buf)
        return jnp.sum((image - obs) ** 2)

    def one_step(params):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_params = jax.tree.map(lambda p, g: p - 1e-12 * g, params, grads)
        return new_params, loss

    k_scan = 20

    def chained(params):
        def body(p, _):
            p2, loss = one_step(p)
            return p2, loss

        return jax.lax.scan(body, params, None, length=k_scan)

    params0 = (buffers.ij, buffers.uv, buffers.shade, buffers.texture)
    lowered = jax.jit(chained).lower(params0)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print("wrote", out_path, len(txt), "bytes")


if __name__ == "__main__":
    main()
