"""Dump a Scene3D's 2.5D scene buffers as flat binary files for the native
baseline harnesses (tools/duck_baseline.cpp). Run on CPU in float64 so the
reference core gets the exact inputs the JAX renderer sees."""

from __future__ import annotations

import os
import sys

import numpy as np


def dump_duck(stem="/tmp/duck_scene"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import deodr_tpu
    from deodr_tpu import ColoredTriMesh, default_camera
    from deodr_tpu.scene import Scene3D

    mesh = ColoredTriMesh.load(os.path.join(deodr_tpu.data_path, "duck.obj"))
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    camera = default_camera(640, 480, 60, np.asarray(mesh.vertices), rot)
    scene = Scene3D(sigma=1.0)
    scene.set_mesh(mesh)
    scene.set_light(np.array([-0.4, -0.4, -0.8]), 0.4)
    scene.set_background_color(np.array([0.2, 0.3, 0.5]))
    b, _ = scene._build_buffers(camera, *scene._diff_inputs(False), True, None)
    b = jax.tree.map(lambda x: None if x is None else np.asarray(x), b)

    t = b.faces.shape[0]
    v = b.ij.shape[0]
    vuv = b.uv.shape[0]
    c = b.colors.shape[1]
    th, tw = b.texture.shape[:2]
    np.asarray([t, v, vuv, b.height, b.width, c, th, tw], np.int32).tofile(stem + ".meta")
    b.faces.astype(np.uint32).tofile(stem + ".faces")
    b.faces_uv.astype(np.uint32).tofile(stem + ".faces_uv")
    b.ij.astype(np.float64).tofile(stem + ".ij")
    b.depths.astype(np.float64).tofile(stem + ".depths")
    b.uv.astype(np.float64).tofile(stem + ".uv")
    b.shade.astype(np.float64).tofile(stem + ".shade")
    b.colors.astype(np.float64).tofile(stem + ".colors")
    flags = np.concatenate(
        [b.edgeflags.reshape(-1).astype(np.uint8), b.textured.astype(np.uint8), b.shaded.astype(np.uint8)]
    )
    flags.tofile(stem + ".flags")
    b.texture.astype(np.float64).tofile(stem + ".texture")
    np.asarray(b.background_color, np.float64).tofile(stem + ".bg")
    print(f"dumped {stem}.* (T={t}, V={v}, {b.height}x{b.width}, tex {th}x{tw})")


if __name__ == "__main__":
    dump_duck(sys.argv[1] if len(sys.argv) > 1 else "/tmp/duck_scene")
