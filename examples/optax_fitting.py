"""Mesh fitting with optax optimizers.

The reference-parity fitters use the reference's heavy-ball optimizer;
because this framework's render energy is one pure jitted function, any
optax optimizer drops in directly. This example fits the depth hand scene
with Adam inside a fully-jitted step.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
import optax

import deodr_tpu
from deodr_tpu import ColoredTriMesh, read_obj
from deodr_tpu.camera import Camera
from deodr_tpu.geometry.energy import LaplacianRigidEnergy
from deodr_tpu.geometry.transforms import normalize, qrot
from deodr_tpu.ops.render import SceneBuffers, render_scene


def run(max_iter: int = 100, learning_rate: float = 5e-4) -> List[float]:
    depth_image = np.fliplr(
        np.fromfile(os.path.join(deodr_tpu.data_path, "depth.bin"), dtype=np.float32)
        .reshape(240, 320)
        .astype(np.float64)
    )[20:-20, 60:-60]
    max_depth = 450
    depth_image[depth_image == 0] = max_depth
    depth_image = depth_image / max_depth

    faces, vertices = read_obj(os.path.join(deodr_tpu.data_path, "hand.obj"))
    mesh = ColoredTriMesh(faces, vertices=vertices, nb_colors=0)
    rigid = LaplacianRigidEnergy(mesh, vertices, cregu=1000)

    height, width = depth_image.shape
    object_center = vertices.mean(axis=0)
    object_radius = np.max(np.std(vertices, axis=0))
    camera_center = object_center + np.array([-0.5, 0, 5]) * object_radius
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    intrinsic = np.array([[241.0, 0, width / 2], [0, 241.0, height / 2], [0, 0, 1]])
    camera = Camera(
        extrinsic=np.column_stack((rot, -rot.T.dot(camera_center))),
        intrinsic=intrinsic,
        distortion=np.array([1.0, 0, 0, 0, 0]),
        height=height,
        width=width,
    )
    obs = jnp.asarray(depth_image)
    depth_scale = 110 / max_depth
    adjf = mesh.adjacencies

    def energy(params):
        q_n = normalize(params["quaternion"])
        vt = qrot(q_n, params["vertices"]) + params["translation"]
        points_2d, depths = camera.project_points(vt)
        edgeflags = jax.lax.stop_gradient(mesh.edge_on_silhouette(points_2d))
        nbv = mesh.nb_vertices
        dtype = points_2d.dtype
        buffers = SceneBuffers(
            faces=jnp.asarray(mesh.faces),
            faces_uv=jnp.asarray(mesh.faces),
            ij=points_2d,
            depths=depths,
            uv=jnp.zeros((nbv, 2), dtype),
            shade=jnp.zeros((nbv,), dtype),
            colors=depths[:, None] * depth_scale,
            edgeflags=edgeflags,
            textured=jnp.zeros((mesh.nb_faces,), bool),
            shaded=jnp.zeros((mesh.nb_faces,), bool),
            texture=None,
            background_image=None,
            background_color=jnp.asarray([1.0], dtype),
            height=height,
            width=width,
            clockwise=False,
            backface_culling=True,
            strict_edge=True,
            perspective_correct=False,
            integer_pixel_centers=True,
        )
        image, _, _ = render_scene(buffers, 1.0, aa_edge_capacity=512)
        depth_clipped = jnp.clip(image, 0, 1.0)
        e_data = jnp.sum((depth_clipped - obs[:, :, None]) ** 2)
        e_rigid, _, _ = rigid.evaluate(params["vertices"])
        return e_data + e_rigid

    params = {
        "vertices": jnp.asarray(vertices),
        "quaternion": jnp.asarray(
            np.asarray(
                __import__("scipy.spatial.transform", fromlist=["Rotation"]).Rotation.from_euler(
                    "zyx", [0.1, 0.1, 0.1]
                ).as_quat()
            )
        ),
        "translation": jnp.zeros(3),
    }
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        e, grads = jax.value_and_grad(energy)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, e

    energies: List[float] = []
    for _ in range(max_iter):
        params, opt_state, e = step(params, opt_state)
        energies.append(float(e))
    return energies


if __name__ == "__main__":
    energies = run(max_iter=60)
    print("energy[0] =", energies[0], " energy[-1] =", energies[-1])
