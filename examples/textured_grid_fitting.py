"""Fit a deformable textured 2D grid to an image — gradients through the
texture UVs, texture intensities and vertex positions.

TPU-native analog of the reference's eigen-faces example (reference:
deodr/examples/eigen_faces.py), which fits PCA face coefficients through
``texture_b`` gradients; that example needs a network-downloaded dataset, so
here the same rendering capability (optimizing a scene through the bilinear
texture sampler) is demonstrated by recovering a grid deformation and the
texture itself from a rendered target.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np
from scipy.spatial import Delaunay

import deodr_tpu
from deodr_tpu import Scene2D


def make_grid_scene(texture: np.ndarray, n: int = 5, size: int = 64, seed: int = 0) -> Tuple[Scene2D, np.ndarray]:
    points = np.column_stack([t.flatten() for t in np.meshgrid(np.arange(n + 1) / n, np.arange(n + 1) / n)])
    tri = Delaunay(points)
    triangles = tri.simplices.astype(np.int32)
    on_border = np.any((points == 0) | (points == 1), axis=1)

    np.random.seed(seed)
    max_displacement = 0.5
    points_deformed = points + (np.random.rand(*points.shape) - 0.5) * max_displacement / n
    points_deformed[on_border] = points[on_border]

    nb_points = points.shape[0]
    nb_triangles = triangles.shape[0]
    th, tw = texture.shape[:2]
    scene = Scene2D(
        faces=triangles,
        faces_uv=triangles,
        ij=points_deformed * size - 0.5,
        depths=np.ones(nb_points),
        textured=np.ones(nb_triangles, dtype=bool),
        uv=np.column_stack((points[:, 0] * (tw - 1), points[:, 1] * (th - 1))),
        shade=np.ones(nb_points),
        colors=np.ones((nb_points, texture.shape[2])),
        shaded=np.ones(nb_triangles, dtype=bool),
        edgeflags=np.zeros((nb_triangles, 3), dtype=bool),
        height=size,
        width=size,
        nb_colors=texture.shape[2],
        texture=texture,
        background_color=np.zeros(texture.shape[2]),
        clockwise=True,
        backface_culling=True,
    )
    return scene, points_deformed


def run(max_iter: int = 200, fit_texture: bool = True, fit_positions: bool = True, size: int = 64) -> List[float]:
    import PIL.Image

    img = PIL.Image.open(os.path.join(deodr_tpu.data_path, "trefle.jpg")).convert("L").resize((size, size))
    texture_gt = (np.asarray(img).astype(np.float64) / 255)[:, :, None]

    scene_gt, _ = make_grid_scene(texture_gt, size=size, seed=0)
    target, _ = scene_gt.render(sigma=1)

    # start from the undeformed grid and a flat texture
    scene_fit, _ = make_grid_scene(texture_gt, size=size, seed=1)
    if fit_texture:
        scene_fit.texture = np.full_like(texture_gt, 0.5)

    losses: List[float] = []
    speed_ij = np.zeros_like(scene_fit.ij)
    speed_tex = np.zeros_like(scene_fit.texture)
    for _ in range(max_iter):
        _, _, _, err = scene_fit.render_compare_and_backward(obs=target, sigma=1)
        losses.append(err)
        if fit_positions:
            speed_ij = 0.8 * speed_ij - 0.005 * scene_fit.ij_b
            scene_fit.ij = scene_fit.ij + speed_ij
        if fit_texture:
            speed_tex = 0.8 * speed_tex - 0.05 * scene_fit.texture_b
            scene_fit.texture = np.clip(scene_fit.texture + speed_tex, 0, 1)
    return losses


if __name__ == "__main__":
    losses = run(max_iter=100)
    print("loss[0] =", losses[0], " loss[-1] =", losses[-1])
