"""Fit a 2D triangle soup to a rendered target image.

Equivalent of the reference example (reference:
deodr/examples/triangle_soup_fitting.py): a ground-truth scene of 30 random
triangles (≈50% textured with Gouraud shading) is rendered with edge-overdraw
antialiasing; vertex positions are perturbed by σ=10px of noise and recovered
by heavy-ball gradient descent on the pixel SSD loss, in both
antialiase-image and antialiase-error modes.

``create_example_scene`` reproduces the reference's ``np.random`` call
sequence exactly so that, under the same seed, the ground-truth scene is
bit-identical to the reference's and final losses are directly comparable to
the reference's recorded goldens (reference:
tests/test_triangle_soup_fitting.py:29-107).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

import deodr_tpu
from deodr_tpu import Scene2D


def _load_material() -> np.ndarray:
    import PIL.Image

    path = os.path.join(deodr_tpu.data_path, "trefle.jpg")
    return np.asarray(PIL.Image.open(path)).astype(np.float64) / 255


def create_example_scene(
    n_tri: int = 30,
    width: int = 200,
    height: int = 200,
    clockwise: bool = False,
    textured_ratio: float = 0.5,
) -> Scene2D:
    material = _load_material()
    height_material, width_material = material.shape[0], material.shape[1]

    scale_matrix = np.array([[height, 0], [0, width]])
    scale_material = np.array([[height_material - 1, 0], [0, width_material - 1]])

    # minimum-area rejection threshold; the reference's constant 1500 is for
    # 200x200 scenes (reference: deodr/examples/triangle_soup_fitting.py:35) —
    # scale it with the image area so smaller test scenes terminate
    det_threshold = 1500 * (width / 200) * (height / 200)

    triangles = []
    for _ in range(n_tri):
        tmp = scale_matrix.dot(np.random.rand(2, 1).dot(np.ones((1, 3))) + 0.5 * (-0.5 + np.random.rand(2, 3)))
        while np.abs(np.linalg.det(np.vstack((tmp, np.ones(3))))) < det_threshold:
            tmp = scale_matrix.dot(np.random.rand(2, 1).dot(np.ones((1, 3))) + 0.5 * (-0.5 + np.random.rand(2, 3)))
        if np.linalg.det(np.vstack((tmp, np.ones(3)))) > 0:
            tmp = np.fliplr(tmp)
        triangle = {"ij": tmp.T, "depths": np.random.rand(1) * np.ones((3, 1))}
        triangle["textured"] = np.random.rand(1) > (1 - textured_ratio)
        if triangle["textured"]:
            triangle["uv"] = scale_material.dot(np.array([[0, 1, 0.2], [0, 0.2, 1]])).T + 1
            triangle["shade"] = np.random.rand(3, 1)
            triangle["colors"] = np.zeros((3, 3))
            triangle["shaded"] = True
        else:
            triangle["uv"] = np.zeros((3, 2))
            triangle["shade"] = np.zeros((3, 1))
            triangle["colors"] = np.random.rand(3, 3)
            triangle["shaded"] = False
        triangle["edgeflags"] = np.array([True, True, True])
        triangles.append(triangle)

    scene = {
        key: np.squeeze(np.vstack([np.array(triangle[key]) for triangle in triangles]))
        for key in ["ij", "depths", "textured", "uv", "shade", "colors", "shaded", "edgeflags"]
    }
    scene["faces"] = np.arange(3 * n_tri).reshape(-1, 3).astype(np.uint32)
    scene["faces_uv"] = np.arange(3 * n_tri).reshape(-1, 3).astype(np.uint32)
    if clockwise:
        scene["faces"] = np.fliplr(scene["faces"])
        scene["faces_uv"] = np.fliplr(scene["faces_uv"])
    scene["clockwise"] = clockwise
    scene["height"] = height
    scene["width"] = width
    scene["texture"] = material
    scene["nb_colors"] = 3
    scene["background_color"] = None
    scene["background_image"] = np.tile(np.array([0.3, 0.5, 0.7])[None, None, :], (height, width, 1))
    scene["perspective_correct"] = False
    scene["backface_culling"] = True
    return Scene2D(**scene)


def run(
    nb_max_iter: int = 500,
    display: bool = False,
    clockwise: bool = False,
    antialiase_error: bool = False,
    seed: int = 2,
) -> Tuple[List[float], np.ndarray]:
    np.random.seed(seed)
    scene_gt = create_example_scene(clockwise=clockwise)
    sigma = 1

    image_target, _ = scene_gt.render(sigma=sigma)

    n_vertices = len(scene_gt.depths)
    displacement_magnitude_ij = 10
    alpha_ij = 0.01
    beta_ij = 0.80

    np_state_scene = np.random.randn(n_vertices, 2)
    scene_iter = create_scene_copy(scene_gt)
    scene_iter.ij = scene_gt.ij + np_state_scene * displacement_magnitude_ij

    np.random.seed(seed)
    speed_ij = np.zeros((n_vertices, 2))

    losses: List[float] = []
    final_image = None
    for _ in range(nb_max_iter):
        image, _, _, loss = scene_iter.render_compare_and_backward(
            sigma=sigma, antialiase_error=antialiase_error, obs=image_target
        )
        losses.append(loss)
        final_image = image
        if displacement_magnitude_ij > 0:
            speed_ij = beta_ij * speed_ij - scene_iter.ij_b * alpha_ij
            scene_iter.ij = scene_iter.ij + speed_ij
    return losses, final_image


def create_scene_copy(scene: Scene2D) -> Scene2D:
    return Scene2D(
        faces=scene.faces.copy(),
        faces_uv=scene.faces_uv.copy(),
        ij=scene.ij.copy(),
        depths=scene.depths.copy(),
        textured=scene.textured.copy(),
        uv=scene.uv.copy(),
        shade=scene.shade.copy(),
        colors=scene.colors.copy(),
        shaded=scene.shaded.copy(),
        edgeflags=scene.edgeflags.copy(),
        height=scene.height,
        width=scene.width,
        nb_colors=scene.nb_colors,
        texture=scene.texture.copy(),
        background_image=None if scene.background_image is None else scene.background_image.copy(),
        background_color=None if scene.background_color is None else scene.background_color.copy(),
        clockwise=scene.clockwise,
        backface_culling=scene.backface_culling,
        strict_edge=scene.strict_edge,
        perspective_correct=scene.perspective_correct,
        integer_pixel_centers=scene.integer_pixel_centers,
    )


if __name__ == "__main__":
    for aa_err in [False, True]:
        losses, _ = run(nb_max_iter=500, antialiase_error=aa_err)
        print(f"antialiase_error={aa_err}: final loss = {losses[-1]}")
