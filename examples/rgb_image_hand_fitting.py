"""Fit a colored hand mesh to an RGB image (reference:
deodr/examples/rgb_image_hand_fitting.py)."""

from __future__ import annotations

import os
import time
from typing import List

import numpy as np
import PIL.Image

import deodr_tpu
from deodr_tpu import ColoredTriMesh, read_obj
from deodr_tpu.mesh_fitter import MeshRGBFitterWithPose


def run(
    plot_curves: bool = False,
    save_images: bool = False,
    display: bool = False,
    max_iter: int = 100,
    n_subdivision: int = 0,
) -> List[float]:
    hand_image = np.asarray(PIL.Image.open(os.path.join(deodr_tpu.data_path, "hand.png"))).astype(np.double) / 255
    if hand_image.ndim == 3 and hand_image.shape[2] == 4:
        hand_image = hand_image[:, :, :3]

    obj_file = os.path.join(deodr_tpu.data_path, "hand.obj")
    faces, vertices = read_obj(obj_file)
    mesh = ColoredTriMesh(faces.copy(), vertices=vertices, nb_colors=3).subdivise(n_subdivision)

    default_color = np.array([0.4, 0.3, 0.25])
    default_light_directional = -np.array([0.1, 0.5, 0.4])
    default_light_ambient = 0.6
    euler_init = np.array([0, 0, 0])
    translation_init = np.mean(np.asarray(mesh.vertices), axis=0)
    mesh.set_vertices(np.asarray(mesh.vertices) - translation_init[None, :])

    hand_fitter = MeshRGBFitterWithPose(
        np.asarray(mesh.vertices),
        mesh.faces,
        default_color=default_color,
        default_light_directional=default_light_directional,
        default_light_ambient=default_light_ambient,
        update_lights=True,
        update_color=True,
        euler_init=euler_init,
        translation_init=translation_init,
        cregu=1000,
    )
    hand_fitter.reset()
    background_color = np.array([0.5, 0.6, 0.7])
    distortion = np.array([-1, 0, 0, 0, 0])
    hand_fitter.set_image(hand_image, distortion=distortion)
    hand_fitter.set_background_color(background_color)

    energies: List[float] = []
    start = time.time()
    for _ in range(max_iter):
        energy, image, diff_image = hand_fitter.step()
        energies.append(energy)
    return energies


if __name__ == "__main__":
    energies = run(max_iter=50)
    print("energy[49] =", energies[49])
