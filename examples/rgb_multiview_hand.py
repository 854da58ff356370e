"""Fit a hand mesh to three RGB views with per-frame pose
(reference: deodr/examples/rgb_multiview_hand.py)."""

from __future__ import annotations

import glob
import os
from typing import List

import numpy as np
import PIL.Image

import deodr_tpu
from deodr_tpu import read_obj
from deodr_tpu.mesh_fitter import MeshRGBFitterWithPoseMultiFrame


def run(max_iter: int = 300, display: bool = False) -> List[float]:
    hand_images = [
        np.asarray(PIL.Image.open(f)).astype(np.double) / 255
        for f in sorted(glob.glob(os.path.join(deodr_tpu.data_path, "hand_multiview", "*.jpg")))
    ]
    nb_frames = len(hand_images)

    obj_file = os.path.join(deodr_tpu.data_path, "hand.obj")
    faces, vertices = read_obj(obj_file)

    default_color = np.array([0.4, 0.3, 0.25]) * 1.5
    default_light_directional = -np.array([0.1, 0.5, 0.4])
    default_light_ambient = 0.6
    euler_init = np.vstack([np.array([0, yrot, 0]) for yrot in np.linspace(-0.5, 0.5, nb_frames)])
    vertices = vertices - np.mean(vertices, axis=0)
    t_init = np.array([0, -0.2, 0.2])
    translation_init = np.tile(t_init[None, :], [nb_frames, 1])

    hand_fitter = MeshRGBFitterWithPoseMultiFrame(
        vertices,
        faces,
        default_color=default_color,
        default_light_directional=default_light_directional,
        default_light_ambient=default_light_ambient,
        euler_init=euler_init,
        translation_init=translation_init,
        cregu=2000,
    )
    hand_fitter.reset()
    hand_fitter.set_images(hand_images)
    hand_fitter.set_background_color(np.array([0, 0, 0]))
    energies: List[float] = []
    for _ in range(max_iter):
        energy, images, diff_images = hand_fitter.step()
        energies.append(energy)
    return energies


if __name__ == "__main__":
    energies = run(max_iter=30)
    print("energy[-1] =", energies[-1])
