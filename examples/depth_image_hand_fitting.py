"""Fit a hand mesh to a depth image (reference:
deodr/examples/depth_image_hand_fitting.py)."""

from __future__ import annotations

import os
import time
from typing import List

import numpy as np

import deodr_tpu
from deodr_tpu import ColoredTriMesh, read_obj
from deodr_tpu.mesh_fitter import MeshDepthFitter, MeshDepthFitterEnergy


def run(
    plot_curves: bool = False,
    save_images: bool = False,
    display: bool = False,
    max_iter: int = 300,
    n_subdivision: int = 0,
    optimizer: str = "heavyball",
) -> List[float]:
    depth_image = np.fliplr(
        np.fromfile(os.path.join(deodr_tpu.data_path, "depth.bin"), dtype=np.float32)
        .reshape(240, 320)
        .astype(np.float64)
    )
    depth_image = depth_image[20:-20, 60:-60]
    max_depth = 450
    depth_image[depth_image == 0] = max_depth
    depth_image = depth_image / max_depth

    obj_file = os.path.join(deodr_tpu.data_path, "hand.obj")
    faces, vertices = read_obj(obj_file)
    mesh = ColoredTriMesh(faces.copy(), vertices=vertices, nb_colors=0).subdivise(n_subdivision)

    euler_init = np.array([0.1, 0.1, 0.1])
    translation_init = np.zeros(3)

    # "heavyball" = the reference numpy fitter's update rule;
    # "lbfgs" = the energy-module variant (reference: pytorch
    # MeshDepthFitterEnergy + torch.optim.LBFGS), optax.lbfgs-driven
    fitter_cls = {"heavyball": MeshDepthFitter, "lbfgs": MeshDepthFitterEnergy}[optimizer]
    hand_fitter = fitter_cls(
        np.asarray(mesh.vertices), mesh.faces, euler_init, translation_init, cregu=1000
    )
    distortion = np.array([1, 0, 0, 0, 0])
    hand_fitter.set_image(depth_image, focal=241, distortion=distortion)
    hand_fitter.set_max_depth(1)
    hand_fitter.set_depth_scale(110 / max_depth)
    energies: List[float] = []
    durations: List[float] = []
    start = time.time()
    for _ in range(max_iter):
        out = hand_fitter.step()
        energies.append(out[0] if isinstance(out, tuple) else out)
        durations.append(time.time() - start)
    return energies


if __name__ == "__main__":
    energies = run(max_iter=50)
    print("energy[49] =", energies[49])
