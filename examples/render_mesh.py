"""Render the duck test mesh (textured, Gouraud-shaded, distorted camera).

Equivalent of the reference example (reference:
deodr/examples/render_mesh.py): loads duck.obj, builds a default camera with
OpenCV distortion, renders RGB with edge-overdraw antialiasing, and exposes
the deferred G-buffer channels.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

import deodr_tpu
from deodr_tpu import Camera, ColoredTriMesh, Scene3D, default_camera


def default_scene(
    obj_file: str,
    width: int = 640,
    height: int = 480,
    use_distortion: bool = True,
    integer_pixel_centers: bool = True,
) -> Tuple[Scene3D, Camera]:
    mesh = ColoredTriMesh.load(obj_file)

    # camera rotated 180 deg about x (y-down image frame), as in the reference
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    camera = default_camera(width, height, 80, np.asarray(mesh.vertices), rot)
    if use_distortion:
        camera.distortion = np.array([-0.5, 0.5, 0, 0, 0])

    scene = Scene3D(integer_pixel_centers=integer_pixel_centers)
    scene.set_light(light_directional=0.3 * np.array([1, -1, 0]), light_ambient=0)
    scene.set_mesh(mesh)
    scene.set_background_color(np.array((0.8, 0.8, 0.8)))
    return scene, camera


def example_rgb(display: bool = False, save_image: bool = False, width: int = 640, height: int = 480) -> np.ndarray:
    obj_file = os.path.join(deodr_tpu.data_path, "duck.obj")
    scene, camera = default_scene(obj_file, width=width, height=height)
    image = scene.render(camera)
    if save_image:
        import PIL.Image

        out = os.path.join(deodr_tpu.data_path, "test", "duck_tpu.png")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        PIL.Image.fromarray((image * 255).astype(np.uint8)).save(out)
    if display:
        import matplotlib.pyplot as plt

        plt.imshow(image)
        plt.show()
    return image


def example_channels(width: int = 320, height: int = 240):
    obj_file = os.path.join(deodr_tpu.data_path, "duck.obj")
    scene, camera = default_scene(obj_file, width=width, height=height)
    scene.sigma = 0
    return scene.render_deferred(camera)


if __name__ == "__main__":
    img = example_rgb(save_image=True)
    print("rendered duck:", img.shape, img.min(), img.max())
