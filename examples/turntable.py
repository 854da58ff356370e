"""Headless turntable demo: render a mesh from a rotating camera into PNG
frames (and optionally an mp4 via OpenCV). This is the non-interactive
analog of the reference's OpenCV viewer (reference:
deodr/examples/mesh_viewer.py) — toggles for antialiasing and lighting are
function arguments instead of key bindings.
"""

from __future__ import annotations

import os

import numpy as np

import deodr_tpu
from deodr_tpu import ColoredTriMesh, Scene3D, default_camera


def run(
    obj_file: str | None = None,
    n_frames: int = 12,
    width: int = 320,
    height: int = 240,
    sigma: float = 1.0,
    out_dir: str = "./turntable_frames",
    save_video: bool = False,
    light_directional=(0.3, -0.3, 0),
    light_ambient: float = 0.0,
):
    import PIL.Image
    from scipy.spatial.transform import Rotation

    if obj_file is None:
        obj_file = os.path.join(deodr_tpu.data_path, "duck.obj")
    mesh = ColoredTriMesh.load(obj_file)
    scene = Scene3D(sigma=sigma)
    scene.set_light(light_directional=np.asarray(light_directional), light_ambient=light_ambient)
    scene.set_mesh(mesh)
    scene.set_background_color(np.array([0.8, 0.8, 0.8]))

    os.makedirs(out_dir, exist_ok=True)
    frames = []
    for i in range(n_frames):
        angle = 360.0 * i / n_frames
        rot = Rotation.from_euler("xyz", [180, angle, 0], degrees=True).as_matrix()
        camera = default_camera(width, height, 80, np.asarray(mesh.vertices), rot)
        image = scene.render(camera)
        frame = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        PIL.Image.fromarray(frame).save(os.path.join(out_dir, f"frame_{i:03d}.png"))
        frames.append(frame)

    if save_video:
        import cv2

        writer = cv2.VideoWriter(
            os.path.join(out_dir, "turntable.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 12, (width, height)
        )
        for f in frames:
            writer.write(f[:, :, ::-1])
        writer.release()
    return frames


if __name__ == "__main__":
    frames = run(n_frames=4)
    print(f"rendered {len(frames)} frames")
