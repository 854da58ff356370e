"""Headless drive of the interactive viewer and the mesh plot helpers.

The reference's viewer (reference: deodr/examples/mesh_viewer.py) is
interactive-only; here the Viewer exposes render_frame()/process_key()
directly so its full toggle surface is testable without a display.
"""

import os

import numpy as np
import pytest

from deodr_tpu.geometry.primitives import octahedron_mesh
from examples.mesh_viewer import CameraInteractor, Viewer


def small_mesh():
    mesh = octahedron_mesh(2)
    return mesh


def make_viewer(tmp_path):
    viewer = Viewer(small_mesh(), width=64, height=48, headless=True)
    viewer.video_path = str(tmp_path / "rec.avi")
    return viewer


def test_viewer_renders_and_toggles(tmp_path):
    viewer = make_viewer(tmp_path)
    frame = viewer.render_frame()
    assert frame.shape == (48, 64, 3) and frame.dtype == np.uint8
    # the mesh must be visible: some pixels differ from the background
    assert (np.abs(frame.astype(int) - frame[0, 0].astype(int)).max(axis=2) > 10).any()

    # toggles rebuild the scene and still render
    viewer.process_key(ord("a"))  # antialiasing off
    assert viewer.scene.sigma == 0.0
    f2 = viewer.render_frame()
    assert f2.shape == frame.shape

    viewer.process_key(ord("l"))  # lights off -> pure ambient
    f3 = viewer.render_frame()
    assert f3.shape == frame.shape

    viewer.process_key(ord("r"))  # renderer impl cycle auto -> xla
    assert viewer.impl == "xla"
    f4 = viewer.render_frame()
    np.testing.assert_allclose(f4, f3, atol=1)  # same picture, other impl

    viewer.process_key(ord("q"))
    assert viewer.running is False


def test_viewer_camera_interaction(tmp_path):
    viewer = make_viewer(tmp_path)
    base = viewer.render_frame()
    viewer.interactor.rotate(20, 10)
    rotated = viewer.render_frame()
    assert (base != rotated).any()
    viewer.interactor.zoom(0.5)
    zoomed = viewer.render_frame()
    assert (rotated != zoomed).any()
    # camera stays a valid OpenCV camera after interaction
    cam = viewer.interactor.camera()
    r = cam.extrinsic[:, :3]
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-9)


def test_viewer_pan_keeps_orthonormal():
    inter = CameraInteractor(np.zeros(3), 1.0, 64, 48)
    inter.rotate(5, -3)
    inter.pan(4, 7)
    r = inter.camera().extrinsic[:, :3]
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-9)


def test_viewer_pickle_and_video(tmp_path):
    viewer = make_viewer(tmp_path)
    path = viewer.pickle_scene_and_camera(str(tmp_path / "scene.pickle"))
    assert os.path.exists(path)

    cv2 = pytest.importorskip("cv2")
    assert cv2 is not None
    viewer.process_key(ord("v"))  # start recording
    viewer.render_frame()
    viewer.render_frame()
    viewer.process_key(ord("v"))  # stop
    assert os.path.exists(viewer.video_path)
    assert os.path.getsize(viewer.video_path) > 0


def test_mesh_plot_helpers(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mesh = small_mesh()
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    mesh.plot(ax)
    fig.savefig(tmp_path / "mesh.png")
    plt.close(fig)

    # textured mesh -> plot_uv_map
    from deodr_tpu import ColoredTriMesh

    tex = np.linspace(0, 1, 4 * 4 * 3).reshape(4, 4, 3)
    tri = ColoredTriMesh(
        faces=np.array([[0, 1, 2]], dtype=np.int32),
        vertices=np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]),
        faces_uv=np.array([[0, 1, 2]], dtype=np.int32),
        uv=np.array([[0.0, 0], [3, 0], [0, 3]]),
        texture=tex,
        compute_adjacencies=False,
    )
    fig, ax = plt.subplots()
    tri.plot_uv_map(ax)
    fig.savefig(tmp_path / "uv.png")
    plt.close(fig)
