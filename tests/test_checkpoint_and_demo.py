"""Checkpoint/resume round trip and the headless turntable demo."""

import os

import numpy as np


def test_fitter_checkpoint_roundtrip(tmp_path):
    from deodr_tpu.checkpoint import load_fitter, save_fitter
    from examples.depth_image_hand_fitting import run  # noqa: F401 (imports data helpers)
    import deodr_tpu
    from deodr_tpu import read_obj
    from deodr_tpu.mesh_fitter import MeshDepthFitter

    faces, vertices = read_obj(os.path.join(deodr_tpu.data_path, "hand.obj"))
    fitter = MeshDepthFitter(vertices, faces, np.array([0.1, 0.1, 0.1]), np.zeros(3), cregu=1000)
    fitter.vertices = fitter.vertices + 0.01
    fitter.speed_vertices = fitter.speed_vertices + 0.5
    fitter.iter = 7
    path = str(tmp_path / "state.npz")
    save_fitter(fitter, path)

    fitter2 = MeshDepthFitter(vertices, faces, np.array([0.1, 0.1, 0.1]), np.zeros(3), cregu=1000)
    load_fitter(fitter2, path)
    np.testing.assert_allclose(fitter2.vertices, fitter.vertices)
    np.testing.assert_allclose(fitter2.speed_vertices, fitter.speed_vertices)
    assert fitter2.iter == 7


def test_turntable_demo(tmp_path):
    from examples.turntable import run

    frames = run(n_frames=2, width=96, height=64, out_dir=str(tmp_path))
    assert len(frames) == 2
    assert frames[0].shape == (64, 96, 3)
    assert os.path.exists(tmp_path / "frame_001.png")
    # the two views must differ (the turntable actually turned)
    assert np.abs(frames[0].astype(int) - frames[1].astype(int)).max() > 10
