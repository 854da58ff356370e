"""Texel convention tests (reference: tests/test_texture_coordinates.py):
integer texel centers, origin at the upper-left; sampling at uv=(0,0)
returns texture[0,0], for both windings."""

import numpy as np

from deodr_tpu import Scene2D


def test_texture_coordinates() -> None:
    texture = np.array([[[1, 0, 0], [0, 1, 0]], [[0, 0, 1], [1, 1, 1]]], dtype=np.float64)
    uv = np.array([[0, 0], [1, 0], [0, 1]])
    ij = np.array([[1, 1], [1, 15], [15, 1]])
    for clockwise in [False, True]:
        if clockwise:
            faces = np.array([[0, 2, 1]], dtype=np.uint32)
        else:
            faces = np.array([[0, 1, 2]], dtype=np.uint32)
        scene = Scene2D(
            ij=ij,
            faces=faces,
            faces_uv=faces,
            uv=uv,
            texture=texture,
            height=40,
            width=60,
            nb_colors=3,
            background_color=np.array([0.0, 0, 0]),
            depths=np.array([1, 1, 1]),
            textured=np.array([1], dtype=bool),
            shade=np.array([1.0, 1, 1]),
            colors=np.eye(3),
            shaded=np.array([1], dtype=bool),
            edgeflags=np.zeros((1, 3), dtype=bool),
            strict_edge=False,
            perspective_correct=True,
            clockwise=clockwise,
        )
        image, _ = scene.render(sigma=0)
        np.testing.assert_allclose(image[0, :, :], 0, atol=1e-12)
        np.testing.assert_allclose(image[:, 0, :], 0, atol=1e-12)
        np.testing.assert_allclose(image[1, 1, :], [1, 0, 0], atol=1e-9)
        np.testing.assert_allclose(image[15, 1, :], [0, 1, 0], atol=1e-9)
        np.testing.assert_allclose(image[1, 15, :], [0, 0, 1], atol=1e-9)
