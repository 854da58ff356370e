"""Pixel-center convention tests.

Port of the reference's contract tests (reference:
tests/test_pixel_center_coordinates.py): a tiny triangle surrounding each
image corner must light exactly one pixel, for both pixel-center conventions.
"""

import numpy as np

from deodr_tpu import Scene2D


def test_pixel_center_coordinates() -> None:
    height, width = 4, 3
    integer_points = [(0, 0), (width - 1, 0), (0, height - 1), (width - 1, height - 1)]
    eps = 0.001
    for integer_pixel_centers in [False, True]:
        if integer_pixel_centers:
            points = [(float(x), float(y)) for x, y in integer_points]
        else:
            points = [(x + 0.5, y + 0.5) for x, y in integer_points]
        for (px, py), point in zip(integer_points, points):
            ij = np.array([[-eps, -eps], [-eps, eps], [eps, -eps]]) + np.array(point)
            scene = Scene2D(
                ij=ij,
                faces=np.array([[0, 2, 1]], dtype=np.uint32),
                faces_uv=np.array([[0, 2, 1]], dtype=np.uint32),
                uv=np.zeros((3, 2)),
                texture=np.ones((2, 2, 1)),
                height=height,
                width=width,
                nb_colors=1,
                background_color=np.array([0.0]),
                depths=np.array([1, 1, 1]),
                textured=np.array([0], dtype=bool),
                shade=np.array([1.0, 1, 1]),
                colors=np.array([[1.0], [1], [1]]),
                shaded=np.array([0], dtype=bool),
                edgeflags=np.zeros((1, 3), dtype=bool),
                strict_edge=False,
                perspective_correct=True,
                clockwise=True,
                integer_pixel_centers=integer_pixel_centers,
            )
            image, _ = scene.render(sigma=0)
            expected = np.zeros((height, width, 1))
            expected[py, px, 0] = 1
            np.testing.assert_allclose(image, expected, atol=1e-12)
