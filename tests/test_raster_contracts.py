"""Rasterization contract tests: backface culling modes and the
``strict_edge`` shared-edge rule (no cracks, no double-draw) —
reference semantics: C++/DifferentiableRenderer.h:886-896, :2786."""

import numpy as np

from deodr_tpu import Scene2D


def _scene(faces, ij, colors, backface_culling, strict_edge=True, width=32, height=32):
    nv = ij.shape[0]
    nt = faces.shape[0]
    return Scene2D(
        faces=faces,
        faces_uv=faces,
        ij=ij,
        depths=np.ones(nv),
        textured=np.zeros(nt, bool),
        uv=np.zeros((nv, 2)),
        shade=np.zeros(nv),
        colors=colors,
        shaded=np.zeros(nt, bool),
        edgeflags=np.zeros((nt, 3), bool),
        height=height,
        width=width,
        nb_colors=1,
        texture=np.zeros((0, 0)),
        background_color=np.array([0.0]),
        backface_culling=backface_culling,
        strict_edge=strict_edge,
        clockwise=False,
    )


def test_backface_culling_modes():
    # counter-clockwise convention: this triangle is a back face
    ij = np.array([[2.0, 2.0], [25.0, 4.0], [5.0, 25.0]])
    # winding makes signed area negative under the ccw convention
    faces = np.array([[0, 1, 2]], dtype=np.int32)
    colors = np.ones((3, 1))
    culled, _ = _scene(faces, ij, colors, backface_culling=True).render(sigma=0)
    drawn, _ = _scene(faces, ij, colors, backface_culling=False).render(sigma=0)
    front_faces = np.array([[0, 2, 1]], dtype=np.int32)
    front, _ = _scene(front_faces, ij, colors, backface_culling=True).render(sigma=0)
    assert culled.sum() == 0 or front.sum() > 0  # one of the windings is front
    # exactly one of the two windings rasterizes under culling
    assert (culled.sum() == 0) != (front.sum() == 0)
    # with culling off, the back face is drawn and matches the front winding
    np.testing.assert_allclose(drawn.sum(), max(culled.sum(), front.sum()))


def test_strict_edge_no_cracks_no_double_draw():
    rng = np.random.RandomState(0)
    for _ in range(5):
        # a random quad split along its diagonal into two triangles with
        # distinct colors; strict_edge must draw every interior pixel exactly
        # once (no background cracks along the diagonal; z-ties can't double
        # blend since colors are constant per face)
        base = rng.rand(2, 2) * 10 + np.array([8, 8])
        quad = np.array(
            [
                base[0],
                base[0] + [12 + rng.rand() * 4, rng.rand() * 3],
                base[0] + [13 + rng.rand() * 4, 12 + rng.rand() * 3],
                base[0] + [rng.rand() * 3, 11 + rng.rand() * 4],
            ]
        )
        faces = np.array([[0, 2, 1], [0, 3, 2]], dtype=np.int32)
        # orient both faces front under ccw convention
        def area(f):
            u = quad[f[1]] - quad[f[0]]
            v = quad[f[2]] - quad[f[0]]
            return -(u[0] * v[1] - v[0] * u[1])

        faces = np.array([f if area(f) > 0 else [f[0], f[2], f[1]] for f in faces], dtype=np.int32)
        colors = np.array([[1.0], [1.0], [1.0], [1.0]])
        image, _ = _scene(faces, quad, colors, backface_culling=True, strict_edge=True).render(sigma=0)
        img = image[:, :, 0]
        # interior sample points of the quad must all be covered
        from matplotlib.path import Path

        poly = Path(quad)
        ys, xs = np.mgrid[0:32, 0:32]
        pts = np.stack([xs.ravel(), ys.ravel()], axis=1)
        strictly_inside = poly.contains_points(pts, radius=-1.5).reshape(32, 32)
        assert np.all(img[strictly_inside] > 0.5), "crack along the shared edge"
