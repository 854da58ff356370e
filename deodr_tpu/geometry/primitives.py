"""Procedural test/benchmark meshes (no external assets needed)."""

from __future__ import annotations

import numpy as np

from deodr_tpu.geometry.mesh import ColoredTriMesh


def octahedron_mesh(n_subdivision: int = 0, colors=None) -> ColoredTriMesh:
    """A closed manifold octahedron (optionally Loop-subdivided into a
    sphere-like mesh), wound so normals point outward under the
    counter-clockwise convention."""
    vertices = np.array(
        [
            [1.0, 0, 0],
            [-1.0, 0, 0],
            [0, 1.0, 0],
            [0, -1.0, 0],
            [0, 0, 1.0],
            [0, 0, -1.0],
        ]
    )
    faces = []
    for x, y, z in [(0, 2, 4), (2, 1, 4), (1, 3, 4), (3, 0, 4), (2, 0, 5), (1, 2, 5), (3, 1, 5), (0, 3, 5)]:
        v0, v1, v2 = vertices[x], vertices[y], vertices[z]
        if np.dot(v0, np.cross(v1, v2)) < 0:
            x, y, z = x, z, y
        faces.append([x, y, z])
    faces = np.array(faces, dtype=np.int32)
    if colors is None:
        colors = 0.5 + 0.4 * vertices
    mesh = ColoredTriMesh(faces, vertices, colors=np.asarray(colors))
    if n_subdivision > 0:
        mesh = mesh.subdivise(n_subdivision)
        # project back onto the unit sphere for a clean benchmark shape
        v = np.asarray(mesh.vertices)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        mesh = ColoredTriMesh(mesh.faces, v, colors=np.asarray(mesh.vertices_colors))
    return mesh
