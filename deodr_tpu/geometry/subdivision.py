"""Loop subdivision (reference: deodr/triangulated_mesh.py:499-562).

Re-expressed with dense index arrays + segment sums instead of the
reference's scipy.sparse products. Topology work happens in numpy at build
time; the vertex/color update rules are identical:

- edge midpoints: 1/8·(Σ vertices of the ≤2 adjacent faces) + 1/8·(edge ends)
  which for interior edges is the classic 3/8·ends + 1/8·opposites rule;
- moved original vertices: (3/8·1/deg)·Σ neighbors + 5/8·self.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import ops as jax_ops


def loop_subdivision(mesh, n_iter: int = 1):
    from deodr_tpu.geometry.mesh import ColoredTriMesh

    if n_iter == 0:
        return mesh
    if n_iter > 1:
        mesh = loop_subdivision(mesh, n_iter - 1)
    if mesh.uv is not None:
        raise ValueError("Textured mesh not supported yet in subdivision.")

    adj = mesh.adjacencies
    vertices = mesh.vertices
    nv = adj.nb_vertices

    # per-face vertex sums, scattered onto adjacent edges
    face_sums = jnp.sum(vertices[adj.faces_j], axis=1)  # (F, 3)
    ef = adj.edge_faces_j
    face_part = jnp.where(ef[:, 0:1] >= 0, face_sums[jnp.maximum(ef[:, 0], 0)], 0.0) + jnp.where(
        ef[:, 1:2] >= 0, face_sums[jnp.maximum(ef[:, 1], 0)], 0.0
    )
    edge_mid_points = face_part / 8 + jnp.sum(vertices[adj.edges_j], axis=1) / 8

    # moved original vertices
    e = adj.edges_j
    neighbor_sum = jax_ops.segment_sum(
        jnp.concatenate([vertices[e[:, 1]], vertices[e[:, 0]]], axis=0),
        jnp.concatenate([e[:, 0], e[:, 1]], axis=0),
        num_segments=nv,
    )
    beta = (3 / 8) * (1 / adj.degree_v_e_j)
    moved_points = beta[:, None] * neighbor_sum + (5 / 8) * vertices

    new_vertices = jnp.vstack((moved_points, edge_mid_points))

    fe = adj.faces_edges + nv  # numpy (F,3)
    faces = adj.faces
    faces1 = np.column_stack((faces[:, 0], fe[:, 0], fe[:, 2]))
    faces2 = np.column_stack((faces[:, 1], fe[:, 1], fe[:, 0]))
    faces3 = np.column_stack((faces[:, 2], fe[:, 2], fe[:, 1]))
    faces4 = np.column_stack((fe[:, 0], fe[:, 1], fe[:, 2]))
    new_faces = np.vstack((faces1, faces2, faces3, faces4))

    if mesh.vertices_colors is not None:
        edge_mid_colors = jnp.mean(mesh.vertices_colors[adj.edges_j], axis=1)
        new_colors = jnp.vstack((mesh.vertices_colors, edge_mid_colors))
    else:
        new_colors = None
    return ColoredTriMesh(new_faces, new_vertices, colors=new_colors, nb_colors=mesh.nb_colors)
