"""As-rigid-as-possible Laplacian regularization energy.

The reference precomputes the sparse matrix ``kron(LᵀL, I₃)`` and does sparse
matvecs (reference: deodr/laplacian_rigid_energy.py:13-41). On TPU we apply
the graph Laplacian twice via gather/segment_sum (L is symmetric, so
LᵀL·x = L(L·x)) — no sparse matrices, fully jit/grad-compatible.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from deodr_tpu.geometry.mesh import TriMesh


def _count_components(edges: np.ndarray, nb_vertices: int) -> int:
    """Union-find connected-component count over the edge list."""
    parent = np.arange(nb_vertices)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return len({find(i) for i in range(nb_vertices)})


class LaplacianRigidEnergy:
    """E(V) = ½·cregu·‖L(V − V_ref)‖²  with L the graph Laplacian.

    ``evaluate`` returns (energy, gradient, approx_hessian_matvec) where the
    gradient is cregu·LᵀL(V−V_ref), matching the reference
    (reference: deodr/laplacian_rigid_energy.py:33-41).
    """

    def __init__(self, mesh: TriMesh, vertices, cregu: float):
        self.mesh = mesh
        self.cregu = cregu
        self.vertices_ref = jnp.asarray(vertices)
        adj = mesh.adjacencies
        if _count_components(adj.edges, adj.nb_vertices) > 1:
            raise ValueError("You have more than one connected component in your mesh.")

    def evaluate(self, vertices: jnp.ndarray):
        adj = self.mesh.adjacencies
        diff = vertices - self.vertices_ref
        l_diff = adj.laplacian_apply(diff)
        grad = self.cregu * adj.laplacian_apply(l_diff)
        energy = 0.5 * jnp.sum(diff * grad)
        return energy, grad, self.approx_hessian_matvec

    def approx_hessian_matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        adj = self.mesh.adjacencies
        return self.cregu * adj.laplacian_apply(adj.laplacian_apply(x))
