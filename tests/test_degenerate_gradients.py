"""Gradient robustness against degenerate geometry in float32.

The cofactor determinant of the barycentric matrix subtracts O(coord²)
products; for sliver triangles at typical image coordinates the true area
sits below the fp32 rounding noise, the computed det rounds to exactly 0,
and the inf inverse NaNs the forward z/attribute rows — then reverse-mode
poisons every gradient (observed killing the RGB hand fit on TPU at
iteration 43). These tests pin the stable difference-form inverse and the
degenerate-edge guards: gradients must stay finite with exactly-collinear
triangles, slivers below fp32 noise, and zero-length silhouette edges.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from deodr_tpu.ops.common import safe_barycentric_matrices
from deodr_tpu.ops.render import SceneBuffers, render_scene
from deodr_tpu.ops.tiled import TilingConfig


def _scene_f32(ij, n_tri, height=64, width=96, edgeflags=None):
    rng = np.random.RandomState(0)
    faces = np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3)
    if edgeflags is None:
        edgeflags = np.zeros((n_tri, 3), bool)
    return SceneBuffers(
        faces=jnp.asarray(faces),
        faces_uv=jnp.asarray(faces),
        ij=jnp.asarray(ij, jnp.float32),
        depths=jnp.asarray(np.repeat(rng.rand(n_tri) + 0.5, 3), jnp.float32),
        uv=jnp.zeros((3 * n_tri, 2), jnp.float32),
        shade=jnp.zeros((3 * n_tri,), jnp.float32),
        colors=jnp.asarray(rng.rand(3 * n_tri, 3), jnp.float32),
        edgeflags=jnp.asarray(edgeflags),
        textured=jnp.zeros((n_tri,), bool),
        shaded=jnp.zeros((n_tri,), bool),
        texture=None,
        background_image=None,
        background_color=jnp.asarray([0.2, 0.3, 0.4], jnp.float32),
        height=height,
        width=width,
    )


def _degenerate_ij():
    """A healthy triangle + an exactly-collinear one + an fp32-noise sliver
    + a point triangle, all at realistic image coordinates."""
    v0 = np.array([201.13, 140.27], np.float32)
    d = np.array([50.31, 30.77], np.float32)
    tris = [
        [[10.0, 10.0], [20.0, 35.0], [40.0, 12.0]],          # healthy (ccw)
        [v0, v0 + d, v0 + 2 * d],                            # exactly collinear
        [v0, v0 + d, v0 + 2 * d + np.array([1e-5, -1e-5])],  # below-noise sliver
        [v0, v0, v0],                                        # point
    ]
    return np.asarray(tris, np.float32).reshape(-1, 2)


def test_safe_barycentric_flags_and_matches():
    ij = jnp.asarray(_degenerate_ij(), jnp.float32).reshape(4, 3, 2)
    inv, valid = safe_barycentric_matrices(ij)
    assert bool(valid[0]) and not bool(valid[1]) and not bool(valid[3])
    assert bool(jnp.isfinite(inv).all())
    # valid triangle: inverse maps corners to unit barycentrics
    v = jnp.concatenate([ij[0], jnp.ones((3, 1), jnp.float32)], axis=1)  # (3, 3) rows (x, y, 1)
    bary = jnp.einsum("kj,cj->ck", inv[0], v)
    assert float(jnp.abs(bary - jnp.eye(3)).max()) < 1e-4


def test_degenerate_triangles_finite_gradients_all_paths():
    ij = _degenerate_ij()
    base = _scene_f32(ij, 4)
    tiling = TilingConfig(16, 128, 16, 8)

    def loss(ij_j, tl, impl):
        img, _, _ = render_scene(dataclasses.replace(base, ij=ij_j), 0.0, tiling=tl, impl=impl,
                                 impl_interpret=(impl == "pallas"))
        return jnp.sum(img**2)

    for tl, impl in [(None, "xla"), (tiling, "xla"), (tiling, "pallas")]:
        val = jax.jit(loss, static_argnums=(1, 2))(base.ij, tl, impl)
        g = jax.jit(jax.grad(loss), static_argnums=(1, 2))(base.ij, tl, impl)
        assert bool(jnp.isfinite(val)), (tl is None, impl)
        assert bool(jnp.isfinite(g).all()), (tl is None, impl)
        assert float(jnp.abs(g).max()) > 0  # healthy triangle still gets gradients


def test_degenerate_silhouette_edges_finite_gradients():
    ij = _degenerate_ij()
    edgeflags = np.ones((4, 3), bool)
    base = _scene_f32(ij, 4, edgeflags=edgeflags)
    tiling = TilingConfig(16, 128, 16, 8)

    def loss(ij_j, tl, impl, win):
        img, _, _ = render_scene(dataclasses.replace(base, ij=ij_j), 1.0, tiling=tl, impl=impl,
                                 impl_interpret=(impl == "pallas"), aa_window=win)
        return jnp.sum(img**2)

    for tl, impl, win in [(None, "xla", None), (None, "xla", (48, 96)), (tiling, "xla", None), (tiling, "pallas", None)]:
        g = jax.jit(jax.grad(loss), static_argnums=(1, 2, 3))(base.ij, tl, impl, win)
        assert bool(jnp.isfinite(g).all()), (tl is None, impl, win)
