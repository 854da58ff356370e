"""Gradient coverage for two paths the other tests leave unexercised:

1. perspective-correct attribute interpolation — the reference *throws* in
   its adjoint (reference: C++/DifferentiableRenderer.h:810, surfaced at
   deodr/differentiable_renderer.py:630-637); the functional path here is
   differentiable, validated against central finite differences.
2. the textured-Gouraud solid path through the tiled/pallas pipeline —
   gradients w.r.t. uv, shade, texture and vertex positions.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from deodr_tpu.ops.render import SceneBuffers, render_scene
from deodr_tpu.ops.tiled import TilingConfig


def _textured_scene(persp: bool, height=48, width=64, dtype=jnp.float64):
    rng = np.random.RandomState(3)
    n_tri = 6
    centers = rng.rand(n_tri, 1, 2) * [width, height]
    tri = centers + (rng.rand(n_tri, 3, 2) - 0.5) * 40
    u = tri[:, 1] - tri[:, 0]
    w = tri[:, 2] - tri[:, 0]
    raw = u[:, 0] * w[:, 1] - w[:, 0] * u[:, 1]
    tri[raw > 0] = tri[raw > 0][:, [0, 2, 1]]
    ij = tri.reshape(-1, 2)
    faces = np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3)
    texture = rng.rand(8, 8, 3)
    return SceneBuffers(
        faces=jnp.asarray(faces),
        faces_uv=jnp.asarray(faces),
        ij=jnp.asarray(ij, dtype),
        depths=jnp.asarray(np.repeat(rng.rand(n_tri) + 0.5, 3), dtype),
        uv=jnp.asarray(rng.rand(3 * n_tri, 2) * 7, dtype),
        shade=jnp.asarray(rng.rand(3 * n_tri), dtype),
        colors=jnp.asarray(rng.rand(3 * n_tri, 3), dtype),
        edgeflags=jnp.zeros((n_tri, 3), bool),
        textured=jnp.ones((n_tri,), bool),
        shaded=jnp.ones((n_tri,), bool),
        texture=jnp.asarray(texture, dtype),
        background_image=None,
        background_color=jnp.asarray(np.array([0.2, 0.3, 0.4]), dtype),
        height=height,
        width=width,
        clockwise=False,
        backface_culling=True,
        strict_edge=True,
        perspective_correct=persp,
        integer_pixel_centers=True,
    )


def _fd_check(loss, x, g, eps=1e-6, tol=2e-4, n_probe=12):
    rng = np.random.RandomState(0)
    x_np = np.asarray(x, np.float64)
    flat = x_np.ravel()
    idxs = rng.choice(flat.size, size=min(n_probe, flat.size), replace=False)
    g_np = np.asarray(g).ravel()
    for i in idxs:
        xp, xm = flat.copy(), flat.copy()
        xp[i] += eps
        xm[i] -= eps
        fp = float(loss(jnp.asarray(xp.reshape(x_np.shape))))
        fm = float(loss(jnp.asarray(xm.reshape(x_np.shape))))
        fd = (fp - fm) / (2 * eps)
        assert abs(fd - g_np[i]) < tol * max(1.0, abs(fd)), (i, fd, g_np[i])


def test_perspective_correct_gradients_fd():
    base = _textured_scene(persp=True)
    obs = jnp.asarray(np.random.RandomState(1).rand(48, 64, 3))

    def loss_uv(uv):
        img, _, _ = render_scene(dataclasses.replace(base, uv=uv), 0.0)
        return jnp.sum((img - obs) ** 2)

    def loss_shade(shade):
        img, _, _ = render_scene(dataclasses.replace(base, shade=shade), 0.0)
        return jnp.sum((img - obs) ** 2)

    g_uv = jax.jit(jax.grad(loss_uv))(base.uv)
    g_sh = jax.jit(jax.grad(loss_shade))(base.shade)
    assert bool(jnp.all(jnp.isfinite(g_uv))) and float(jnp.abs(g_uv).max()) > 0
    _fd_check(jax.jit(loss_uv), base.uv, g_uv)
    _fd_check(jax.jit(loss_shade), base.shade, g_sh)


def test_textured_tiled_and_pallas_gradients():
    base = _textured_scene(persp=False, dtype=jnp.float32)
    obs = jnp.asarray(np.random.RandomState(1).rand(48, 64, 3), jnp.float32)
    tiling = TilingConfig(16, 128, 16, 8)

    def loss(tex, uv, ij, impl, interp):
        b = dataclasses.replace(base, texture=tex, uv=uv, ij=ij)
        img, _, _ = render_scene(b, 0.0, tiling=tiling, impl=impl, impl_interpret=interp)
        return jnp.sum((img - obs) ** 2)

    g_x = jax.jit(jax.grad(lambda *a: loss(*a, "xla", False), argnums=(0, 1, 2)))(
        base.texture, base.uv, base.ij
    )
    g_p = jax.jit(jax.grad(lambda *a: loss(*a, "pallas", True), argnums=(0, 1, 2)))(
        base.texture, base.uv, base.ij
    )
    for gx, gp, name in zip(g_x, g_p, ("texture", "uv", "ij")):
        assert bool(jnp.all(jnp.isfinite(gp))), name
        scale = max(float(jnp.abs(gx).max()), 1e-6)
        assert float(jnp.abs(gx - gp).max()) < 1e-3 * scale, name
    assert float(jnp.abs(g_x[0]).max()) > 0  # texture gradients flow
