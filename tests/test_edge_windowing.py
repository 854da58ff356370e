"""Windowed edge-overdraw pass equivalence.

The windowed pass (`edge_overdraw_pass_windowed`) processes each silhouette
band through a static dynamic-slice window around its bbox — and, for
textured scenes, samples/back-propagates through a static uv window of the
texture (band uv lies on the segment [uv0, uv1]). Both must reproduce the
full-frame pass exactly: forward bit-identical, gradients to fp reassociation
tolerance (the MXU soft-one-hot bilinear adjoint sums taps in a different
order than the gather form).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from deodr_tpu.ops.render import SceneBuffers, render_scene


def _scene(height=64, width=96, n_tri=12, seed=7, dtype=jnp.float64):
    rng = np.random.RandomState(seed)
    centers = rng.rand(n_tri, 1, 2) * [width, height]
    tri = centers + (rng.rand(n_tri, 3, 2) - 0.5) * 30
    u = tri[:, 1] - tri[:, 0]
    w = tri[:, 2] - tri[:, 0]
    raw = u[:, 0] * w[:, 1] - w[:, 0] * u[:, 1]
    tri[raw > 0] = tri[raw > 0][:, [0, 2, 1]]
    ij = tri.reshape(-1, 2)
    faces = np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3)
    return SceneBuffers(
        faces=jnp.asarray(faces),
        faces_uv=jnp.asarray(faces),
        ij=jnp.asarray(ij, dtype),
        depths=jnp.asarray(np.repeat(rng.rand(n_tri) + 0.5, 3), dtype),
        # per-triangle uv islands with small spans, so the (16, 32) texture
        # window in the tests is guaranteed to contain every edge's taps
        uv=jnp.asarray(
            (np.repeat(rng.rand(n_tri, 2) * 20, 3, axis=0) + rng.rand(3 * n_tri, 2) * 8), dtype
        ),
        shade=jnp.asarray(rng.rand(3 * n_tri), dtype),
        colors=jnp.asarray(rng.rand(3 * n_tri, 3), dtype),
        edgeflags=jnp.ones((n_tri, 3), bool),
        textured=jnp.asarray(rng.rand(n_tri) < 0.5),
        shaded=jnp.ones((n_tri,), bool),
        texture=jnp.asarray(rng.rand(32, 32, 3), dtype),
        background_image=None,
        background_color=jnp.asarray(np.array([0.2, 0.3, 0.4]), dtype),
        height=height,
        width=width,
    )


def _run(base, obs, err_mode, aa_window, aa_tex_window):
    def f(ij, uv, tex):
        b = dataclasses.replace(base, ij=ij, uv=uv, texture=tex)
        img, _, eb = render_scene(
            b, 1.0, antialiase_error=err_mode, obs=(obs if err_mode else None),
            aa_window=aa_window, aa_tex_window=aa_tex_window,
        )
        return eb if err_mode else img

    out = jax.jit(f)(base.ij, base.uv, base.texture)
    grads = jax.jit(jax.grad(lambda *a: jnp.sum(f(*a) ** 2), argnums=(0, 1, 2)))(
        base.ij, base.uv, base.texture
    )
    return out, grads


def test_windowed_edge_pass_matches_full():
    base = _scene()
    obs = jnp.asarray(np.random.RandomState(1).rand(64, 96, 3))
    for err_mode in (False, True):
        ref_out, ref_g = _run(base, obs, err_mode, None, None)
        for win, tex_win in [((48, 64), None), ((48, 64), (16, 32)), ((64, 96), (32, 16))]:
            out, g = _run(base, obs, err_mode, win, tex_win)
            # pixel windowing alone is bit-identical; the uv-windowed MXU
            # sampler reassociates the 4-tap sum (einsum) — a few f64 ulps
            tol = 0.0 if tex_win is None else 1e-14
            assert float(jnp.abs(out - ref_out).max()) <= tol, (err_mode, win, tex_win)
            for a, b, name in zip(ref_g, g, ("ij", "uv", "texture")):
                scale = max(float(jnp.abs(a).max()), 1e-12)
                assert float(jnp.abs(a - b).max()) < 1e-9 * scale, (err_mode, win, tex_win, name)


def test_windowed_edge_pass_frame_borders():
    # bands straddling the frame borders: window origins clamp in-frame
    base = _scene(seed=3)
    ij = np.array(base.ij)
    ij[:6] = ij[:6] * 0.2 - 4.0  # push a couple of triangles past the top-left corner
    ij[6:12] = ij[6:12] * 0.2 + [92, 60]  # and past the bottom-right
    base = dataclasses.replace(base, ij=jnp.asarray(ij))
    obs = jnp.asarray(np.random.RandomState(1).rand(64, 96, 3))
    ref_out, ref_g = _run(base, obs, False, None, None)
    out, g = _run(base, obs, False, (32, 64), (16, 32))
    assert float(jnp.abs(out - ref_out).max()) <= 1e-14
    for a, b, name in zip(ref_g, g, ("ij", "uv", "texture")):
        scale = max(float(jnp.abs(a).max()), 1e-12)
        assert float(jnp.abs(a - b).max()) < 1e-9 * scale, name
