"""The native C++ rasterizer must agree with the JAX renderer — a
cross-language differential test of the full forward semantics (solid +
edge-overdraw + textures)."""

import numpy as np
import jax

from deodr_tpu.native import render_scene_native
from deodr_tpu.ops.render import render_scene_jit
from examples.triangle_soup_fitting import create_example_scene


def test_native_matches_jax_soup():
    np.random.seed(2)
    scene2d = create_example_scene(clockwise=True)
    base = scene2d._buffers(*scene2d._diff_inputs())
    img_jax, zb_jax, _ = render_scene_jit(base, 1.0)
    img_nat, zb_nat = render_scene_native(base, 1.0)
    np.testing.assert_allclose(np.asarray(img_jax), img_nat, atol=1e-9)
    finite = np.isfinite(np.asarray(zb_jax))
    np.testing.assert_allclose(np.asarray(zb_jax)[finite], zb_nat[finite], atol=1e-12)


def test_native_matches_jax_untextured_ccw():
    np.random.seed(9)
    scene2d = create_example_scene(n_tri=15, width=150, height=110, clockwise=False, textured_ratio=0.0)
    base = scene2d._buffers(*scene2d._diff_inputs())
    img_jax, _, _ = render_scene_jit(base, 1.5)
    img_nat, _ = render_scene_native(base, 1.5)
    np.testing.assert_allclose(np.asarray(img_jax), img_nat, atol=1e-9)


def test_native_fuzz_flag_sweep():
    """Randomized differential sweep: every combination of winding,
    strict-edge, pixel-center convention, backface culling, antialiasing
    width, background kind and textured mix must agree with the native
    oracle to f64 roundoff."""
    import itertools

    import jax.numpy as jnp
    from deodr_tpu.ops.render import SceneBuffers, render_scene_jit

    rng = np.random.RandomState(123)
    case = 0
    for clockwise, strict_edge, int_centers, cull, sigma in itertools.product(
        (False, True), (False, True), (False, True), (True, False), (0.0, 1.3)
    ):
        if not cull and sigma > 0:
            continue  # AA edge pass requires backface culling (as reference)
        case += 1
        n_tri, h, w = 14, 72, 96
        centers = rng.rand(n_tri, 1, 2) * [w, h]
        tri = centers + (rng.rand(n_tri, 3, 2) - 0.5) * 46
        u = tri[:, 1] - tri[:, 0]
        v = tri[:, 2] - tri[:, 0]
        raw = u[:, 0] * v[:, 1] - v[:, 0] * u[:, 1]
        want = raw < 0 if clockwise else raw > 0
        tri[want] = tri[want][:, [0, 2, 1]]  # half the winding flipped
        faces = np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3)
        tex = rng.rand(20, 24, 3)
        use_bg_image = case % 2 == 0
        scene = SceneBuffers(
            faces=jnp.asarray(faces),
            faces_uv=jnp.asarray(faces),
            ij=jnp.asarray(tri.reshape(-1, 2)),
            depths=jnp.asarray(np.repeat(rng.rand(n_tri), 3) + 0.4),
            uv=jnp.asarray(rng.rand(3 * n_tri, 2) * [22, 18] + 1),
            shade=jnp.asarray(rng.rand(3 * n_tri)),
            colors=jnp.asarray(rng.rand(3 * n_tri, 3)),
            edgeflags=jnp.asarray(rng.rand(n_tri, 3) < 0.8),
            textured=jnp.asarray(rng.rand(n_tri) < 0.5),
            shaded=jnp.ones((n_tri,), bool),
            texture=jnp.asarray(tex),
            background_image=jnp.asarray(rng.rand(h, w, 3)) if use_bg_image else None,
            background_color=None if use_bg_image else jnp.asarray(rng.rand(3)),
            height=h,
            width=w,
            clockwise=clockwise,
            backface_culling=cull,
            strict_edge=strict_edge,
            perspective_correct=False,
            integer_pixel_centers=int_centers,
        )
        img_jax, zb_jax, _ = render_scene_jit(scene, sigma)
        img_nat, zb_nat = render_scene_native(scene, sigma)
        tag = f"cw={clockwise} strict={strict_edge} int={int_centers} cull={cull} sigma={sigma}"
        diff = np.abs(np.asarray(img_jax) - img_nat).max(axis=-1)
        if sigma == 0.0:
            assert diff.max() <= 1e-9, tag
        else:
            # a band pixel whose affine depth equals the z-buffer to within
            # ULPs can flip the strict < z-test between implementations that
            # order the same fp ops differently (the reference itself keeps
            # per-platform goldens for this reason) — allow a few such
            # pixels, require exactness everywhere else
            bad = diff > 1e-9
            assert int(bad.sum()) <= 3, f"{tag}: {int(bad.sum())} differing pixels"
        finite = np.isfinite(np.asarray(zb_jax))
        np.testing.assert_allclose(np.asarray(zb_jax)[finite], zb_nat[finite], atol=1e-12)
    assert case >= 20
