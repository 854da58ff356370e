"""Two-level (supertile → tile) binning must reproduce the dense binner
exactly — same winners, same images, same gradients — whenever the
supertile capacity holds, for both the XLA-tiled and Pallas paths."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from deodr_tpu.ops.render import render_scene
from deodr_tpu.ops.tiled import TilingConfig, _bin_boxes, _bin_to_tiles


def _scene(h=96, w=260, n_tri=80, seed=11, textured=False):
    from deodr_tpu.ops.render import SceneBuffers

    rng = np.random.RandomState(seed)
    ctr = rng.rand(n_tri, 1, 2) * [w - 10, h - 10] + 5
    tri = ctr + (rng.rand(n_tri, 3, 2) - 0.5) * 22
    u = tri[:, 1] - tri[:, 0]
    v = tri[:, 2] - tri[:, 0]
    flip = u[:, 0] * v[:, 1] - v[:, 0] * u[:, 1] > 0
    tri[flip] = tri[flip][:, [0, 2, 1]]
    faces = np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3)
    tex = rng.rand(16, 16, 3) if textured else None
    return SceneBuffers(
        faces=jnp.asarray(faces),
        faces_uv=jnp.asarray(faces),
        ij=jnp.asarray(tri.reshape(-1, 2)),
        depths=jnp.asarray(np.repeat(rng.rand(n_tri) + 0.5, 3)),
        uv=jnp.asarray(rng.rand(3 * n_tri, 2) * 13 + 1),
        shade=jnp.asarray(rng.rand(3 * n_tri)),
        colors=jnp.asarray(rng.rand(3 * n_tri, 3)),
        edgeflags=jnp.ones((n_tri, 3), bool),
        textured=jnp.asarray(rng.rand(n_tri) < (0.6 if textured else 0.0)),
        shaded=jnp.ones(n_tri, bool),
        texture=None if tex is None else jnp.asarray(tex),
        background_image=None,
        background_color=jnp.asarray(rng.rand(3)),
        height=h,
        width=w,
    )


BASE = TilingConfig(tile_h=8, tile_w=128, triangle_capacity=64, edge_capacity=32)
HIER = BASE._replace(super_ty=4, super_tx=1, super_capacity=80)  # ≥ n_tri: exact


def test_bin_boxes_matches_dense():
    rng = np.random.RandomState(3)
    n = 200
    x_lo = jnp.asarray(np.floor(rng.rand(n) * 250))
    x_hi = x_lo + jnp.asarray(np.floor(rng.rand(n) * 40))
    y_lo = jnp.asarray(np.floor(rng.rand(n) * 90))
    y_hi = y_lo + jnp.asarray(np.floor(rng.rand(n) * 30))
    valid = jnp.asarray(rng.rand(n) > 0.1)
    n_ty, n_tx = 12, 2
    s0, v0, c0 = _bin_to_tiles(x_lo, x_hi, y_lo, y_hi, valid, n_ty, n_tx, 8, 128, 64)
    s1, v1, c1 = _bin_boxes(
        HIER._replace(super_capacity=n), x_lo, x_hi, y_lo, y_hi, valid, n_ty, n_tx, 64
    )[:3]
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    # compare only valid slots (invalid slots hold arbitrary indices)
    np.testing.assert_array_equal(
        np.asarray(s0)[np.asarray(v0)], np.asarray(s1)[np.asarray(v1)]
    )


def _render_and_grads(scene, tiling, impl, sigma):
    def loss(ij, colors):
        buf = dataclasses.replace(scene, ij=ij, colors=colors)
        img, _, _ = render_scene(
            buf, sigma, aa_edge_capacity=64, tiling=tiling, impl=impl,
            impl_interpret=(impl == "pallas"),
        )
        return jnp.sum(img * jnp.sin(jnp.arange(img.size).reshape(img.shape))), img

    (val, img), g = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        scene.ij, scene.colors
    )
    return val, img, g


def test_hier_render_matches_dense_xla():
    scene = _scene()
    for sigma in (0.0, 1.0):
        v0, img0, g0 = _render_and_grads(scene, BASE, "xla", sigma)
        v1, img1, g1 = _render_and_grads(scene, HIER, "xla", sigma)
        np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
        for a, b in zip(g0, g1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hier_render_matches_dense_pallas():
    scene = _scene(seed=12, textured=True)
    v0, img0, g0 = _render_and_grads(scene, BASE, "pallas", 1.0)
    v1, img1, g1 = _render_and_grads(scene, HIER, "pallas", 1.0)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_planner_auto_supertiles_match_dense():
    """At a scale where the production PLANNER auto-enables two-level
    binning (n_tiles × faces > 2^22 — deodr_tpu/scene.py), the supertile
    render must equal the identical plan with supertiles disabled. The
    small-scale tests above hand-pick supertile configs; this one goes
    through Scene3D's own plan at a forced-supertile scale."""
    from deodr_tpu import default_camera
    from deodr_tpu.geometry.primitives import octahedron_mesh
    from deodr_tpu.ops.render import render_scene
    from deodr_tpu.scene import Scene3D

    mesh = octahedron_mesh(5)  # 8192 faces
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    camera = default_camera(640, 512, 60, np.asarray(mesh.vertices), rot)
    scene = Scene3D(sigma=0.0)
    scene.set_mesh(mesh)
    scene.set_light(np.array([-0.4, -0.4, -0.8]), 0.4)
    scene.set_background_color(np.array([0.2, 0.3, 0.5]))
    cap, tiling, aa_window, aa_tex_window, aa_tex_plan = scene._eager_plan(camera)
    assert tiling is not None and tiling.super_capacity > 0, (
        f"planner should have auto-enabled supertiles at this scale: {tiling}"
    )
    buffers, _ = scene._build_buffers(camera, *scene._diff_inputs(False), True, None)
    img_hier, _, _ = jax.jit(
        lambda b: render_scene(b, 0.0, tiling=tiling, impl="xla")
    )(buffers)
    dense = tiling._replace(super_ty=0, super_tx=0, super_capacity=0)
    img_dense, _, _ = jax.jit(
        lambda b: render_scene(b, 0.0, tiling=dense, impl="xla")
    )(buffers)
    np.testing.assert_array_equal(np.asarray(img_hier), np.asarray(img_dense))


def test_supertile_overflow_is_loud():
    import pytest
    from deodr_tpu.ops.render import render_scene_checked

    scene = _scene(seed=13)
    tiny = HIER._replace(super_capacity=4)
    with pytest.raises(Exception, match="supertile bin overflow"):
        render_scene_checked(
            scene, 0.0, tiling=tiny, impl="pallas", impl_interpret=True
        )


def test_supertile_overflow_is_loud_xla():
    # the XLA tiled path bins through _winner_slots_tiled, a different call
    # chain than the Pallas path — an overflowing supertile bin must be just
    # as loud there (it used to drop triangles silently)
    import pytest
    from deodr_tpu.ops.render import render_scene_checked

    scene = _scene(seed=13)
    tiny = HIER._replace(super_capacity=4)
    with pytest.raises(Exception, match="supertile bin overflow"):
        render_scene_checked(scene, 0.0, tiling=tiny, impl="xla")
