"""Tile-compacted texture sampling must match the full-frame fetch exactly.

``TilingConfig.tex_tile_capacity`` routes the solid pass's bilinear texture
fetch (the most expensive per-row op of a textured frame) through only the
tiles with non-empty triangle bins. Values must be identical to the
full-frame path — covered pixels always live in occupied tiles.
Also covers the matmul-transpose footprint table (common._footprint_table):
texture gradients must be unchanged.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from deodr_tpu.ops.render import render_scene
from deodr_tpu.ops.tiled import TilingConfig


def _textured_scene(h=40, w=130, n_tri=12, seed=5):
    from deodr_tpu.ops.render import SceneBuffers

    rng = np.random.RandomState(seed)
    ctr = rng.rand(n_tri, 1, 2) * [w - 12, h - 12] + 6
    tri = ctr + (rng.rand(n_tri, 3, 2) - 0.5) * 16
    u = tri[:, 1] - tri[:, 0]
    v = tri[:, 2] - tri[:, 0]
    flip = u[:, 0] * v[:, 1] - v[:, 0] * u[:, 1] > 0
    tri[flip] = tri[flip][:, [0, 2, 1]]
    faces = np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3)
    tex = rng.rand(24, 28, 3)
    return SceneBuffers(
        faces=jnp.asarray(faces),
        faces_uv=jnp.asarray(faces),
        ij=jnp.asarray(tri.reshape(-1, 2)),
        depths=jnp.asarray(np.repeat(rng.rand(n_tri) + 0.5, 3)),
        uv=jnp.asarray(rng.rand(3 * n_tri, 2) * [26, 22] + 1),
        shade=jnp.asarray(rng.rand(3 * n_tri)),
        colors=jnp.asarray(rng.rand(3 * n_tri, 3)),
        edgeflags=jnp.ones((n_tri, 3), bool),
        textured=jnp.asarray(rng.rand(n_tri) < 0.7),
        shaded=jnp.ones(n_tri, bool),
        texture=jnp.asarray(tex),
        background_image=None,
        background_color=jnp.asarray(rng.rand(3)),
        height=h,
        width=w,
    )


def _grads(scene, tiling, impl):
    def loss(ij, uv, shade, texture):
        buf = dataclasses.replace(scene, ij=ij, uv=uv, shade=shade, texture=texture)
        img, _, _ = render_scene(buf, 0.0, tiling=tiling, impl=impl, impl_interpret=(impl == "pallas"))
        return jnp.sum(img * jnp.cos(jnp.arange(img.size).reshape(img.shape)))

    val, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
        scene.ij, scene.uv, scene.shade, scene.texture
    )
    return val, g


def test_tile_tex_compaction_matches_full_frame():
    scene = _textured_scene()
    base = TilingConfig(tile_h=8, tile_w=128, triangle_capacity=32, edge_capacity=32)
    compact = base._replace(tex_tile_capacity=8)
    v0, g0 = _grads(scene, base, "pallas")
    v1, g1 = _grads(scene, compact, "pallas")
    assert np.allclose(float(v0), float(v1), rtol=0, atol=1e-12)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_tile_tex_compaction_matches_xla_reference():
    scene = _textured_scene(seed=9)
    base = TilingConfig(tile_h=8, tile_w=128, triangle_capacity=32, edge_capacity=32)
    compact = base._replace(tex_tile_capacity=8)
    img_ref, zb_ref, _ = render_scene(scene, 0.0, tiling=base, impl="xla")
    img_c, zb_c, _ = render_scene(scene, 0.0, tiling=compact, impl="pallas", impl_interpret=True)
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img_ref), atol=1e-9)


def test_tile_tex_capacity_overflow_raises():
    from deodr_tpu.ops.render import render_scene_checked
    import pytest

    scene = _textured_scene()
    tiny = TilingConfig(
        tile_h=8, tile_w=128, triangle_capacity=32, edge_capacity=32, tex_tile_capacity=1
    )
    with pytest.raises(Exception, match="texture tile compaction overflow"):
        render_scene_checked(scene, 0.0, tiling=tiny, impl="pallas", impl_interpret=True)


def test_quad_fetch_matches_per_pixel_fetch():
    """quad_fallback_capacity routes the compacted solid pass's texture
    fetch through one 8×8 window row per 2×2 screen quad; values and all
    gradients must be bit-identical to the per-pixel footprint fetch when
    the fallback capacity holds (random per-corner uv makes most quads
    straddle 'seams', so this exercises the fallback hard)."""
    scene = _textured_scene(seed=7)
    base = TilingConfig(
        tile_h=8, tile_w=128, triangle_capacity=32, edge_capacity=32, tex_tile_capacity=8
    )
    quad = base._replace(quad_fallback_capacity=2048)  # ≥ n_quads: no overflow
    v0, g0 = _grads(scene, base, "pallas")
    v1, g1 = _grads(scene, quad, "pallas")
    assert np.allclose(float(v0), float(v1), rtol=0, atol=1e-12)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_quad_fallback_overflow_is_loud():
    from deodr_tpu.ops.render import render_scene_checked
    import pytest

    scene = _textured_scene(seed=7)
    tiny = TilingConfig(
        tile_h=8, tile_w=128, triangle_capacity=32, edge_capacity=32,
        tex_tile_capacity=8, quad_fallback_capacity=1,
    )
    with pytest.raises(Exception, match="quad-fetch fallback compaction overflow"):
        render_scene_checked(scene, 0.0, tiling=tiny, impl="pallas", impl_interpret=True)


def test_footprint_table_gradients_match_reference_rolls():
    """The hand-written conv transpose of the footprint table must equal
    the autodiff transpose of the roll-based build for every cotangent
    that can actually arise: bilinear taps clamp to iu ≤ tw−2 / iv ≤ th−2,
    so table rows at the last texel row/column carry zero cotangent (where
    the roll formulation's wraps and the conv's zero padding differ, both
    see only zeros)."""
    rng = np.random.RandomState(3)
    th, tw, c = 9, 7, 2
    tex = jnp.asarray(rng.rand(th, tw, c))

    def build_rolls(tf):
        return jnp.concatenate(
            [tf, jnp.roll(tf, -1, 0), jnp.roll(tf, -tw, 0), jnp.roll(tf, -tw - 1, 0)], axis=1
        )

    from deodr_tpu.ops.common import _footprint_table

    tf = tex.reshape(-1, c)
    ct = rng.rand(th, tw, 4 * c)
    ct[th - 1, :, :] = 0.0  # structurally-zero rows (never gathered)
    ct[:, tw - 1, :] = 0.0
    ct = jnp.asarray(ct.reshape(th * tw, 4 * c))
    out_ref, vjp_ref = jax.vjp(build_rolls, tf)
    out_new, vjp_new = jax.vjp(lambda t: _footprint_table(t, tw), tf)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_new))
    np.testing.assert_allclose(
        np.asarray(vjp_ref(ct)[0]), np.asarray(vjp_new(ct)[0]), atol=1e-14
    )
