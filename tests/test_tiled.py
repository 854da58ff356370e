"""Tiled rasterization must agree exactly with the brute-force path."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deodr_tpu.ops.render import render_scene
from deodr_tpu.ops.tiled import TilingConfig
from examples.triangle_soup_fitting import create_example_scene


@pytest.mark.parametrize("antialiase_error", [False, True])
def test_tiled_matches_brute_force(antialiase_error):
    np.random.seed(4)
    scene2d = create_example_scene(n_tri=25, width=200, height=200)
    base = scene2d._buffers(*scene2d._diff_inputs())
    obs = jnp.asarray(np.random.RandomState(0).rand(200, 200, 3))
    tiling = TilingConfig(tile_h=64, tile_w=64, triangle_capacity=32, edge_capacity=80)

    f_brute = jax.jit(lambda b: render_scene(b, 1.0, antialiase_error=antialiase_error, obs=obs))
    f_tiled = jax.jit(
        lambda b: render_scene(b, 1.0, antialiase_error=antialiase_error, obs=obs, tiling=tiling)
    )
    img_b, zb_b, err_b = f_brute(base)
    img_t, zb_t, err_t = f_tiled(base)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_t), rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(zb_b), np.asarray(zb_t), rtol=0, atol=1e-12)
    if antialiase_error:
        np.testing.assert_allclose(np.asarray(err_b), np.asarray(err_t), rtol=0, atol=1e-9)


def test_tiled_gradients_match_brute_force():
    np.random.seed(4)
    scene2d = create_example_scene(n_tri=25, width=200, height=200)
    base = scene2d._buffers(*scene2d._diff_inputs())
    obs = jnp.asarray(np.random.RandomState(0).rand(200, 200, 3))
    tiling = TilingConfig(tile_h=64, tile_w=64, triangle_capacity=32, edge_capacity=80)

    def loss(ij, tiling_cfg):
        b = dataclasses.replace(base, ij=ij)
        img, _, _ = render_scene(b, 1.0, tiling=tiling_cfg)
        return jnp.sum((img - obs) ** 2)

    g_brute = jax.jit(jax.grad(lambda ij: loss(ij, None)))(base.ij)
    g_tiled = jax.jit(jax.grad(lambda ij: loss(ij, tiling)))(base.ij)
    np.testing.assert_allclose(np.asarray(g_brute), np.asarray(g_tiled), rtol=1e-9, atol=1e-9)


def test_drawn_compaction_matches_uncompacted():
    """rasterize_tiled_pallas with TilingConfig.drawn_capacity (index-level
    compaction of non-culled triangles before binning) must reproduce the
    uncompacted path exactly — forward image, z-buffer and gradients."""
    np.random.seed(7)
    scene2d = create_example_scene(n_tri=30, width=160, height=128)
    scene2d.backface_culling = True
    base = scene2d._buffers(*scene2d._diff_inputs())
    t_plain = TilingConfig(tile_h=32, tile_w=128, triangle_capacity=32, edge_capacity=64)
    t_comp = t_plain._replace(drawn_capacity=48)

    def render(ij, tiling_cfg):
        b = dataclasses.replace(base, ij=ij)
        return render_scene(b, 0.0, tiling=tiling_cfg, impl="pallas", impl_interpret=True)

    img_p, zb_p, _ = jax.jit(lambda ij: render(ij, t_plain))(base.ij)
    img_c, zb_c, _ = jax.jit(lambda ij: render(ij, t_comp))(base.ij)
    np.testing.assert_array_equal(np.asarray(img_p), np.asarray(img_c))
    np.testing.assert_array_equal(np.asarray(zb_p), np.asarray(zb_c))

    def loss(ij, tiling_cfg):
        img, _, _ = render(ij, tiling_cfg)
        return jnp.sum(img**2)

    g_p = jax.grad(lambda ij: loss(ij, t_plain))(base.ij)
    g_c = jax.grad(lambda ij: loss(ij, t_comp))(base.ij)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_c), rtol=0, atol=1e-12)
