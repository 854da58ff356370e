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
