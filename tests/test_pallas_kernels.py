"""Pallas kernels (interpret mode on CPU) must match the XLA tiled path:
forward images and gradients, solid and edge-overdraw passes, both AA modes.
On TPU the same kernels compile through Mosaic; these tests pin the kernel
math itself."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deodr_tpu.ops.render import render_scene
from deodr_tpu.ops.tiled import TilingConfig
from examples.triangle_soup_fitting import create_example_scene


def _f32_scene(n_tri=15, width=128, height=128, textured_ratio=0.5):
    np.random.seed(4)
    scene2d = create_example_scene(n_tri=n_tri, width=width, height=height, textured_ratio=textured_ratio)
    base = scene2d._buffers(*scene2d._diff_inputs())
    if textured_ratio == 0.0:
        base = dataclasses.replace(base, texture=None)
    return jax.tree.map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "dtype") and a.dtype == jnp.float64 else a, base
    )


@pytest.mark.parametrize(
    "sigma,tile_h",
    [(0.0, 64), (1.0, 64), (1.0, 48)],  # 48 = bench.py's production tile height
)
def test_pallas_matches_xla(sigma, tile_h):
    base = _f32_scene(textured_ratio=0.0)
    tiling = TilingConfig(tile_h, 128, 24, 48, edge_split=3)
    obs = jnp.asarray(np.random.RandomState(0).rand(128, 128, 3), jnp.float32)

    def run(impl, interp):
        return render_scene(base, sigma, tiling=tiling, impl=impl, impl_interpret=interp)

    img_x, zb_x, _ = jax.jit(lambda: run("xla", False))()
    img_p, zb_p, _ = jax.jit(lambda: run("pallas", True))()
    assert float(jnp.abs(img_x - img_p).max()) < 1e-4
    finite = jnp.isfinite(zb_x)
    assert float(jnp.where(finite, jnp.abs(zb_x - zb_p), 0).max()) < 1e-5

    def loss(ij, impl, interp):
        b = dataclasses.replace(base, ij=ij)
        img, _, _ = render_scene(b, sigma, tiling=tiling, impl=impl, impl_interpret=interp)
        return jnp.sum((img - obs) ** 2)

    g_x = jax.jit(jax.grad(lambda ij: loss(ij, "xla", False)))(base.ij)
    g_p = jax.jit(jax.grad(lambda ij: loss(ij, "pallas", True)))(base.ij)
    scale = float(jnp.abs(g_x).max())
    assert float(jnp.abs(g_x - g_p).max()) < 1e-3 * max(scale, 1.0)


def test_pallas_textured_solid_matches_xla():
    base = _f32_scene(textured_ratio=1.0)
    tiling = TilingConfig(64, 128, 24, 48)
    img_x, _, _ = jax.jit(lambda: render_scene(base, 0.0, tiling=tiling))()
    img_p, _, _ = jax.jit(lambda: render_scene(base, 0.0, tiling=tiling, impl="pallas", impl_interpret=True))()
    assert float(jnp.abs(img_x - img_p).max()) < 1e-4


def test_pallas_error_mode_matches_xla():
    base = _f32_scene(textured_ratio=0.0)
    tiling = TilingConfig(64, 128, 24, 48)
    obs = jnp.asarray(np.random.RandomState(1).rand(128, 128, 3), jnp.float32)

    def run(impl, interp):
        _, _, err = render_scene(base, 1.0, antialiase_error=True, obs=obs, tiling=tiling, impl=impl, impl_interpret=interp)
        return err

    e_x = jax.jit(lambda: run("xla", False))()
    e_p = jax.jit(lambda: run("pallas", True))()
    assert float(jnp.abs(e_x - e_p).max()) < 1e-3
