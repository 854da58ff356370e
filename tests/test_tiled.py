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


def test_pair_binning_matches_dense():
    """TilingConfig.pair_ry/pair_rx (pair-expansion binning: flat-scatter
    slot lists + pair-routed table adjoints) must reproduce the dense
    binning path exactly — image, z-buffer and gradients — on both the
    Pallas(interpret) and XLA tiled paths."""
    np.random.seed(11)
    scene2d = create_example_scene(n_tri=40, width=256, height=128)
    scene2d.backface_culling = True
    base = scene2d._buffers(*scene2d._diff_inputs())
    t_plain = TilingConfig(tile_h=16, tile_w=128, triangle_capacity=32, edge_capacity=64)
    # soup triangles span up to the full 8 tile rows at th=16, 2 tile cols
    t_pair = t_plain._replace(pair_ry=8, pair_rx=2)

    for impl, interp in (("pallas", True), ("xla", False)):
        def render(ij, colors, tiling_cfg):
            b = dataclasses.replace(base, ij=ij, colors=colors)
            return render_scene(b, 0.0, tiling=tiling_cfg, impl=impl, impl_interpret=interp)

        img_p, zb_p, _ = jax.jit(lambda i, c: render(i, c, t_plain))(base.ij, base.colors)
        img_q, zb_q, _ = jax.jit(lambda i, c: render(i, c, t_pair))(base.ij, base.colors)
        np.testing.assert_array_equal(np.asarray(img_p), np.asarray(img_q), err_msg=impl)
        np.testing.assert_array_equal(np.asarray(zb_p), np.asarray(zb_q), err_msg=impl)

        def loss(params, tiling_cfg):
            img, _, _ = render(params[0], params[1], tiling_cfg)
            return jnp.sum(img**2)

        g_p = jax.grad(lambda p: loss(p, t_plain))((base.ij, base.colors))
        g_q = jax.grad(lambda p: loss(p, t_pair))((base.ij, base.colors))
        # the pair-routed adjoint sums cotangent rows in a different order
        # than the scatter-add it replaces: identical up to f64 roundoff
        for a, b in zip(g_p, g_q):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-12, err_msg=impl)


def test_pair_binning_with_drawn_compaction_and_sigma():
    """Pair binning composed with drawn compaction and the AA edge pass
    (the large-mesh production stack) matches the dense path."""
    np.random.seed(13)
    scene2d = create_example_scene(n_tri=40, width=256, height=128)
    scene2d.backface_culling = True
    base = scene2d._buffers(*scene2d._diff_inputs())
    t_plain = TilingConfig(tile_h=16, tile_w=128, triangle_capacity=32, edge_capacity=64,
                           drawn_capacity=48, edge_tile_h=8)
    t_pair = t_plain._replace(pair_ry=8, pair_rx=2)

    def render(ij, tiling_cfg):
        b = dataclasses.replace(base, ij=ij)
        return render_scene(b, 1.0, aa_edge_capacity=96, tiling=tiling_cfg,
                            impl="pallas", impl_interpret=True)

    img_p, _, _ = jax.jit(lambda i: render(i, t_plain))(base.ij)
    img_q, _, _ = jax.jit(lambda i: render(i, t_pair))(base.ij)
    np.testing.assert_array_equal(np.asarray(img_p), np.asarray(img_q))

    g_p = jax.grad(lambda i: jnp.sum(render(i, t_plain)[0] ** 2))(base.ij)
    g_q = jax.grad(lambda i: jnp.sum(render(i, t_pair)[0] ** 2))(base.ij)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_q), rtol=0, atol=1e-12)


def test_pair_binning_span_overflow_raises():
    """A bbox spanning more tiles than (pair_ry, pair_rx) must fail the
    capacity check loudly (pairs beyond the span are silently absent from
    the bins — exactly the overflow class check_capacity exists for)."""
    from deodr_tpu.ops.render import render_scene_checked

    np.random.seed(11)
    scene2d = create_example_scene(n_tri=40, width=256, height=128)
    scene2d.backface_culling = True
    base = scene2d._buffers(*scene2d._diff_inputs())
    too_small = TilingConfig(tile_h=16, tile_w=128, triangle_capacity=32, edge_capacity=64,
                             pair_ry=2, pair_rx=2)
    with pytest.raises(Exception, match="pair-binning y tile span overflow"):
        render_scene_checked(base, 0.0, tiling=too_small, impl="xla")
