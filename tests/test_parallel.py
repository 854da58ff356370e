"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as graft


def test_graft_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 256, 3)
    assert bool(jnp.isfinite(out).all())


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual CPU devices"
    graft.dryrun_multichip(8)


def test_tile_sharded_render_matches_single_device():
    from deodr_tpu.parallel.sharding import make_device_mesh, shard_render_scene
    from deodr_tpu.ops.render import render_scene_jit

    buffers, cap = graft._flagship_scene(height=64, width=64, n_subdivision=2)
    mesh = make_device_mesh(n_views=1, n_tiles=8)
    img_sharded, zb_sharded = shard_render_scene(buffers, 1.0, mesh, aa_edge_capacity=cap)
    img_single, zb_single, _ = render_scene_jit(buffers, 1.0, aa_edge_capacity=cap)
    np.testing.assert_allclose(np.asarray(img_sharded), np.asarray(img_single), atol=1e-5)
