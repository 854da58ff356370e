"""Over-subscribed static bin capacities must fail loudly, not drop bins.

TilingConfig's documented overflow behavior is to drop the lowest-priority
entries (deodr_tpu/ops/tiled.py TilingConfig docstring) — fine for planned
capacities, silently wrong for hand-picked ones. ``render_scene(...,
check_capacity=True)`` (functionalized via checkify) and the
``render_scene_checked`` wrapper assert every capacity actually held.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deodr_tpu.ops.render import SceneBuffers, render_scene, render_scene_checked
from deodr_tpu.ops.tiled import TilingConfig


def _dense_scene(n_tri=24, h=32, w=128, seed=0):
    rng = np.random.RandomState(seed)
    ctr = rng.rand(n_tri, 1, 2) * [w * 0.25, h * 0.25] + [w * 0.4, h * 0.4]
    tri = ctr + (rng.rand(n_tri, 3, 2) - 0.5) * 18
    u = tri[:, 1] - tri[:, 0]
    v = tri[:, 2] - tri[:, 0]
    # drawn when -raw > 0 for counterclockwise scenes (ops/render.py _culling)
    flip = u[:, 0] * v[:, 1] - v[:, 0] * u[:, 1] > 0
    tri[flip] = tri[flip][:, [0, 2, 1]]
    faces = np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3)
    return SceneBuffers(
        faces=jnp.asarray(faces),
        faces_uv=jnp.asarray(faces),
        ij=jnp.asarray(tri.reshape(-1, 2)),
        depths=jnp.asarray(np.repeat(rng.rand(n_tri) + 0.5, 3)),
        uv=jnp.zeros((3 * n_tri, 2)),
        shade=jnp.zeros(3 * n_tri),
        colors=jnp.asarray(rng.rand(3 * n_tri, 3)),
        edgeflags=jnp.ones((n_tri, 3), bool),
        textured=jnp.zeros(n_tri, bool),
        shaded=jnp.ones(n_tri, bool),
        texture=None,
        background_image=None,
        background_color=jnp.asarray(rng.rand(3)),
        height=h,
        width=w,
    )


def test_oversubscribed_triangle_bins_raise():
    scene = _dense_scene()
    tiny = TilingConfig(tile_h=8, tile_w=128, triangle_capacity=2, edge_capacity=64)
    with pytest.raises(Exception, match="solid tile bin overflow"):
        render_scene_checked(scene, 0.0, tiling=tiny, impl="xla")


def test_oversubscribed_edge_bins_raise():
    scene = _dense_scene()
    tiny = TilingConfig(tile_h=8, tile_w=128, triangle_capacity=64, edge_capacity=3)
    with pytest.raises(Exception, match="edge tile bin overflow"):
        render_scene_checked(scene, 1.0, tiling=tiny, impl="xla")


def test_oversubscribed_aa_edge_compaction_raises():
    scene = _dense_scene()
    with pytest.raises(Exception, match="AA edge compaction overflow"):
        render_scene_checked(scene, 1.0, aa_edge_capacity=4)


def test_adequate_capacities_pass_and_match_unchecked():
    scene = _dense_scene()
    cfg = TilingConfig(tile_h=8, tile_w=128, triangle_capacity=32, edge_capacity=96)
    img_checked, zb, _ = render_scene_checked(scene, 1.0, tiling=cfg, impl="xla")
    img_plain, zb2, _ = render_scene(scene, 1.0, tiling=cfg, impl="xla")
    # checkify's error-state plumbing may reorder fusions; values must agree
    np.testing.assert_allclose(np.asarray(img_checked), np.asarray(img_plain), atol=1e-12)


def test_checkify_composes_under_jit():
    from jax.experimental import checkify

    scene = _dense_scene()
    tiny = TilingConfig(tile_h=8, tile_w=128, triangle_capacity=2, edge_capacity=64)

    @jax.jit
    def render(s):
        return checkify.checkify(
            lambda s: render_scene(s, 0.0, tiling=tiny, impl="xla", check_capacity=True)[0]
        )(s)

    err, _ = render(scene)
    with pytest.raises(Exception, match="solid tile bin overflow"):
        err.throw()
