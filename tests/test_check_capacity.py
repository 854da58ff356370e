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


def _depth_fitter(h=64, w=64):
    from deodr_tpu.geometry.primitives import octahedron_mesh
    from deodr_tpu.mesh_fitter import MeshDepthFitter

    base = octahedron_mesh(n_subdivision=3)  # 512 faces -> tiled plan
    fitter = MeshDepthFitter(
        vertices=np.asarray(base.vertices),
        faces=np.asarray(base.faces),
        euler_init=np.zeros(3),
        translation_init=np.zeros(3),
    )
    rng = np.random.RandomState(0)
    fitter.set_image(0.4 + 0.1 * rng.rand(h, w), focal=120, distortion=None)
    fitter.set_max_depth(2.0)
    fitter.set_depth_scale(0.5)
    return fitter


def _poke_plan(fitter, **tiling_updates):
    """Overwrite the fitter's cached plan with a corrupted tiling (simulates
    geometry drifting past a stale plan)."""
    core = fitter.core
    key = ("last_plan",) + core._plan_ctx(fitter.camera)[4][1:]
    cap, tiling = core._jit_cache[key]
    core._jit_cache[key] = (cap, tiling._replace(**tiling_updates))
    return cap, tiling


def test_fitter_replans_on_poked_capacity_not_degraded():
    """Shrinking a plan capacity mid-fit must trigger a replan (via the
    post-hoc stats validation), producing the SAME energies as an untouched
    fit — never a silently degraded render."""
    ref = _depth_fitter()
    ref_energies = [ref.step()[0] for _ in range(4)]

    poked = _depth_fitter()
    e0 = poked.step()[0]
    e1 = poked.step()[0]
    _poke_plan(poked, triangle_capacity=2)
    e2 = poked.step()[0]
    e3 = poked.step()[0]
    np.testing.assert_allclose([e0, e1, e2, e3], ref_energies, rtol=1e-12)


def test_fitter_periodic_checkified_validation_catches_stats_blind_overflow(monkeypatch):
    """The every-N checkified step must catch an overflow the bbox-stats
    validation cannot see, warn, and replan — exercised by blinding
    plan_fits and corrupting the cached plan."""
    import warnings

    from deodr_tpu.mesh_fitter import _FitterRenderCore

    ref = _depth_fitter()
    ref_energies = [ref.step()[0] for _ in range(3)]

    poked = _depth_fitter()
    poked.core.check_every = 1
    e0 = poked.step()[0]
    e1 = poked.step()[0]
    _poke_plan(poked, triangle_capacity=2)
    monkeypatch.setattr(_FitterRenderCore, "plan_fits", lambda self, *a, **k: True)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        e2 = poked.step()[0]
    assert any("replanning" in str(w.message) for w in caught), (
        "checkified validation should have warned and replanned"
    )
    np.testing.assert_allclose([e0, e1, e2], ref_energies, rtol=1e-12)


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
