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


def _textured_scene(n_tri=24, h=32, w=128, seed=0):
    rng = np.random.RandomState(seed)
    scene = _dense_scene(n_tri, h, w, seed)
    import dataclasses

    return dataclasses.replace(
        scene,
        textured=jnp.ones(n_tri, bool),
        uv=jnp.asarray(rng.rand(3 * n_tri, 2) * [30.0, 14.0]),
        shade=jnp.ones(3 * n_tri),
        texture=jnp.asarray(rng.rand(16, 32, 3)),
    )


def test_validator_texture_tile_class_fires_and_holds():
    """The ~ms binning-only validator must cover the texture-path classes:
    a tight tex-tile capacity fires, the planner-style bound holds."""
    from jax.experimental import checkify

    from deodr_tpu.ops.render import validate_capacities

    scene = _textured_scene()
    big = 1 << 30

    def run(caps):
        return checkify.checkify(
            lambda s: validate_capacities(
                s, 0.0, jnp.asarray(caps, jnp.int32), 8, 128, tex_block_w=32
            )
        )(scene)

    # blocks grid is (32/8) x (128/32) = 16 blocks; triangles sit mid-frame
    err, _ = run([big, big, big, big, big, 1, big])
    with pytest.raises(Exception, match="texture tile compaction overflow"):
        err.throw()
    err, _ = run([big, big, big, big, big, 16, big])
    err.throw()  # full grid always suffices


def test_validator_uv_segment_class_matches_renderer_count():
    """The uv-segment count must equal the renderer's own segment-compaction
    count (sum over active silhouette edges of split_edges' n_seg)."""
    import dataclasses

    from jax.experimental import checkify

    from deodr_tpu.ops.render import _build_edge_data, _culling, validate_capacities
    from deodr_tpu.ops.tiled import split_edges

    scene = _textured_scene()
    seg_len, n_split = 4.0, 8
    # renderer-side count: build edge data, split, count active segments
    area = _culling(scene)
    edges = _build_edge_data(scene, scene.ij, area, None)
    segs = split_edges(edges, n_split, None, uv_segment_length=seg_len)
    n_ren = int(jnp.sum(segs.active))
    assert n_ren > int(jnp.sum(edges.active))  # splitting actually happened

    big = 1 << 30

    def run(cap_seg):
        caps = [big, big, big, big, big, big, cap_seg]
        return checkify.checkify(
            lambda s: validate_capacities(
                s, 1.0, jnp.asarray(caps, jnp.int32), 8, 128,
                tex_block_w=32, uv_segment_length=seg_len, uv_n_split=n_split,
            )
        )(scene)

    err, _ = run(n_ren)
    err.throw()  # exact count passes
    err, _ = run(n_ren - 1)
    with pytest.raises(Exception, match="texture-window segment compaction overflow"):
        err.throw()


def _multiframe_fitter(n_frames=2, h=64, w=64):
    from deodr_tpu.geometry.primitives import octahedron_mesh
    from deodr_tpu.mesh_fitter import MeshRGBFitterWithPoseMultiFrame

    base = octahedron_mesh(n_subdivision=3)  # 512 faces -> tiled plan
    fitter = MeshRGBFitterWithPoseMultiFrame(
        vertices=np.asarray(base.vertices),
        faces=np.asarray(base.faces),
        euler_init=np.zeros((n_frames, 3)),
        translation_init=np.zeros((n_frames, 3)),
        default_color=np.array([0.4, 0.3, 0.25]),
        default_light_directional=np.array([0.1, 0.5, 0.4]),
        default_light_ambient=0.6,
    )
    fitter.set_background_color(np.array([0.1, 0.2, 0.3]))
    rng = np.random.RandomState(0)
    fitter.set_images([np.clip(0.5 + 0.2 * rng.rand(h, w, 3), 0, 1) for _ in range(n_frames)])
    return fitter


def test_multiframe_fitter_periodic_checkified_validation(monkeypatch):
    """The multiframe fitter's every-N checkified validation must catch an
    overflow the bbox-stats validation cannot see, warn, and replan —
    producing the SAME energies as an untouched fit."""
    import warnings

    from deodr_tpu.mesh_fitter import _FitterRenderCore

    ref = _multiframe_fitter()
    ref_energies = [ref.step()[0] for _ in range(3)]

    poked = _multiframe_fitter()
    poked.core.check_every = 1
    e0 = poked.step()[0]
    e1 = poked.step()[0]
    _poke_plan_multi(poked, triangle_capacity=2)
    monkeypatch.setattr(_FitterRenderCore, "plan_fits", lambda self, *a, **k: True)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        e2 = poked.step()[0]
    assert any("replanning" in str(w.message) for w in caught), (
        "multiframe checkified validation should have warned and replanned"
    )
    np.testing.assert_allclose([e0, e1, e2], ref_energies, rtol=1e-12)


def _poke_plan_multi(fitter, **tiling_updates):
    core = fitter.core
    key = ("last_plan",) + core._plan_ctx(fitter.camera)[4][1:]
    cap, tiling = core._jit_cache[key]
    core._jit_cache[key] = (cap, tiling._replace(**tiling_updates))
    return cap, tiling


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
