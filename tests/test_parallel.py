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


def _production_scene(h=64, w=256, n_tri=40, seed=21):
    """A textured scene big enough to exercise the tiled production path."""
    import dataclasses as _dc

    from deodr_tpu.ops.render import SceneBuffers

    rng = np.random.RandomState(seed)
    ctr = rng.rand(n_tri, 1, 2) * [w - 12, h - 12] + 6
    tri = ctr + (rng.rand(n_tri, 3, 2) - 0.5) * 18
    u = tri[:, 1] - tri[:, 0]
    v = tri[:, 2] - tri[:, 0]
    flip = u[:, 0] * v[:, 1] - v[:, 0] * u[:, 1] > 0
    tri[flip] = tri[flip][:, [0, 2, 1]]
    faces = np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3)
    return SceneBuffers(
        faces=jnp.asarray(faces),
        faces_uv=jnp.asarray(faces),
        ij=jnp.asarray(tri.reshape(-1, 2)),
        depths=jnp.asarray(np.repeat(rng.rand(n_tri) + 0.5, 3)),
        uv=jnp.asarray(rng.rand(3 * n_tri, 2) * 13 + 1),
        shade=jnp.asarray(rng.rand(3 * n_tri)),
        colors=jnp.asarray(rng.rand(3 * n_tri, 3)),
        edgeflags=jnp.ones((n_tri, 3), bool),
        textured=jnp.asarray(rng.rand(n_tri) < 0.5),
        shaded=jnp.ones(n_tri, bool),
        texture=jnp.asarray(rng.rand(16, 16, 3)),
        background_image=None,
        background_color=jnp.asarray(rng.rand(3)),
        height=h,
        width=w,
    )


def test_tile_sharded_production_paths_match_single_device():
    """The PRODUCTION tiled renderers (impl='xla' with a TilingConfig, and
    the Pallas kernels in interpret mode) must match single-device renders
    to machine epsilon when row-band-sharded over a ('tiles',) mesh —
    closing round 2's gap where only the brute-force path ever ran under a
    sharding."""
    from deodr_tpu.ops.render import render_scene
    from deodr_tpu.ops.tiled import TilingConfig
    from deodr_tpu.parallel.sharding import make_device_mesh, shard_render_scene

    buffers = _production_scene()
    tiling = TilingConfig(tile_h=8, tile_w=128, triangle_capacity=64, edge_capacity=32)
    mesh = make_device_mesh(n_views=1, n_tiles=8)
    for impl, interp in (("xla", False), ("pallas", True)):
        img_s, zb_s = shard_render_scene(
            buffers, 1.0, mesh, aa_edge_capacity=64, tiling=tiling,
            impl=impl, impl_interpret=interp,
        )
        img_1, zb_1, _ = jax.jit(
            lambda b: render_scene(
                b, 1.0, aa_edge_capacity=64, tiling=tiling, impl=impl,
                impl_interpret=interp,
            )
        )(buffers)
        # integer band translation keeps the vertex coordinates exact, but
        # per-triangle setup recombines them with different rounding: values
        # agree to machine epsilon, not bitwise
        np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_1), rtol=0, atol=1e-11)
        zs, z1 = np.asarray(zb_s), np.asarray(zb_1)
        np.testing.assert_allclose(
            np.where(np.isfinite(zs), zs, 0.0), np.where(np.isfinite(z1), z1, 0.0),
            rtol=0, atol=1e-11,
        )


def test_tile_sharded_gradients_match_and_psum_in_hlo():
    """Parameter gradients of a loss over the band-sharded tiled render must
    match single-device exactly, the lowered HLO must contain the expected
    cross-band psum (all-reduce) for them, and there must be NO
    framebuffer-sized all-gather (each band stays on its device)."""
    import dataclasses as _dc

    from jax.sharding import NamedSharding, PartitionSpec as P
    from deodr_tpu.ops.render import render_scene, render_scene_jit
    from deodr_tpu.ops.tiled import TilingConfig
    from deodr_tpu.parallel.sharding import make_device_mesh, make_tile_sharded_render

    buffers = _production_scene(seed=22)
    tiling = TilingConfig(tile_h=8, tile_w=128, triangle_capacity=64, edge_capacity=32)
    mesh = make_device_mesh(n_views=1, n_tiles=8)
    render_sharded = make_tile_sharded_render(
        buffers, 1.0, mesh, aa_edge_capacity=64, tiling=tiling, impl="xla"
    )

    def loss_sharded(ij, colors):
        img, _ = render_sharded(_dc.replace(buffers, ij=ij, colors=colors))
        return jnp.sum(img * jnp.cos(jnp.arange(img.size).reshape(img.shape)))

    def loss_single(ij, colors):
        img, _, _ = render_scene(
            _dc.replace(buffers, ij=ij, colors=colors), 1.0,
            aa_edge_capacity=64, tiling=tiling, impl="xla",
        )
        return jnp.sum(img * jnp.cos(jnp.arange(img.size).reshape(img.shape)))

    grad_sharded = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))
    g_s = grad_sharded(buffers.ij, buffers.colors)
    g_1 = jax.jit(jax.grad(loss_single, argnums=(0, 1)))(buffers.ij, buffers.colors)
    for a, b in zip(g_s, g_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-9)

    hlo = grad_sharded.lower(buffers.ij, buffers.colors).compile().as_text()
    assert "all-reduce" in hlo, "expected a psum of parameter gradients across bands"
    # no framebuffer-sized all-gather: each band's pixels stay put. Parameter
    # arrays here are tiny (< 1000 elements); the framebuffer is 64x256x3.
    import re

    for m in re.finditer(r"all-gather[^=]*= \S*?f(?:32|64)\[([0-9,]+)\]", hlo):
        dims = [int(d) for d in m.group(1).split(",")]
        n_el = 1
        for d in dims:
            n_el *= d
        assert n_el < 64 * 256, f"framebuffer-sized all-gather found: {m.group(0)}"


def test_tile_sharded_gradients_match_pallas():
    """Round-3 gap closed: parameter gradients through the PALLAS kernels
    (interpret mode) under the band-sharded shard_map must match the
    single-device pallas render's gradients at machine epsilon — the
    untested pallas-grad × sharding combination is exactly where a
    cross-shard-dependence footgun would fire."""
    import dataclasses as _dc

    from deodr_tpu.ops.render import render_scene
    from deodr_tpu.ops.tiled import TilingConfig
    from deodr_tpu.parallel.sharding import make_device_mesh, make_tile_sharded_render

    buffers = _production_scene(seed=23)
    tiling = TilingConfig(tile_h=8, tile_w=128, triangle_capacity=64, edge_capacity=32)
    mesh = make_device_mesh(n_views=1, n_tiles=8)
    render_sharded = make_tile_sharded_render(
        buffers, 1.0, mesh, aa_edge_capacity=64, tiling=tiling,
        impl="pallas", impl_interpret=True,
    )

    def loss_sharded(ij, colors):
        img, _ = render_sharded(_dc.replace(buffers, ij=ij, colors=colors))
        return jnp.sum(img * jnp.cos(jnp.arange(img.size).reshape(img.shape)))

    def loss_single(ij, colors):
        img, _, _ = render_scene(
            _dc.replace(buffers, ij=ij, colors=colors), 1.0,
            aa_edge_capacity=64, tiling=tiling, impl="pallas", impl_interpret=True,
        )
        return jnp.sum(img * jnp.cos(jnp.arange(img.size).reshape(img.shape)))

    g_s = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(buffers.ij, buffers.colors)
    g_1 = jax.jit(jax.grad(loss_single, argnums=(0, 1)))(buffers.ij, buffers.colors)
    for a, b in zip(g_s, g_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-11)


def test_check_vma_divergence_canary(monkeypatch):
    """EXPIRY CANARY for the check_vma=False workaround in
    ``_make_energy_sharded`` (see the comment there and
    tools/check_vma_repro.py): on jax 0.9, shard_map(check_vma=True)
    gradients are miscompiled when a ``jax.config.update("jax_platforms",
    ...)`` override is active — which this suite's conftest needs. This test
    FORCES the checker ON and asserts the (currently wrong) divergence; it
    is a STRICT xfail, so the jax upgrade that fixes the lowering makes it
    XPASS-fail the suite — the signal to delete the workaround and this
    canary together."""
    import pytest

    from deodr_tpu.geometry.primitives import octahedron_mesh
    from deodr_tpu.mesh_fitter import MeshRGBFitterWithPoseMultiFrame
    from jax.sharding import Mesh

    orig = jax.shard_map

    def force_checker(f, **kw):
        if "check_vma" in kw:
            kw["check_vma"] = True
        return orig(f, **kw)

    monkeypatch.setattr(jax, "shard_map", force_checker)

    n_frames, steps, h, w = 4, 2, 48, 64
    base = octahedron_mesh(n_subdivision=1)
    rng = np.random.RandomState(0)
    images = [np.clip(0.5 + 0.2 * rng.rand(h, w, 3), 0, 1) for _ in range(n_frames)]

    def make_fitter():
        f = MeshRGBFitterWithPoseMultiFrame(
            vertices=np.asarray(base.vertices),
            faces=np.asarray(base.faces),
            euler_init=np.zeros((n_frames, 3)),
            translation_init=np.zeros((n_frames, 3)),
            default_color=np.array([0.4, 0.3, 0.25]),
            default_light_directional=np.array([0.1, 0.5, 0.4]),
            default_light_ambient=0.6,
        )
        f.set_background_color(np.array([0.1, 0.2, 0.3]))
        f.set_images(images)
        return f

    seq = make_fitter()
    es = [seq.step()[0] for _ in range(steps)]
    par = make_fitter()
    par.set_device_mesh(Mesh(np.array(jax.devices()[:4]), ("views",)))
    ep = [par.step()[0] for _ in range(steps)]
    rel = max(abs(a - b) / abs(a) for a, b in zip(es, ep))
    if rel > 1e-9:
        pytest.xfail(
            f"known jax 0.9 bug: check_vma=True + jax_platforms override "
            f"miscompiles shard_map gradients (rel diff {rel:.3g}); the "
            f"check_vma=False workaround in _make_energy_sharded stays"
        )
    # reaching here means the jax bug is FIXED: fail loudly so the
    # workaround (and this canary) get removed
    raise AssertionError(
        "check_vma=True now matches sequential: the jax lowering bug is "
        "fixed — remove check_vma=False in _make_energy_sharded and delete "
        "this canary"
    )


def test_multiframe_fitter_view_sharded_matches_sequential():
    """The REAL multi-frame fitter (heavy-ball, rigid energy, per-param
    clamps) must produce the same energy trajectory and parameters when its
    per-frame energies run sharded over a ('views',) device mesh
    (shard_map + lax.map + psum) as when run sequentially.
    Parallelizes the reference's sequential multi-frame loop (reference:
    deodr/mesh_fitter.py:529-549)."""
    from jax.sharding import Mesh
    from deodr_tpu.geometry.primitives import octahedron_mesh
    from deodr_tpu.mesh_fitter import MeshRGBFitterWithPoseMultiFrame

    n_frames, steps, h, w = 4, 3, 48, 64
    base = octahedron_mesh(n_subdivision=1)
    rng = np.random.RandomState(0)
    images = [np.clip(0.5 + 0.2 * rng.rand(h, w, 3), 0, 1) for _ in range(n_frames)]

    def make_fitter():
        f = MeshRGBFitterWithPoseMultiFrame(
            vertices=np.asarray(base.vertices),
            faces=np.asarray(base.faces),
            euler_init=np.zeros((n_frames, 3)),
            translation_init=np.zeros((n_frames, 3)),
            default_color=np.array([0.4, 0.3, 0.25]),
            default_light_directional=np.array([0.1, 0.5, 0.4]),
            default_light_ambient=0.6,
        )
        f.set_background_color(np.array([0.1, 0.2, 0.3]))
        f.set_images(images)
        return f

    seq = make_fitter()
    energies_seq = [seq.step()[0] for _ in range(steps)]

    par = make_fitter()
    par.set_device_mesh(Mesh(np.array(jax.devices()[:4]), ("views",)))
    energies_par = [par.step()[0] for _ in range(steps)]

    np.testing.assert_allclose(energies_par, energies_seq, rtol=1e-9)
    np.testing.assert_allclose(par.vertices, seq.vertices, rtol=0, atol=1e-10)
    np.testing.assert_allclose(par.transform_quaternion, seq.transform_quaternion, atol=1e-12)
    np.testing.assert_allclose(par.mesh_color, seq.mesh_color, atol=1e-12)
    np.testing.assert_allclose(par.light_directional, seq.light_directional, atol=1e-12)


def test_textured_multiview_step_matches_sequential():
    """The shard_map textured-multiview step (shared texture/uv/shade
    params, view-sharded ij/obs, explicit psum of ONLY the final shared
    gradients — the SCALING_r05 payload mitigation) must match a
    sequentially-accumulated step. Parallelizes the reference's
    texture-fitting surface (renderScene_B's texture_b/uv_b/shade_b)
    across views."""
    import dataclasses as _dc

    from deodr_tpu.ops.render import render_scene
    from deodr_tpu.parallel.sharding import make_device_mesh, make_textured_multiview_step

    buffers = _production_scene()
    n_views, cap, lr = 8, 192, 1e-6
    rng = np.random.RandomState(3)
    ij0 = np.asarray(buffers.ij)
    ij_batch = jnp.asarray(ij0[None] + rng.randn(n_views, *ij0.shape) * 0.1)

    def render_one(ij):
        img, _, _ = render_scene(_dc.replace(buffers, ij=ij), 1.0, aa_edge_capacity=cap)
        return img

    obs = jax.vmap(render_one)(ij_batch) + 0.03
    params = dict(texture=buffers.texture, uv=buffers.uv, shade=buffers.shade)

    mesh = make_device_mesh(n_views=n_views, n_tiles=1)
    step = make_textured_multiview_step(buffers, 1.0, mesh, lr=lr, aa_edge_capacity=cap)
    p_sh = params
    for _ in range(2):
        p_sh, loss_sh = step(p_sh, ij_batch, obs)

    def total_loss(p):
        def one(ij, o):
            b = _dc.replace(buffers, ij=ij, texture=p["texture"], uv=p["uv"], shade=p["shade"])
            img, _, _ = render_scene(b, 1.0, aa_edge_capacity=cap)
            return jnp.sum((img - o) ** 2)

        return sum(one(ij_batch[i], obs[i]) for i in range(n_views))

    p_seq = params
    for _ in range(2):
        loss_seq, g = jax.value_and_grad(total_loss)(p_seq)
        p_seq = jax.tree.map(lambda p, gg: p - lr * gg, p_seq, g)

    np.testing.assert_allclose(float(loss_sh), float(loss_seq), rtol=1e-9)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(p_sh[k]), np.asarray(p_seq[k]), rtol=1e-9, atol=1e-12, err_msg=k
        )
