"""Multi-device scale-out via jax.sharding.

The reference is strictly single-threaded CPU (reference: readme.md:35-39 —
"SIMD / multithreading / GPU acceleration" unsupported); its only
multi-device-shaped structure is the sequential multi-view loop
(reference: deodr/mesh_fitter.py:536-546). Here scale-out is first-class:

* **view parallelism** — a batch of cameras/observations is sharded across
  the ``views`` mesh axis; each device renders and differentiates its own
  views; XLA inserts the ``psum`` over shared-parameter gradients
  (vertices / color / lights) required by the replicated output sharding.
* **tile parallelism** — the framebuffer's row axis is sharded across the
  ``tiles`` mesh axis. Every per-pixel computation in the renderer (winner
  scan, shading, the per-edge AA blends) is row-local, so the forward and
  backward passes partition without any halo exchange; only scene-parameter
  gradients and the scalar loss reduce across devices (over ICI).

Both axes compose in a single 2D mesh ("views", "tiles").
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deodr_tpu.camera import project_points_arrays
from deodr_tpu.geometry.transforms import normalize, qrot
from deodr_tpu.ops.render import SceneBuffers, render_scene


def make_device_mesh(n_views: int = 1, n_tiles: Optional[int] = None, devices=None) -> Mesh:
    """Create a ("views", "tiles") device mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_tiles is None:
        n_tiles = n // n_views
    assert n_views * n_tiles == n, f"{n_views}x{n_tiles} != {n} devices"
    dev_array = np.asarray(devices).reshape(n_views, n_tiles)
    return Mesh(dev_array, ("views", "tiles"))


def make_tile_sharded_render(
    scene_shape: SceneBuffers,
    sigma: float,
    mesh: Mesh,
    aa_edge_capacity=None,
    tiling=None,
    impl=None,
    impl_interpret: bool = False,
):
    """Build a render function with the framebuffer ROW-BAND sharded over the
    ``tiles`` mesh axis, running the PRODUCTION render path (brute, XLA-tiled
    or Pallas, per ``impl``/``tiling``) independently on each device.

    Each device renders its horizontal band in band-local coordinates by
    translating the projected vertices down by its band offset — an integer
    translation, which is EXACT in floating point (both operands are
    multiples of the result's ulp). Per-triangle setup then recombines the
    translated coordinates with different rounding, so band renders match
    the corresponding rows of a single-device render to machine epsilon
    (knife-edge coverage ties could in principle flip — the same
    platform-sensitivity class the reference's own goldens exhibit), not
    bitwise. Everything per-pixel in
    the renderer (binning, winner scan, shading, edge-AA blends) is
    row-local, so no halo exchange is needed; scene-parameter gradients are
    psum'd across bands by the shard_map transpose. This is the sharded
    generalization of the reference's per-pixel H×W loops (reference:
    C++/DifferentiableRenderer.h:925-970).

    Returns ``f(scene) -> (image, z_buffer)`` (jitted; image rows stitched
    from the per-device bands). The per-tile capacities in ``tiling`` apply
    per band (a band's occupancies are bounded by the full frame's, so a
    single-device plan stays valid).
    """
    from deodr_tpu.ops.render import default_impl

    if impl is None:
        impl = default_impl()
    n_bands = mesh.shape["tiles"]
    height, width = scene_shape.height, scene_shape.width
    band_h = -(-height // n_bands)
    pad_h = n_bands * band_h - height

    def band_fn(scene):
        d = jax.lax.axis_index("tiles")
        dtype = scene.ij.dtype
        off = (d * band_h).astype(dtype)
        shift = jnp.stack([jnp.zeros((), dtype), off])
        bg_img = scene.background_image
        if bg_img is not None:
            bg_img = jax.lax.dynamic_slice_in_dim(
                jnp.pad(bg_img, [(0, pad_h), (0, 0), (0, 0)], mode="edge"),
                d * band_h, band_h, axis=0,
            )
        band_scene = dataclasses.replace(
            scene, ij=scene.ij - shift[None, :], height=band_h, background_image=bg_img
        )
        image, z_buffer, _ = render_scene(
            band_scene, sigma, aa_edge_capacity=aa_edge_capacity, tiling=tiling,
            impl=impl, impl_interpret=impl_interpret,
        )
        return image, z_buffer

    sharded_render = jax.shard_map(
        band_fn,
        mesh=mesh,
        in_specs=(P(),),
        out_specs=(P("tiles", None, None), P("tiles", None)),
        # varying-manual-axes checker: ON for the XLA paths (it would catch
        # any accidental cross-band dependence introduced by future edits to
        # band_fn or the tiled renderer). The Pallas kernels declare their
        # out_shape vma via ops.pallas.pallas_call_vma, but jax 0.9 still
        # drops vma on primitive OUTPUTS inside pallas kernel traces
        # (minimal repro: a fori_loop whose body adds two {V:tiles} values
        # yields an unvarying carry and the scan typecheck fails), so the
        # checker must stay off for impl="pallas" until that propagation is
        # fixed upstream. Safety net there: the pallas sharded-vs-single
        # equivalence tests (forward AND gradients) in tests/test_parallel.py.
        check_vma=(impl != "pallas"),
    )

    @jax.jit
    def f(scene):
        image, z_buffer = sharded_render(scene)
        return image[:height], z_buffer[:height]

    return f


def shard_render_scene(
    scene: SceneBuffers,
    sigma: float,
    mesh: Mesh,
    aa_edge_capacity=None,
    tiling=None,
    impl=None,
    impl_interpret: bool = False,
):
    """Render one scene with the framebuffer row-band-sharded over the
    ``tiles`` axis (see :func:`make_tile_sharded_render`; build that once
    for loops — this convenience wrapper re-jits per call)."""
    replicated = NamedSharding(mesh, P())
    f = make_tile_sharded_render(
        scene, sigma, mesh, aa_edge_capacity=aa_edge_capacity, tiling=tiling,
        impl=impl, impl_interpret=impl_interpret,
    )
    return f(jax.device_put(scene, replicated))


def _render_view(vertices, quaternion, translation, mesh_color, light_directional, light_ambient,
                 extrinsic, intrinsic, obs, static):
    """Pure single-view render + SSD data energy (vmapped over views)."""
    (faces_j, edges_j, edge_faces_j, faces_edges_j, degree_j, height, width, sigma, cap,
     background_color) = static
    q_n = normalize(quaternion)
    vt = qrot(q_n, vertices) + translation
    points_2d, depths = project_points_arrays(extrinsic, intrinsic, None, vt)

    # silhouette + lighting, inlined functional forms of the adjacency ops
    tri2 = points_2d[faces_j]
    u2 = tri2[:, 1, :] - tri2[:, 0, :]
    w2 = tri2[:, 2, :] - tri2[:, 0, :]
    visible = (u2[:, 0] * w2[:, 1] - w2[:, 0] * u2[:, 1]) < 0
    vis_padded = jnp.where(edge_faces_j >= 0, visible[jnp.maximum(edge_faces_j, 0)], False)
    edge_sil = jnp.sum(vis_padded, axis=1) == 1
    edgeflags = jax.lax.stop_gradient(edge_sil[faces_edges_j])

    tri3 = vt[faces_j]
    fn = jnp.cross(tri3[:, 1, :] - tri3[:, 0, :], tri3[:, 2, :] - tri3[:, 0, :])
    fn = fn / jnp.linalg.norm(fn, axis=1, keepdims=True)
    vn = jax.ops.segment_sum(jnp.repeat(fn, 3, axis=0), faces_j.ravel(), num_segments=vertices.shape[0])
    vn = vn / jnp.linalg.norm(vn, axis=1, keepdims=True)
    lum = jnp.maximum(0.0, -jnp.sum(vn * light_directional, axis=1)) + light_ambient
    colors = jnp.tile(mesh_color[None, :], (vertices.shape[0], 1)) * lum[:, None]

    nbv = vertices.shape[0]
    dtype = points_2d.dtype
    buffers = SceneBuffers(
        faces=faces_j,
        faces_uv=faces_j,
        ij=points_2d,
        depths=depths,
        uv=jnp.zeros((nbv, 2), dtype),
        shade=jnp.zeros((nbv,), dtype),
        colors=colors,
        edgeflags=edgeflags,
        textured=jnp.zeros((faces_j.shape[0],), bool),
        shaded=jnp.zeros((faces_j.shape[0],), bool),
        texture=None,
        background_image=None,
        background_color=background_color,
        height=height,
        width=width,
        clockwise=False,
        backface_culling=True,
        strict_edge=True,
        perspective_correct=False,
        integer_pixel_centers=True,
    )
    image, _, _ = render_scene(buffers, sigma, aa_edge_capacity=cap)
    return jnp.sum((image - obs) ** 2)


def make_multiview_train_step(static, mesh: Mesh, lr: float = 1e-6):
    """Build a jitted multi-view fitting step, view-sharded over the mesh.

    Returns ``step(params, obs_batch, extrinsics, intrinsics) -> (params,
    loss)``. Build it ONCE and reuse it — each builder call produces a fresh
    jit cache entry.

    params: dict(vertices (V,3), quaternion (F,4), translation (F,3),
    mesh_color (3,), light_directional (3,), light_ambient ()).
    obs_batch: (F, H, W, 3) observed images, sharded over the ``views`` axis;
    extrinsics/intrinsics: (F, 3, 4)/(F, 3, 3).

    Per-view quantities stay on their device; the shared-parameter gradients
    (vertices/color/lights) and the scalar loss are all-reduced by XLA over
    the mesh — this is the view-parallel generalization of the reference's
    sequential multi-frame gradient accumulation
    (reference: deodr/mesh_fitter.py:529-549).
    """
    view_sharded = NamedSharding(mesh, P("views"))
    replicated = NamedSharding(mesh, P())

    def loss_fn(params, obs_batch, extrinsics, intrinsics):
        per_view = jax.vmap(
            lambda q, t, ext, intr, obs: _render_view(
                params["vertices"], q, t, params["mesh_color"],
                params["light_directional"], params["light_ambient"],
                ext, intr, obs, static,
            )
        )(params["quaternion"], params["translation"], extrinsics, intrinsics, obs_batch)
        return jnp.sum(per_view)

    @partial(jax.jit, out_shardings=(replicated, replicated))
    def step_jit(params, obs_batch, extrinsics, intrinsics):
        loss, grads = jax.value_and_grad(loss_fn)(params, obs_batch, extrinsics, intrinsics)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    def step(params, obs_batch, extrinsics, intrinsics):
        obs_batch = jax.device_put(obs_batch, view_sharded)
        extrinsics = jax.device_put(extrinsics, view_sharded)
        intrinsics = jax.device_put(intrinsics, view_sharded)
        params = jax.device_put(params, replicated)
        return step_jit(params, obs_batch, extrinsics, intrinsics)

    return step


def multiview_train_step(params, obs_batch, extrinsics, intrinsics, static, mesh: Mesh, lr: float = 1e-6):
    """One-shot convenience wrapper around :func:`make_multiview_train_step`
    (recompiles per call — build the step once for loops)."""
    return make_multiview_train_step(static, mesh, lr)(params, obs_batch, extrinsics, intrinsics)


def make_textured_multiview_step(
    buffers: SceneBuffers,
    sigma: float,
    mesh: Mesh,
    lr: float = 1e-12,
    aa_edge_capacity=None,
    tiling=None,
    impl=None,
    aa_window=None,
    aa_tex_window=None,
    aa_tex_plan=None,
    impl_interpret: bool = False,
):
    """View-sharded fitting step for TEXTURED scenes (the duck /
    eigen-faces class): the texture atlas, uv and Gouraud shade are shared
    parameters, the per-view projected vertices ``ij`` and observations
    are sharded over the ``views`` mesh axis.

    Implemented with ``shard_map`` + an explicit ``psum`` of the FINAL
    shared-parameter gradients, not ``jit`` auto-sharding: the
    auto-sharded lowering of the same step all-reduces the bilinear
    footprint-table cotangent BEFORE the atlas un-build — a
    (tex_h·tex_w, 4C) payload, 12.6 MB/step for a 512² RGB atlas, on top
    of the 3.1 MB atlas gradient (16.1 MB total, measured from the
    compiled HLO; SCALING_r05.json). Under shard_map each device finishes
    its local backward to the (tex_h, tex_w, C) atlas gradient and the
    ring carries exactly texture+uv+shade grads + the scalar loss
    (~3.2 MB) — a 5× cut in the DCN stress case's payload. This is the
    view-parallel generalization of the reference's sequential multi-frame
    accumulation (reference: deodr/mesh_fitter.py:529-549) for its
    texture-fitting surface (reference: ``renderScene_B``'s texture_b /
    uv_b / shade_b outputs).

    params: dict(texture (th, tw, C), uv (N, 2), shade (N,)).
    ij_batch: (F, N, 2) per-view projected vertices, F a multiple of the
    ``views`` axis size; obs_batch: (F, H, W, C).

    Returns ``step(params, ij_batch, obs_batch) -> (params, loss)``
    (jitted; build once and reuse). ``check_vma`` stays off: the Pallas
    kernels' vma propagation gap (see make_tile_sharded_render) applies
    here too; the sharded-vs-sequential equivalence test in
    tests/test_parallel.py is the safety net.
    """
    from deodr_tpu.ops.render import default_impl

    if impl is None:
        impl = default_impl()
    n_views = mesh.shape["views"]
    view_sharded = NamedSharding(mesh, P("views"))
    replicated = NamedSharding(mesh, P())

    def local_loss(params, ij_batch, obs_batch):
        def one(ij, obs):
            b = dataclasses.replace(
                buffers, ij=ij, texture=params["texture"], uv=params["uv"], shade=params["shade"]
            )
            img, _, _ = render_scene(
                b, sigma, aa_edge_capacity=aa_edge_capacity, tiling=tiling, impl=impl,
                aa_window=aa_window, aa_tex_window=aa_tex_window, aa_tex_plan=aa_tex_plan,
                impl_interpret=impl_interpret,
            )
            return jnp.sum((img - obs) ** 2)

        return jnp.sum(jax.vmap(one)(ij_batch, obs_batch))

    def shard_step(params, ij_batch, obs_batch):
        loss, grads = jax.value_and_grad(local_loss)(params, ij_batch, obs_batch)
        # the ONLY cross-device traffic: final shared-param grads + loss
        grads = jax.lax.psum(grads, "views")
        loss = jax.lax.psum(loss, "views")
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    sharded = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P("views"), P("views")),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step_jit(params, ij_batch, obs_batch):
        return sharded(params, ij_batch, obs_batch)

    def step(params, ij_batch, obs_batch):
        assert ij_batch.shape[0] % n_views == 0, (ij_batch.shape, n_views)
        params = jax.device_put(params, replicated)
        ij_batch = jax.device_put(ij_batch, view_sharded)
        obs_batch = jax.device_put(obs_batch, view_sharded)
        return step_jit(params, ij_batch, obs_batch)

    step.step_jit = step_jit  # exposed for HLO payload inspection (tools/)
    return step
