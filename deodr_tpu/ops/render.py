"""Full scene rendering: solid pass + silhouette edge-overdraw pass.

This is the functional equivalent of the reference's ``renderScene`` /
``renderScene_B`` pair (reference: C++/DifferentiableRenderer.h:2717-3135)
— one pure function, differentiable by jax.grad w.r.t. vertex positions
(``ij``), depth-as-attribute colors, per-vertex colors, uv, shade, texture
and background.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from deodr_tpu.ops.common import gather_rows_mm
from deodr_tpu.ops.edge_aa import EdgeAAConfig, EdgeData, edge_overdraw_pass, edge_overdraw_pass_windowed
from deodr_tpu.ops.raster import find_winners, shade_pixels


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "faces",
        "faces_uv",
        "ij",
        "depths",
        "uv",
        "shade",
        "colors",
        "edgeflags",
        "textured",
        "shaded",
        "texture",
        "background_image",
        "background_color",
    ],
    meta_fields=[
        "height",
        "width",
        "clockwise",
        "backface_culling",
        "strict_edge",
        "perspective_correct",
        "integer_pixel_centers",
    ],
)
@dataclasses.dataclass
class SceneBuffers:
    """The 2.5D scene record handed to the rasterizer — the same interface
    boundary as the reference's C ``Scene`` struct (reference:
    C++/DifferentiableRenderer.h:56-90; deodr/differentiable_renderer.py:16-45)
    but as a JAX pytree.

    ``ij[:, 0]`` is the x (column) coordinate and ``ij[:, 1]`` the y (row)
    coordinate of each projected vertex; pixel centers are at integer
    coordinates when ``integer_pixel_centers`` (reference conventions,
    readme.md).
    """

    faces: jnp.ndarray  # (T, 3) int32
    faces_uv: jnp.ndarray  # (T, 3) int32
    ij: jnp.ndarray  # (V, 2)
    depths: jnp.ndarray  # (V,)
    uv: jnp.ndarray  # (Vuv, 2)
    shade: jnp.ndarray  # (V,)
    colors: jnp.ndarray  # (V, C)
    edgeflags: jnp.ndarray  # (T, 3) bool
    textured: jnp.ndarray  # (T,) bool
    shaded: jnp.ndarray  # (T,) bool
    texture: Optional[jnp.ndarray]  # (th, tw, C) or None
    background_image: Optional[jnp.ndarray]  # (H, W, C) or None
    background_color: Optional[jnp.ndarray]  # (C,) or None
    height: int = 0
    width: int = 0
    clockwise: bool = False
    backface_culling: bool = True
    strict_edge: bool = True
    perspective_correct: bool = False
    integer_pixel_centers: bool = True


def _culling(scene: SceneBuffers):
    """Per-triangle signed area with behind-camera masking (reference:
    C++/DifferentiableRenderer.h:2751-2779)."""
    v_xy = scene.ij[scene.faces]
    v_z = scene.depths[scene.faces]
    frontal = jnp.all(v_z >= 0, axis=1)
    u = v_xy[:, 1, :] - v_xy[:, 0, :]
    w = v_xy[:, 2, :] - v_xy[:, 0, :]
    raw = 0.5 * (u[:, 0] * w[:, 1] - w[:, 0] * u[:, 1])
    area = raw if scene.clockwise else -raw
    return jnp.where(frontal, area, 0.0)


def default_impl() -> str:
    """The preferred tiled-rasterization implementation for the current
    backend: the fused Pallas kernels on TPU, the (equivalent) XLA path
    elsewhere (Pallas interpret mode on CPU is far slower than XLA)."""
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


def render_scene(
    scene: SceneBuffers,
    sigma: float,
    antialiase_error: bool = False,
    obs: Optional[jnp.ndarray] = None,
    chunk: int = 64,
    aa_edge_capacity: Optional[int] = None,
    tiling=None,
    impl: Optional[str] = "xla",
    impl_interpret: bool = False,
    aa_window: Optional[tuple] = None,
    aa_tex_window: Optional[tuple] = None,
    aa_tex_plan=None,
    check_capacity: bool = False,
):
    """Render a 2.5D scene.

    Returns (image, z_buffer, err_buffer); ``err_buffer`` is None unless
    ``antialiase_error``. ``sigma`` and ``antialiase_error`` are static.

    ``tiling`` (an :class:`deodr_tpu.ops.tiled.TilingConfig` or None)
    selects the binned/tiled rasterization path — same per-pixel math,
    O(H·W·bin-occupancy) instead of O(H·W·T) work.

    ``check_capacity`` inserts :mod:`jax.experimental.checkify` assertions
    that every static bin/compaction capacity (tile triangle bins, drawn
    compaction, AA edge compaction, edge tile bins, texture-window segment
    compaction) actually held — oversubscribed bins otherwise drop the
    lowest-priority entries silently. The caller must functionalize the
    checks (``checkify.checkify``); :func:`render_scene_checked` does that
    and throws on the host.

    In error mode (the paper's "antialiase the residual"), the err_buffer is
    initialized with the per-pixel squared difference between the
    *non-antialiased* image and ``obs``, then silhouette bands blend the
    residual (reference: C++/DifferentiableRenderer.h:2824-2837, :2850-2897).
    """
    if impl is None:
        impl = default_impl()
    checks: Optional[list] = [] if check_capacity else None
    offset = 0.0 if scene.integer_pixel_centers else 0.5
    ij_off = scene.ij - offset
    height, width = scene.height, scene.width

    signed_area_v = _culling(scene)
    draw = signed_area_v > 0
    if not scene.backface_culling:
        draw = jnp.ones_like(draw)
    # textured-but-unshaded triangles are skipped entirely by the reference
    # driver (reference: C++/DifferentiableRenderer.h:2799-2818)
    draw = draw & (~scene.textured | scene.shaded)

    v_xy = ij_off[scene.faces]
    v_z = scene.depths[scene.faces]

    if scene.background_image is not None:
        background = scene.background_image
    else:
        background = jnp.broadcast_to(scene.background_color, (height, width, scene.colors.shape[1]))

    if tiling is not None:
        if impl == "pallas":
            from deodr_tpu.ops.tiled import rasterize_tiled_pallas

            image, z_buffer, solid_max = rasterize_tiled_pallas(
                scene, ij_off, draw, background, tiling, interpret=(impl_interpret or False),
                checks=checks,
            )
        else:
            from deodr_tpu.ops.tiled import rasterize_tiled

            image, z_buffer, solid_max = rasterize_tiled(
                scene, ij_off, draw, background, tiling, checks=checks
            )
        if checks is not None:
            checks.append(("solid tile bin", solid_max, tiling.triangle_capacity))
    else:
        winner, z_buffer = find_winners(
            v_xy,
            v_z,
            draw,
            width,
            height,
            strict_edge=scene.strict_edge,
            perspective_correct=scene.perspective_correct,
            chunk=chunk,
        )
        winner = jax.lax.stop_gradient(winner)
        z_buffer = jax.lax.stop_gradient(z_buffer)
        image = shade_pixels(
            winner,
            ij_off,
            scene.depths,
            scene.faces,
            scene.faces_uv,
            scene.colors,
            scene.uv,
            scene.shade,
            scene.textured,
            scene.shaded,
            scene.texture,
            background,
            perspective_correct=scene.perspective_correct,
        )
    z_buffer = jax.lax.stop_gradient(z_buffer)

    err_buffer = None
    if antialiase_error:
        assert obs is not None
        err_buffer = jnp.sum((image - obs) ** 2, axis=-1)

    if sigma > 0:
        edges = _build_edge_data(scene, ij_off, signed_area_v, aa_edge_capacity, checks=checks)
        # the pallas edge kernel covers the (common) untextured,
        # non-perspective-correct attribute path; other configs use the
        # XLA tiled pass. Both tiled passes bin whole edges with the exact
        # band-vs-tile intersection test, so no edge splitting is needed.
        use_pallas_edges = (
            tiling is not None and impl == "pallas" and scene.texture is None and not scene.perspective_correct
        )
        cfg = EdgeAAConfig(
            height=height,
            width=width,
            sigma=float(sigma),
            clockwise=bool(scene.clockwise),
            perspective_correct=bool(scene.perspective_correct),
            error_mode=bool(antialiase_error),
            has_texture=scene.texture is not None,
            tex_win=aa_tex_window if scene.texture is not None else None,
        )
        texture = scene.texture
        if texture is None:
            texture = jnp.zeros((1, 1, scene.colors.shape[1]), scene.colors.dtype)
        # textured scenes route to the Pallas textured edge kernel when a
        # texture-window plan is available (per-edge uv windows + soft-one-hot
        # MXU sampling; see ops/pallas/edge_tex_kernel.py). The XLA *tiled*
        # textured pass stays disallowed: its reverse scan would carry a full
        # texture-gradient buffer per framebuffer tile (n_tiles x texture
        # bytes of HBM traffic per edge slot — ~100 GB for a 512^2 texture at
        # 640x480), while the untiled pass carries exactly one
        use_pallas_tex_edges = (
            tiling is not None
            and impl == "pallas"
            and scene.texture is not None
            and not scene.perspective_correct
            and aa_tex_plan is not None
        )
        use_tiled_edges = tiling is not None and scene.texture is None
        edge_max = None
        if use_pallas_tex_edges:
            from deodr_tpu.ops.tiled import edge_pass_tiled_pallas_tex

            if antialiase_error:
                err_buffer, edge_max = edge_pass_tiled_pallas_tex(
                    cfg, err_buffer, edges, texture, z_buffer, obs, tiling, aa_tex_plan,
                    interpret=impl_interpret, checks=checks,
                )
            else:
                image, edge_max = edge_pass_tiled_pallas_tex(
                    cfg, image, edges, texture, z_buffer, None, tiling, aa_tex_plan,
                    interpret=impl_interpret, checks=checks,
                )
        elif use_tiled_edges:
            if use_pallas_edges:
                from deodr_tpu.ops.tiled import edge_pass_tiled_pallas

                if antialiase_error:
                    err_buffer, edge_max = edge_pass_tiled_pallas(
                        cfg, err_buffer, edges, z_buffer, obs, tiling, interpret=impl_interpret
                    )
                else:
                    image, edge_max = edge_pass_tiled_pallas(
                        cfg, image, edges, z_buffer, None, tiling, interpret=impl_interpret
                    )
            else:
                from deodr_tpu.ops.tiled import edge_pass_tiled

                if antialiase_error:
                    err_buffer, edge_max = edge_pass_tiled(cfg, err_buffer, edges, texture, z_buffer, obs, tiling)
                else:
                    image, edge_max = edge_pass_tiled(cfg, image, edges, texture, z_buffer, None, tiling)
        elif antialiase_error:
            if aa_window is not None:
                err_buffer = edge_overdraw_pass_windowed(cfg, err_buffer, edges, texture, z_buffer, obs, aa_window)
            else:
                err_buffer = edge_overdraw_pass(cfg, err_buffer, edges, texture, z_buffer, obs)
        else:
            obs_dummy = jnp.zeros((1, 1, 1), image.dtype) if obs is None else obs
            if aa_window is not None:
                image = edge_overdraw_pass_windowed(cfg, image, edges, texture, z_buffer, obs_dummy, aa_window)
            else:
                image = edge_overdraw_pass(cfg, image, edges, texture, z_buffer, obs_dummy)
        if checks is not None and edge_max is not None:
            checks.append(("edge tile bin", edge_max, tiling.edge_capacity))

    if checks:
        from jax.experimental import checkify

        for label, count, capacity in checks:
            checkify.check(
                count <= capacity,
                label + " overflow: occupancy {c} exceeds static capacity {k}; "
                "entries were dropped — raise the capacity in TilingConfig / "
                "the plan (see suggest_tiling)",
                c=count,
                k=jnp.asarray(capacity),
            )

    return image, z_buffer, err_buffer


def validate_capacities(scene: SceneBuffers, sigma: float, caps, tile_h: int, tile_w: int,
                        edge_tile_h: int = 0, super_shape=(0, 0), tex_block_w: int = 0,
                        uv_segment_length: float = 0.0, uv_n_split: int = 1):
    """Binning-only re-computation of the bin/compaction COUNTS of a render,
    asserted via ``checkify.check`` — no per-pixel work, and every capacity
    is a DYNAMIC scalar so ONE compilation serves every plan the fitter's
    hysteresis produces.

    ``caps`` is a (7,) int32 vector of the capacities to check:
    [aa edge compaction | solid tile bin | edge tile bin | supertile bin |
    drawn compaction | texture tile compaction | texture-window segment
    compaction]; pass a huge value (e.g. 2**30) to skip a class (a (5,)
    vector is accepted and skips the two texture classes). Only
    ``tile_h``/``tile_w``/``edge_tile_h``/``super_shape``/``tex_block_w``
    (grid layouts) and ``uv_segment_length``/``uv_n_split`` (the textured
    edge pass's segment-split rule) are static.

    The counts are capacity-independent histograms — per-tile bbox-overlap
    counts via the 2-D difference trick (identical to the dense binner's
    mask sums), band-vs-tile SAT mask sums, and plain drawn/active sums —
    so they are EXACTLY the counts the renderer's bins see, except:

    - the edge-tile count is checked WITHOUT occlusion culling: an upper
      bound on the rendered count, and the same bound the planner sizes
      ``edge_capacity`` from, so it fires exactly when the plan's sizing
      assumption broke;
    - the texture-tile count is the number of (8 × ``tex_block_w``) blocks
      overlapped by a drawn triangle's bbox — the bound the planner sizes
      ``tex_tile_capacity`` from, and a proven upper bound on the renderer's
      flag-based occupancy (a block fetches only when a covered TEXTURED
      pixel lies in it, and every covered pixel lies inside some drawn
      triangle's bbox);
    - the texture-window segment count reproduces ``split_edges``'s
      per-edge segment rule (ceil of the chebyshev uv span over
      ``uv_segment_length``, clipped to ``uv_n_split``) summed over active
      silhouette edges — exactly the count ``compact_active_edges`` sees.

    The quad-fallback capacity (opt-in DEODR_QUAD_FETCH path) is the one
    class not covered — it depends on per-quad tap spans, i.e. per-pixel
    work; quad-fetch callers should use
    ``render_scene(..., check_capacity=True)``.

    A full ``render_scene(check_capacity=True)`` pass on the XLA path costs
    ~1.5 s per firing on the hand scenes; this is ~ms.

    Must run under ``checkify.checkify``; returns a scalar 0 so it can
    stand in for an energy function's output.
    """
    from jax.experimental import checkify

    from deodr_tpu.ops.tiled import _edge_band_tile_mask
    from deodr_tpu.ops.raster import triangle_row_setup

    caps = jnp.asarray(caps)
    if caps.shape[0] < 7:  # back-compat: (5,) vectors skip the texture classes
        caps = jnp.concatenate(
            [caps, jnp.full((7 - caps.shape[0],), 1 << 30, caps.dtype)]
        )
    offset = 0.0 if scene.integer_pixel_centers else 0.5
    ij_off = scene.ij - offset
    height, width = scene.height, scene.width
    signed_area_v = _culling(scene)
    draw = signed_area_v > 0
    if not scene.backface_culling:
        draw = jnp.ones_like(draw)
    draw = draw & (~scene.textured | scene.shaded)

    def tile_histogram(x_lo, x_hi, y_lo, y_hi, valid, th, tw):
        """Per-tile bbox-overlap counts (== dense bin counts), (n_ty, n_tx)."""
        n_ty = -(-height // th)
        n_tx = -(-width // tw)
        ok = valid & (x_lo <= x_hi) & (y_lo <= y_hi)
        ix0 = jnp.clip(jnp.floor_divide(x_lo.astype(jnp.int32), tw), 0, n_tx - 1)
        ix1 = jnp.clip(jnp.floor_divide(x_hi.astype(jnp.int32), tw), 0, n_tx - 1)
        iy0 = jnp.clip(jnp.floor_divide(y_lo.astype(jnp.int32), th), 0, n_ty - 1)
        iy1 = jnp.clip(jnp.floor_divide(y_hi.astype(jnp.int32), th), 0, n_ty - 1)
        one = ok.astype(jnp.float32)
        delta = jnp.zeros((n_ty + 1, n_tx + 1))
        delta = delta.at[iy0, ix0].add(one)
        delta = delta.at[iy1 + 1, ix0].add(-one)
        delta = delta.at[iy0, ix1 + 1].add(-one)
        delta = delta.at[iy1 + 1, ix1 + 1].add(one)
        return jnp.cumsum(jnp.cumsum(delta, axis=0), axis=1)[:n_ty, :n_tx]

    def tile_histogram_max(x_lo, x_hi, y_lo, y_hi, valid, th, tw):
        return jnp.max(tile_histogram(x_lo, x_hi, y_lo, y_hi, valid, th, tw)).astype(jnp.int32)

    setup = triangle_row_setup(
        jax.lax.stop_gradient(ij_off[scene.faces]),
        jax.lax.stop_gradient(scene.depths[scene.faces]),
        draw, width, height, scene.strict_edge, scene.perspective_correct,
    )
    x_lo, x_hi = setup.x_lo, setup.x_hi
    y_lo, y_hi = setup.y_lo[:, 0], setup.y_hi[:, 1]

    active_edges = scene.edgeflags & (signed_area_v > 0)[:, None]
    aa_count = jnp.sum(active_edges).astype(jnp.int32)
    solid_max = tile_histogram_max(x_lo, x_hi, y_lo, y_hi, setup.valid, tile_h, tile_w)
    super_max = jnp.zeros((), jnp.int32)
    s_ty, s_tx = super_shape
    if s_ty and s_tx:
        super_max = tile_histogram_max(
            x_lo, x_hi, y_lo, y_hi, setup.valid, tile_h * s_ty, tile_w * s_tx
        )
    edge_max = jnp.zeros((), jnp.int32)
    if sigma > 0:
        th_e = edge_tile_h or tile_h
        n_tye = -(-height // th_e)
        n_tx = -(-width // tile_w)
        # endpoint pairs per the reference's (1,0),(2,1),(0,2) slots
        sub0 = scene.faces[:, [1, 2, 0]].reshape(-1)
        sub1 = scene.faces[:, [0, 1, 2]].reshape(-1)
        v0 = jax.lax.stop_gradient(ij_off[sub0])
        v1 = jax.lax.stop_gradient(ij_off[sub1])
        mask = _edge_band_tile_mask(
            v0, v1, float(sigma), active_edges.reshape(-1), n_tye, n_tx, th_e,
            tile_w, height, width,
        )
        edge_max = jnp.max(jnp.sum(mask, axis=1)).astype(jnp.int32)

    drawn = jnp.sum(draw).astype(jnp.int32)

    tex_blocks = jnp.zeros((), jnp.int32)
    if scene.texture is not None and tex_block_w > 0:
        # occupied (8 × bw) texture-fetch blocks, bounded by drawn-triangle
        # bbox coverage — the planner's own sizing bound for
        # tex_tile_capacity (see Scene3D._eager_plan / _finish_shading_tile_tex)
        cb = tile_histogram(x_lo, x_hi, y_lo, y_hi, setup.valid, 8, tex_block_w)
        tex_blocks = jnp.sum(cb > 0).astype(jnp.int32)

    uv_segments = jnp.zeros((), jnp.int32)
    if scene.texture is not None and sigma > 0 and uv_segment_length > 0:
        # reproduce split_edges' per-edge segment rule over active
        # silhouette edges (ops/tiled.py::split_edges)
        fuv0 = scene.faces_uv[:, [1, 2, 0]].reshape(-1)
        fuv1 = scene.faces_uv[:, [0, 1, 2]].reshape(-1)
        uvspan = jnp.max(jnp.abs(scene.uv[fuv0] - scene.uv[fuv1]), axis=1)
        need = jnp.maximum(1.0, uvspan / uv_segment_length)
        n_seg = jnp.clip(
            jnp.ceil(jnp.nan_to_num(need, nan=1.0, posinf=float(uv_n_split))), 1, uv_n_split
        )
        act = scene.edgeflags.reshape(-1) & (signed_area_v > 0)[:, None].repeat(3, axis=1).reshape(-1)
        uv_segments = jnp.sum(jnp.where(act, n_seg, 0.0)).astype(jnp.int32)

    for label, count, cap_i in (
        ("AA edge compaction", aa_count, 0),
        ("solid tile bin", solid_max, 1),
        ("edge tile bin", edge_max, 2),
        ("supertile bin", super_max, 3),
        ("drawn-triangle compaction", drawn, 4),
        ("texture tile compaction", tex_blocks, 5),
        ("texture-window segment compaction", uv_segments, 6),
    ):
        checkify.check(
            count <= caps[cap_i],
            label + " overflow: occupancy {c} exceeds static capacity {k}; "
            "entries were dropped — raise the capacity in TilingConfig / "
            "the plan (see suggest_tiling)",
            c=count,
            k=caps[cap_i],
        )
    return jnp.zeros(())


def render_scene_checked(scene: SceneBuffers, sigma: float, **kwargs):
    """:func:`render_scene` with loud bin-capacity validation.

    Runs the render with ``check_capacity=True`` under
    ``checkify.checkify`` and throws ``JaxRuntimeError`` on the host if any
    static capacity was exceeded (instead of silently dropping bins —
    TilingConfig's documented overflow behavior). Use inside jit by
    checkifying your own function and passing ``check_capacity=True``.
    """
    from jax.experimental import checkify

    kwargs["check_capacity"] = True

    def f(s):
        return render_scene(s, sigma, **kwargs)

    err, out = checkify.checkify(f)(scene)
    err.throw()
    return out


def _build_edge_data(
    scene: SceneBuffers,
    ij_off: jnp.ndarray,
    signed_area_v: jnp.ndarray,
    aa_edge_capacity: Optional[int] = None,
    checks: Optional[list] = None,
) -> EdgeData:
    """Assemble per-edge arrays in back-to-front triangle order.

    The reference renders silhouette edges per triangle sorted by descending
    depth sum, using vertex pairs (1,0), (2,1), (0,2) for edge slots 0..2
    (reference: C++/DifferentiableRenderer.h:2781, :2822, :2839-2900).

    ``aa_edge_capacity`` (static) bounds the number of edge bands composited:
    active silhouette edges are compacted to the front of the (depth-ordered)
    edge list so the sequential blend scan runs over ``capacity`` steps
    instead of all 3·T edge slots. Silhouette edge counts scale like the
    square root of the face count, so a generous capacity is still far
    cheaper than 3·T.
    """
    nt = scene.faces.shape[0]
    dtype = ij_off.dtype
    sum_depth = jnp.sum(scene.depths[scene.faces], axis=1)
    order = _order_descending(sum_depth)  # back-to-front

    # TWO T-row gathers pull every per-face quantity into depth order at
    # once (TPU gathers cost ~13 cycles per ROW regardless of width); the
    # per-edge-slot values below come from 3-way arithmetic selects instead
    # of the ~10 separate 3T-row gathers this replaces.
    int_cols = jnp.concatenate([scene.faces, scene.faces_uv], axis=1)[order]  # (T, 6)
    flag_cols = jnp.concatenate(
        [
            scene.edgeflags.astype(dtype),
            (scene.textured & scene.shaded)[:, None].astype(dtype),
            (signed_area_v > 0)[:, None].astype(dtype),
        ],
        axis=1,
    )[order]  # (T, 5)
    int3 = jnp.repeat(int_cols, 3, axis=0)  # (3T, 6)
    flag3 = jnp.repeat(flag_cols, 3, axis=0)  # (3T, 5)
    slot = jnp.tile(jnp.arange(3), nt)

    def pick3(mat, base, sel):
        return jnp.where(
            sel == 0, mat[:, base], jnp.where(sel == 1, mat[:, base + 1], mat[:, base + 2])
        )

    def active_of(flags, sel):
        return (pick3(flags, 0, sel) > 0.5) & (flags[:, 4] > 0.5)

    active = active_of(flag3, slot)

    if aa_edge_capacity is not None and aa_edge_capacity < 3 * nt:
        if checks is not None:
            checks.append(("AA edge compaction", jnp.sum(active), aa_edge_capacity))
        # sort-free compaction: prefix-count ranks + one-hot contraction keep
        # active edges in depth order while moving them to the front, on the
        # (integer, non-differentiable) index level, so every per-slot array
        # derived below is capacity-sized instead of 3·T-sized
        activef = active.astype(jnp.float32)
        rank = (jnp.cumsum(activef) - activef).astype(jnp.int32)
        ks = jnp.arange(aa_edge_capacity, dtype=jnp.int32)
        onehot = ((rank[:, None] == ks[None, :]) & active[:, None]).astype(jnp.float32)
        perm = jnp.einsum("nk,n->k", onehot, jnp.arange(3 * nt, dtype=jnp.float32), precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
        got = ks < jnp.sum(active).astype(jnp.int32)
        slot = perm % 3
        int3 = int3[perm]
        flag3 = flag3[perm]
        active = active_of(flag3, slot) & got

    # edge endpoints (1,0), (2,1), (0,2) per slot (reference:
    # C++/DifferentiableRenderer.h:2822): vertex column (slot+1)%3 and slot
    sub0 = (slot + 1) % 3
    i0 = pick3(int3, 0, sub0)
    i1 = pick3(int3, 0, slot)
    iuv0 = pick3(int3, 3, sub0)
    iuv1 = pick3(int3, 3, slot)
    use_texture = flag3[:, 3] > 0.5

    # ONE feature-matrix gather per endpoint (positions+depth+colors+shade
    # stacked as columns) with a matmul adjoint: the per-array gathers this
    # replaces each paid a separate TPU scatter-add in the backward pass
    c = scene.colors.shape[1]
    feat = jnp.concatenate(
        [ij_off, scene.depths[:, None], scene.colors, scene.shade[:, None]], axis=1
    )
    e0 = gather_rows_mm(feat, i0)
    e1 = gather_rows_mm(feat, i1)
    has_uv = scene.texture is not None and scene.uv.shape[0] > 0
    uvs = (
        jnp.stack([gather_rows_mm(scene.uv, iuv0), gather_rows_mm(scene.uv, iuv1)], axis=1)
        if has_uv
        else jnp.zeros((i0.shape[0], 2, 2), ij_off.dtype)
    )
    return EdgeData(
        v0=e0[:, :2],
        v1=e1[:, :2],
        z=jnp.stack([e0[:, 2], e1[:, 2]], axis=1),
        attrs=jnp.stack([e0[:, 3 : 3 + c], e1[:, 3 : 3 + c]], axis=1),
        uvs=uvs,
        shades=jnp.stack([e0[:, 3 + c], e1[:, 3 + c]], axis=1),
        active=active,
        use_texture=use_texture,
    )


def _order_descending(keys: jnp.ndarray) -> jnp.ndarray:
    """Permutation sorting ``keys`` descending (ties → lower index first).

    For small N uses an O(N²) comparison-matrix ranking (XLA sorts are slow
    on TPU); falls back to argsort for large N.
    """
    n = keys.shape[0]
    if n > 4096:
        return jnp.argsort(-keys)
    idx = jnp.arange(n)
    gt = (keys[None, :] > keys[:, None]) | ((keys[None, :] == keys[:, None]) & (idx[None, :] < idx[:, None]))
    rank = jnp.sum(gt, axis=1).astype(jnp.int32)  # position of item i in the output
    onehot = (rank[:, None] == idx[None, :]).astype(jnp.float32)
    return jnp.einsum("ip,i->p", onehot, idx.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)


@partial(jax.jit, static_argnames=("sigma", "antialiase_error", "chunk", "aa_edge_capacity", "tiling", "impl", "aa_window", "aa_tex_window", "aa_tex_plan", "check_capacity"))
def render_scene_jit(
    scene: SceneBuffers,
    sigma: float,
    antialiase_error: bool = False,
    obs: Optional[jnp.ndarray] = None,
    chunk: int = 64,
    aa_edge_capacity: Optional[int] = None,
    tiling=None,
    impl: Optional[str] = "xla",
    aa_window: Optional[tuple] = None,
    aa_tex_window: Optional[tuple] = None,
    aa_tex_plan=None,
    check_capacity: bool = False,
):
    """Compile-cached entry point for :func:`render_scene`."""
    return render_scene(
        scene,
        sigma,
        antialiase_error=antialiase_error,
        obs=obs,
        chunk=chunk,
        aa_edge_capacity=aa_edge_capacity,
        tiling=tiling,
        impl=impl,
        aa_window=aa_window,
        aa_tex_window=aa_tex_window,
        aa_tex_plan=aa_tex_plan,
        check_capacity=check_capacity,
    )
