"""Discontinuity-edge-overdraw antialiasing pass.

Along each silhouette edge of a front-facing triangle, a band of width
``sigma`` outside the edge is blended over the framebuffer:

    out = T · in + (1 − T) · A

with T the linear transparency ramp (signed distance to the edge / sigma)
and A the edge color interpolated between the two edge endpoints. Bands are
composited back-to-front (painter's algorithm) and only over strictly
farther geometry (z-test, no z write), exactly like the reference's edge
pass (reference: C++/DifferentiableRenderer.h:1366-1460, :1541-1649,
:2839-2900). The ``error`` mode blends the per-pixel squared residual
against an observed image instead (reference:
C++/DifferentiableRenderer.h:2370-2478).

TPU-first design notes:

* the sequential painter blend is a ``lax.scan`` over edges in depth order,
  each step a masked, fully vectorized update of the framebuffer;
* the backward pass is a **custom VJP** that runs the scan in reverse and
  *un-blends* the framebuffer in place — in = (out − (1−T)·A) / T — so no
  per-edge forward intermediates are stored (O(1) memory in the number of
  edges). This is the same reconstruct-by-division trick as the reference
  adjoint (reference: C++/DifferentiableRenderer.h:1738, :2015), but each
  step's parameter gradients are obtained by jax.vjp of the step function
  instead of hand-written chain rules.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from typing import Optional, Tuple

from deodr_tpu.ops.common import bilinear_sample, bilinear_sample_window_mxu, floor_div, inv3x3


class EdgeData(NamedTuple):
    """Per-edge arrays, sorted back-to-front (leading axis = edge)."""

    v0: jnp.ndarray  # (E, 2) first endpoint (x, y), pixel-offset applied
    v1: jnp.ndarray  # (E, 2) second endpoint
    z: jnp.ndarray  # (E, 2) endpoint depths
    attrs: jnp.ndarray  # (E, 2, C) endpoint colors
    uvs: jnp.ndarray  # (E, 2, 2) endpoint texture coordinates
    shades: jnp.ndarray  # (E, 2) endpoint shades
    active: jnp.ndarray  # (E,) bool
    use_texture: jnp.ndarray  # (E,) bool


class EdgeAAConfig(NamedTuple):
    """Static configuration (hashable, used as nondiff argument)."""

    height: int
    width: int
    sigma: float
    clockwise: bool
    perspective_correct: bool
    error_mode: bool
    has_texture: bool
    # static texture-window shape: per-edge texture taps lie on the uv
    # segment [uv0, uv1] (the band's barycentrics satisfy b0 + b1 = 1), so
    # sampling/gradients can touch a small dynamic_slice of the texture
    # instead of the whole atlas. None = full-texture access.
    tex_win: Optional[Tuple[int, int]] = None


def _edge_stencil(cfg: EdgeAAConfig, v0, v1, dtype, oy=None, ox=None, win=None):
    """Band coverage and the affine maps (x,y,1) → (b0, b1, T) for one edge.

    Equivalent of ``get_edge_stencil_equations`` +
    ``get_edge_xrange_from_ineq`` (reference:
    C++/DifferentiableRenderer.h:1366-1460, :2620-2648).
    Returns (cov (H, W) bool, bary_coef (2, 3), t_coef (3,)).

    With ``oy/ox/win`` set, coverage is evaluated only on the
    ``win``-shaped window whose top-left pixel is (oy, ox) — all
    coordinates stay global, so results match the full-frame evaluation
    restricted to that window.
    """
    height, width = cfg.height, cfg.width
    # degenerate (zero-length / non-finite) edges would make the stencil
    # matrix singular; an inf/NaN primal poisons even fully-masked uses in
    # reverse-mode (0·inf in the inverse's VJP), so substitute a harmless
    # dummy edge and report invalidity (callers mask the band out)
    len2 = (v1[0] - v0[0]) ** 2 + (v1[1] - v0[1]) ** 2
    # the stencil det is ±|edge| via cofactors of O(coord) products, whose
    # fp cancellation noise is O(coord·eps): edges shorter than that can
    # yield det == 0 exactly (inf inverse) — treat them as degenerate
    eps = jnp.finfo(dtype).eps
    scale2 = jnp.maximum(1.0, v0[0] ** 2 + v0[1] ** 2 + v1[0] ** 2 + v1[1] ** 2)
    edge_ok = jax.lax.stop_gradient(
        jnp.isfinite(len2) & (len2 > (100.0 * eps) ** 2 * scale2) & jnp.isfinite(v0[0] + v0[1])
    )
    v0 = jnp.where(edge_ok, v0, jnp.asarray([0.0, 0.0], dtype))
    v1 = jnp.where(edge_ok, v1, jnp.asarray([1.0, 0.0], dtype))
    if cfg.clockwise:
        n = jnp.stack([v0[1] - v1[1], v1[0] - v0[0]])
    else:
        n = jnp.stack([v1[1] - v0[1], v0[0] - v1[0]])
    n = n / jnp.sqrt(n[0] ** 2 + n[1] ** 2)
    m = jnp.array(
        [
            [v0[0], v1[0], n[0]],
            [v0[1], v1[1], n[1]],
            [1.0, 1.0, 0.0],
        ],
        dtype=dtype,
    )
    inv = inv3x3(m)
    bary_coef = inv[:2]  # rows mapping (x, y, 1) → b0, b1
    t_coef = inv[2] / cfg.sigma

    # four band inequalities: b0 > 0, b1 > 0, T > 0, 1 − T > 0
    ineq = jnp.stack(
        [
            bary_coef[0],
            bary_coef[1],
            t_coef,
            jnp.stack([-t_coef[0], -t_coef[1], 1.0 - t_coef[2]]),
        ]
    )  # (4, 3)

    if win is None:
        yy = jnp.arange(height, dtype=dtype)
        xx = jnp.arange(width, dtype=dtype)
        n_rows = height
    else:
        yy = oy.astype(dtype) + jnp.arange(win[0], dtype=dtype)
        xx = ox.astype(dtype) + jnp.arange(win[1], dtype=dtype)
        n_rows = win[0]

    y_lo = jnp.maximum(jnp.floor(jnp.minimum(v0[1], v1[1]) - cfg.sigma) + 1, 0.0)
    y_hi = jnp.minimum(jnp.floor(jnp.maximum(v0[1], v1[1]) + cfg.sigma), float(height - 1))

    x_begin = jnp.zeros((n_rows,), dtype)
    x_end = jnp.full((n_rows,), float(width - 1), dtype)
    # sequential constraint refinement, matching the reference's loop order
    for k in range(4):
        a, b, c = ineq[k, 0], ineq[k, 1], ineq[k, 2]
        num = -(b * yy + c)
        fd = floor_div(num, a, x_begin - 1, x_end + 1)
        x_end = jnp.where(a < 0, jnp.minimum(x_end, fd), x_end)
        x_begin = jnp.where(a < 0, x_begin, jnp.maximum(x_begin, 1 + fd))

    row_ok = (yy >= y_lo) & (yy <= y_hi)
    cov = row_ok[:, None] & (xx[None, :] >= x_begin[:, None]) & (xx[None, :] <= x_end[:, None])
    return cov & edge_ok, bary_coef, t_coef


def _edge_fragment(
    cfg: EdgeAAConfig, edge: EdgeData, z_buffer, texture, obs,
    oy=None, ox=None, win=None, tex_origin=None, tex_full_hw=None,
):
    """Per-pixel blend mask, transparency T and edge value A for one edge.

    With ``oy/ox/win`` set, ``z_buffer`` must be the (win-shaped) window at
    that origin and all outputs are window-shaped. With ``tex_origin`` set,
    ``texture`` is a window of the full (``tex_full_hw``-shaped) texture at
    that origin.
    """
    height, width = cfg.height, cfg.width
    dtype = edge.v0.dtype
    cov, bary_coef, t_coef = _edge_stencil(cfg, edge.v0, edge.v1, dtype, oy=oy, ox=ox, win=win)

    if win is None:
        yy = jnp.arange(height, dtype=dtype)[:, None]
        xx = jnp.arange(width, dtype=dtype)[None, :]
    else:
        yy = (oy.astype(dtype) + jnp.arange(win[0], dtype=dtype))[:, None]
        xx = (ox.astype(dtype) + jnp.arange(win[1], dtype=dtype))[None, :]
    b0 = bary_coef[0, 0] * xx + bary_coef[0, 1] * yy + bary_coef[0, 2]
    b1 = bary_coef[1, 0] * xx + bary_coef[1, 1] * yy + bary_coef[1, 2]
    t = t_coef[0] * xx + t_coef[1] * yy + t_coef[2]

    if cfg.perspective_correct:
        inv_z = b0 / edge.z[0] + b1 / edge.z[1]
        z = 1.0 / inv_z
    else:
        z = b0 * edge.z[0] + b1 * edge.z[1]
    z = jax.lax.stop_gradient(z)

    mask = cov & (z < z_buffer) & edge.active & jnp.isfinite(t)
    t_safe = jnp.where(mask, t, 0.5)
    b0 = jnp.where(mask, b0, 0.0)
    b1 = jnp.where(mask, b1, 0.0)

    def interp(a0, a1):
        if cfg.perspective_correct:
            zz = jax.lax.stop_gradient(z)
            return (b0[..., None] * a0 / edge.z[0] + b1[..., None] * a1 / edge.z[1]) * zz[..., None]
        return b0[..., None] * a0 + b1[..., None] * a1

    a_px = interp(edge.attrs[0], edge.attrs[1])  # (H, W, C)
    if cfg.has_texture:
        uv_px = interp(edge.uvs[0], edge.uvs[1])
        lum = b0 * edge.shades[0] + b1 * edge.shades[1]
        if cfg.perspective_correct:
            lum = (b0 * edge.shades[0] / edge.z[0] + b1 * edge.shades[1] / edge.z[1]) * z
        if tex_origin is not None:
            tex_px = bilinear_sample_window_mxu(texture, uv_px, tex_origin, tex_full_hw) * lum[..., None]
        else:
            tex_px = bilinear_sample(texture, uv_px) * lum[..., None]
        a_px = jnp.where(edge.use_texture, tex_px, a_px)
    a_px = jnp.where(mask[..., None], a_px, 0.0)
    return mask, t_safe, a_px


def _blend_step(cfg: EdgeAAConfig, buffer, edge: EdgeData, z_buffer, texture, obs):
    """One painter's-algorithm blend: buffer ← T·buffer + (1−T)·value."""
    mask, t, a_px = _edge_fragment(cfg, edge, z_buffer, texture, obs)
    if cfg.error_mode:
        err = jnp.sum((a_px - jnp.where(mask[..., None], obs, 0.0)) ** 2, axis=-1)
        return jnp.where(mask, t * buffer + (1 - t) * err, buffer)
    return jnp.where(mask[..., None], t[..., None] * buffer + (1 - t[..., None]) * a_px, buffer)


def _i0(ref):
    return jnp.zeros((), ref.dtype)


def _window_origin(cfg: EdgeAAConfig, edge: EdgeData, win):
    """Top-left (row, col) of the static ``win``-shaped window containing the
    edge's antialiasing band (edge bbox grown by sigma, clamped in-frame)."""
    ymin = jnp.minimum(edge.v0[1], edge.v1[1]) - cfg.sigma
    xmin = jnp.minimum(edge.v0[0], edge.v1[0]) - cfg.sigma
    oy = jnp.clip(jnp.nan_to_num(jnp.floor(ymin)), 0, max(cfg.height - win[0], 0)).astype(jnp.int32)
    ox = jnp.clip(jnp.nan_to_num(jnp.floor(xmin)), 0, max(cfg.width - win[1], 0)).astype(jnp.int32)
    return jax.lax.stop_gradient(oy), jax.lax.stop_gradient(ox)


def _blend_step_window(
    cfg: EdgeAAConfig, buf_win, edge: EdgeData, z_win, texture, obs_win, oy, ox, win,
    tex_origin=None, tex_full_hw=None,
):
    """One painter blend restricted to a window (global coordinates)."""
    mask, t, a_px = _edge_fragment(
        cfg, edge, z_win, texture, obs_win, oy=oy, ox=ox, win=win,
        tex_origin=tex_origin, tex_full_hw=tex_full_hw,
    )
    if cfg.error_mode:
        err = jnp.sum((a_px - jnp.where(mask[..., None], obs_win, 0.0)) ** 2, axis=-1)
        return jnp.where(mask, t * buf_win + (1 - t) * err, buf_win)
    return jnp.where(mask[..., None], t[..., None] * buf_win + (1 - t[..., None]) * a_px, buf_win)


def _use_tex_win(cfg: EdgeAAConfig, texture) -> bool:
    return (
        cfg.has_texture
        and cfg.tex_win is not None
        and cfg.tex_win[0] <= texture.shape[0]
        and cfg.tex_win[1] <= texture.shape[1]
        and cfg.tex_win != (texture.shape[0], texture.shape[1])
    )


def _tex_window_origin(cfg: EdgeAAConfig, edge: EdgeData, texture):
    """Top-left (row, col) texel of the static uv window for one edge: band
    uv lies on the segment [uv0, uv1], so all bilinear taps fit a window of
    size >= uv span + 3."""
    th, tw = texture.shape[0], texture.shape[1]
    uv_lo = jax.lax.stop_gradient(jnp.nan_to_num(jnp.floor(jnp.minimum(edge.uvs[0], edge.uvs[1]))))
    tou = jnp.clip(uv_lo[1], 0, max(th - cfg.tex_win[0], 0)).astype(jnp.int32)
    tov = jnp.clip(uv_lo[0], 0, max(tw - cfg.tex_win[1], 0)).astype(jnp.int32)
    return tou, tov


def _slice_tex(cfg: EdgeAAConfig, texture, tou, tov):
    return jax.lax.dynamic_slice(
        texture, (tou, tov, jnp.zeros((), tou.dtype)), cfg.tex_win + (texture.shape[2],)
    )


@partial(jax.custom_vjp, nondiff_argnums=(0, 6))
def edge_overdraw_pass_windowed(cfg: EdgeAAConfig, buffer0, edges: EdgeData, texture, z_buffer, obs, win):
    """Same compositing as :func:`edge_overdraw_pass`, but each scan step
    touches only a static ``win = (wh, ww)`` window around the edge's band
    instead of the full framebuffer.

    Bands are thin slivers (length ≤ edge length + 2, width 2·sigma), so at
    640×480 full-frame steps waste >100× the pixel work; callers pick ``win``
    eagerly from the max band bbox over active silhouette edges (see
    ``Scene3D._eager_plan``), making results identical to the full pass.
    """

    tex_wind = _use_tex_win(cfg, texture)
    tex_full_hw = (texture.shape[0], texture.shape[1])

    def step(buf, edge):
        oy, ox = _window_origin(cfg, edge, win)
        if cfg.error_mode:
            sl, sz = (oy, ox), win
            obs_win = jax.lax.dynamic_slice(obs, (oy, ox, _i0(oy)), win + (obs.shape[2],))
        else:
            sl, sz = (oy, ox, _i0(oy)), win + (buf.shape[2],)
            obs_win = None
        buf_win = jax.lax.dynamic_slice(buf, sl, sz)
        z_win = jax.lax.dynamic_slice(z_buffer, (oy, ox), win)
        if tex_wind:
            tou, tov = _tex_window_origin(cfg, edge, texture)
            tsl = _slice_tex(cfg, texture, tou, tov)
            new_win = _blend_step_window(
                cfg, buf_win, edge, z_win, tsl, obs_win, oy, ox, win,
                tex_origin=(tou, tov), tex_full_hw=tex_full_hw,
            )
        else:
            new_win = _blend_step_window(cfg, buf_win, edge, z_win, texture, obs_win, oy, ox, win)
        return jax.lax.dynamic_update_slice(buf, new_win, sl), None

    final, _ = jax.lax.scan(step, buffer0, edges)
    return final


def _edge_pass_win_fwd(cfg, buffer0, edges, texture, z_buffer, obs, win):
    final = edge_overdraw_pass_windowed(cfg, buffer0, edges, texture, z_buffer, obs, win)
    return final, (final, edges, texture, z_buffer, obs)


def _edge_pass_win_bwd(cfg, win, residuals, g):
    final, edges, texture, z_buffer, obs = residuals
    tex_wind = _use_tex_win(cfg, texture)
    tex_full_hw = (texture.shape[0], texture.shape[1])

    def rev_step(carry, edge):
        buf_after, g_buf, tex_b = carry
        oy, ox = _window_origin(cfg, edge, win)
        if cfg.error_mode:
            sl, sz = (oy, ox), win
            obs_win = jax.lax.dynamic_slice(obs, (oy, ox, _i0(oy)), win + (obs.shape[2],))
        else:
            sl, sz = (oy, ox, _i0(oy)), win + (buf_after.shape[2],)
            obs_win = None
        buf_win = jax.lax.dynamic_slice(buf_after, sl, sz)
        g_win = jax.lax.dynamic_slice(g_buf, sl, sz)
        z_win = jax.lax.dynamic_slice(z_buffer, (oy, ox), win)
        if tex_wind:
            tou, tov = _tex_window_origin(cfg, edge, texture)
            tex_in = _slice_tex(cfg, texture, tou, tov)
            tex_origin = (tou, tov)
        else:
            tex_in, tex_origin = texture, None
        mask, t, a_px = _edge_fragment(
            cfg, edge, z_win, tex_in, obs_win, oy=oy, ox=ox, win=win,
            tex_origin=tex_origin, tex_full_hw=tex_full_hw,
        )
        # un-blend (reference: C++/DifferentiableRenderer.h:1738), with the
        # same |t| floor as the full-frame backward
        eps = 1e-6
        t_div = jnp.where(jnp.abs(t) < eps, jnp.where(t < 0, -eps, eps), t)
        if cfg.error_mode:
            err = jnp.sum((a_px - jnp.where(mask[..., None], obs_win, 0.0)) ** 2, axis=-1)
            before_win = jnp.where(mask, (buf_win - (1 - t) * err) / t_div, buf_win)
        else:
            tm = t_div[..., None]
            before_win = jnp.where(mask[..., None], (buf_win - (1 - t[..., None]) * a_px) / tm, buf_win)

        def f(bw, e, tex):
            return _blend_step_window(
                cfg, bw, e, z_win, tex, obs_win, oy, ox, win,
                tex_origin=tex_origin, tex_full_hw=tex_full_hw,
            )

        _, vjp_fn = jax.vjp(f, before_win, edge, tex_in)
        g_before_win, edge_b, tex_inc = vjp_fn(g_win)
        buf_before = jax.lax.dynamic_update_slice(buf_after, before_win, sl)
        g_before = jax.lax.dynamic_update_slice(g_buf, g_before_win, sl)
        if tex_wind:
            # windowed read-modify-write on the texture-gradient carry —
            # the DS/DUS pair aliases in place inside the scan, unlike a
            # full-texture add (which copies the whole atlas every step)
            acc = _slice_tex(cfg, tex_b, tou, tov)
            tex_b = jax.lax.dynamic_update_slice(tex_b, acc + tex_inc, (tou, tov, _i0(tou)))
        else:
            tex_b = tex_b + tex_inc
        return (buf_before, g_before, tex_b), edge_b

    tex_zero = jnp.zeros_like(texture)
    (_, g0, tex_b), edges_b = jax.lax.scan(
        rev_step, (final, g, tex_zero), edges, reverse=True
    )
    return g0, edges_b, tex_b, jnp.zeros_like(z_buffer), jnp.zeros_like(obs)


edge_overdraw_pass_windowed.defvjp(_edge_pass_win_fwd, _edge_pass_win_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 7))
def edge_overdraw_pass_window_at(cfg: EdgeAAConfig, buffer_win, edges: EdgeData, texture, z_win, obs_win, origin, win):
    """Composite edge bands over a fixed window of the framebuffer.

    ``buffer_win``/``z_win``/``obs_win`` are the ``win``-shaped window whose
    top-left pixel is ``origin = (oy, ox)``; ``cfg.height/width`` stay the
    FULL frame dims and all stencils evaluate in global coordinates — so a
    tiled caller (one window per framebuffer tile) reproduces the untiled
    pass bit-for-bit: shifting vertices per tile instead would re-round the
    stencil equations in fp32 and flip pixel inclusion on band boundaries.

    ``origin`` is a (2,) float array (int-valued) so the custom VJP can
    return an ordinary zero cotangent for it.
    """
    oy = origin[0].astype(jnp.int32)
    ox = origin[1].astype(jnp.int32)
    tex_wind = _use_tex_win(cfg, texture)
    tex_full_hw = (texture.shape[0], texture.shape[1])

    def step(buf, edge):
        if tex_wind:
            tou, tov = _tex_window_origin(cfg, edge, texture)
            tsl = _slice_tex(cfg, texture, tou, tov)
            return _blend_step_window(
                cfg, buf, edge, z_win, tsl, obs_win, oy, ox, win,
                tex_origin=(tou, tov), tex_full_hw=tex_full_hw,
            ), None
        return _blend_step_window(cfg, buf, edge, z_win, texture, obs_win, oy, ox, win), None

    final, _ = jax.lax.scan(step, buffer_win, edges)
    return final


def _edge_pass_at_fwd(cfg, buffer_win, edges, texture, z_win, obs_win, origin, win):
    final = edge_overdraw_pass_window_at(cfg, buffer_win, edges, texture, z_win, obs_win, origin, win)
    return final, (final, edges, texture, z_win, obs_win, origin)


def _edge_pass_at_bwd(cfg, win, residuals, g):
    final, edges, texture, z_win, obs_win, origin = residuals
    oy = origin[0].astype(jnp.int32)
    ox = origin[1].astype(jnp.int32)
    tex_wind = _use_tex_win(cfg, texture)
    tex_full_hw = (texture.shape[0], texture.shape[1])

    def rev_step(carry, edge):
        buf_after, g_buf, tex_b = carry
        if tex_wind:
            tou, tov = _tex_window_origin(cfg, edge, texture)
            tex_in, tex_origin = _slice_tex(cfg, texture, tou, tov), (tou, tov)
        else:
            tex_in, tex_origin = texture, None
        mask, t, a_px = _edge_fragment(
            cfg, edge, z_win, tex_in, obs_win, oy=oy, ox=ox, win=win,
            tex_origin=tex_origin, tex_full_hw=tex_full_hw,
        )
        eps = 1e-6
        t_div = jnp.where(jnp.abs(t) < eps, jnp.where(t < 0, -eps, eps), t)
        if cfg.error_mode:
            err = jnp.sum((a_px - jnp.where(mask[..., None], obs_win, 0.0)) ** 2, axis=-1)
            before = jnp.where(mask, (buf_after - (1 - t) * err) / t_div, buf_after)
        else:
            tm = t_div[..., None]
            before = jnp.where(mask[..., None], (buf_after - (1 - t[..., None]) * a_px) / tm, buf_after)

        def f(bw, e, tex):
            return _blend_step_window(
                cfg, bw, e, z_win, tex, obs_win, oy, ox, win,
                tex_origin=tex_origin, tex_full_hw=tex_full_hw,
            )

        _, vjp_fn = jax.vjp(f, before, edge, tex_in)
        g_before, edge_b, tex_inc = vjp_fn(g_buf)
        if tex_wind:
            acc = _slice_tex(cfg, tex_b, tou, tov)
            tex_b = jax.lax.dynamic_update_slice(tex_b, acc + tex_inc, (tou, tov, _i0(tou)))
        else:
            tex_b = tex_b + tex_inc
        return (before, g_before, tex_b), edge_b

    (_, g0, tex_b), edges_b = jax.lax.scan(
        rev_step, (final, g, jnp.zeros_like(texture)), edges, reverse=True
    )
    return g0, edges_b, tex_b, jnp.zeros_like(z_win), jnp.zeros_like(obs_win), jnp.zeros_like(origin)


edge_overdraw_pass_window_at.defvjp(_edge_pass_at_fwd, _edge_pass_at_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def edge_overdraw_pass(cfg: EdgeAAConfig, buffer0, edges: EdgeData, texture, z_buffer, obs):
    """Composite all silhouette-edge bands back-to-front over ``buffer0``.

    buffer0: (H, W, C) image (or (H, W) squared-residual buffer in error
    mode). Differentiable in buffer0, edges and texture; z_buffer and obs
    are treated as constants (matching the reference adjoint's contract).
    """

    def step(buf, edge):
        return _blend_step(cfg, buf, edge, z_buffer, texture, obs), None

    final, _ = jax.lax.scan(step, buffer0, edges)
    return final


def _edge_pass_fwd(cfg, buffer0, edges, texture, z_buffer, obs):
    final = edge_overdraw_pass(cfg, buffer0, edges, texture, z_buffer, obs)
    return final, (final, edges, texture, z_buffer, obs)


def _edge_pass_bwd(cfg, residuals, g):
    final, edges, texture, z_buffer, obs = residuals
    tex_zero = jnp.zeros_like(texture)

    def rev_step(carry, edge):
        buf_after, g_buf, tex_b = carry
        mask, t, a_px = _edge_fragment(cfg, edge, z_buffer, texture, obs)
        # reconstruct the pre-blend buffer by inverting the blend
        # (reference: C++/DifferentiableRenderer.h:1738)
        # floor |t| for the unblend division: the exact rational x-range test
        # can admit a pixel whose fp32 t evaluates to exactly 0
        eps = 1e-6
        t_div = jnp.where(jnp.abs(t) < eps, jnp.where(t < 0, -eps, eps), t)
        if cfg.error_mode:
            err = jnp.sum((a_px - jnp.where(mask[..., None], obs, 0.0)) ** 2, axis=-1)
            buf_before = jnp.where(mask, (buf_after - (1 - t) * err) / t_div, buf_after)
        else:
            tm = t_div[..., None]
            buf_before = jnp.where(mask[..., None], (buf_after - (1 - t[..., None]) * a_px) / tm, buf_after)

        def f(buf, e, tex):
            return _blend_step(cfg, buf, e, z_buffer, tex, obs)

        _, vjp_fn = jax.vjp(f, buf_before, edge, texture)
        g_before, edge_b, tex_inc = vjp_fn(g_buf)
        return (buf_before, g_before, tex_b + tex_inc), edge_b

    (buf0, g0, tex_b), edges_b = jax.lax.scan(
        rev_step, (final, g, tex_zero), edges, reverse=True
    )
    return g0, edges_b, tex_b, jnp.zeros_like(z_buffer), jnp.zeros_like(obs)


edge_overdraw_pass.defvjp(_edge_pass_fwd, _edge_pass_bwd)
