"""Solid (z-buffered) triangle rasterization.

TPU-first re-design of the reference's sequential scanline loop (reference:
C++/DifferentiableRenderer.h:741-1040, :2745-2820):

* **winner resolution** — instead of drawing triangles one-by-one into a
  mutable z-buffer, every pixel resolves its visible triangle with a z-argmin
  over triangle chunks (a ``lax.scan`` carrying per-pixel best-z/best-index).
  The coverage predicate evaluates, per (triangle, row), the exact same
  upper/lower-part x-ranges as the reference's ``get_xrange`` (reference:
  C++/DifferentiableRenderer.h:864-906), so covered pixel sets are identical,
  including the ``strict_edge`` shared-edge single-draw rule. Ties in z go to
  the lowest triangle index — the same pixel owner as the reference's
  back-to-front draw with a strict ``<`` z-test.

* **shading** — a separate, *differentiable* gather pass: each covered pixel
  gathers its winning triangle's corner data and evaluates barycentric
  attribute interpolation (optionally perspective-correct), texture fetch and
  Gouraud shade. jax.grad of this pass reproduces the reference's
  hand-written adjoint exactly: visibility is frozen (the winner index is a
  stop-gradient), while gradients flow to vertex positions through the
  barycentric matrix inverse and to attributes through the barycentric
  weights (reference: C++/DifferentiableRenderer.h:796-862, :974-1040).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from deodr_tpu.ops.common import (
    barycentric_matrices,
    safe_barycentric_matrices,
    bilinear_sample,
    ceil_div,
    edge_equations,
    floor_div,
)


class TriangleRowSetup(NamedTuple):
    """Per-triangle scalars consumed by the winner-resolution scan."""

    y_lo: jnp.ndarray  # (T, 2) first row of upper/lower part
    y_hi: jnp.ndarray  # (T, 2) last row of upper/lower part
    left_eq: jnp.ndarray  # (T, 2, 3) left edge equation per part
    right_eq: jnp.ndarray  # (T, 2, 3) right edge equation per part
    x_lo: jnp.ndarray  # (T,) clamped bbox x min
    x_hi: jnp.ndarray  # (T,) clamped bbox x max
    z_coef: jnp.ndarray  # (T, 3) affine map (x, y, 1) → z (or 1/z)
    valid: jnp.ndarray  # (T,) drawn at all


def triangle_row_setup(
    v_xy: jnp.ndarray,
    v_z: jnp.ndarray,
    draw: jnp.ndarray,
    width: int,
    height: int,
    strict_edge: bool,
    perspective_correct: bool,
) -> TriangleRowSetup:
    """Vectorized equivalent of ``get_triangle_stencil_equations``
    (reference: C++/DifferentiableRenderer.h:633-739)."""
    u = v_xy[:, 1, :] - v_xy[:, 0, :]
    w = v_xy[:, 2, :] - v_xy[:, 0, :]
    raw_cross = u[:, 0] * w[:, 1] - w[:, 0] * u[:, 1]
    local_cw = raw_cross > 0
    eq = edge_equations(v_xy, local_cw)  # (T, 3, 3)

    # 3-element sort/argsort done arithmetically: TPU element gathers
    # (take_along_axis/argsort) run ~1 element/cycle, while these min/max
    # selects are plain vector ops. Tie semantics reproduce a stable argsort
    # exactly: first index of the minimum, last index of the maximum.
    y0, y1, y2 = v_xy[:, 0, 1], v_xy[:, 1, 1], v_xy[:, 2, 1]
    x0, x1, x2 = v_xy[:, 0, 0], v_xy[:, 1, 0], v_xy[:, 2, 0]
    id0 = jnp.where((y0 <= y1) & (y0 <= y2), 0, jnp.where(y1 <= y2, 1, 2)).astype(jnp.int32)
    id2 = jnp.where((y2 >= y0) & (y2 >= y1), 2, jnp.where(y1 >= y0, 1, 0)).astype(jnp.int32)
    ys0 = jnp.minimum(jnp.minimum(y0, y1), y2)
    ys2 = jnp.maximum(jnp.maximum(y0, y1), y2)
    # exact median-of-3 (always one of the inputs, no arithmetic mixing)
    ys1 = jnp.maximum(jnp.minimum(y0, y1), jnp.minimum(jnp.maximum(y0, y1), y2))
    ys = jnp.stack([ys0, ys1, ys2], axis=1)
    xs_lo = jnp.minimum(jnp.minimum(x0, x1), x2)
    xs_hi = jnp.maximum(jnp.maximum(x0, x1), x2)

    def sel3(a, ids):
        """a (T, 3[, ...]) element/row select by per-triangle index."""
        c0 = (ids == 0).reshape(ids.shape + (1,) * (a.ndim - 2))
        c1 = (ids == 1).reshape(ids.shape + (1,) * (a.ndim - 2))
        return jnp.where(c0, a[:, 0], jnp.where(c1, a[:, 1], a[:, 2]))

    # upper part: edges adjacent to the topmost vertex; the one with a > 0 is
    # the left edge (reference: C++/DifferentiableRenderer.h:713-737)
    id0p2 = (id0 + 2) % 3
    a0 = sel3(eq[:, :, 0], id0)
    left0 = jnp.where(a0 > 0, id0, id0p2)
    right0 = jnp.where(a0 > 0, id0p2, id0)
    id2p2 = (id2 + 2) % 3
    a2 = sel3(eq[:, :, 0], id2)
    right1 = jnp.where(a2 < 0, id2, id2p2)
    left1 = jnp.where(a2 < 0, id2p2, id2)

    left_eq = jnp.stack([sel3(eq, left0), sel3(eq, left1)], axis=1)
    right_eq = jnp.stack([sel3(eq, right0), sel3(eq, right1)], axis=1)

    if strict_edge:
        y_lo = jnp.stack([jnp.floor(ys[:, 0]) + 1, jnp.floor(ys[:, 1]) + 1], axis=1)
        x_lo = jnp.floor(xs_lo)
    else:
        y_lo = jnp.stack([jnp.ceil(ys[:, 0]), jnp.ceil(ys[:, 1])], axis=1)
        x_lo = jnp.ceil(xs_lo)
    y_hi = jnp.stack([jnp.floor(ys[:, 1]), jnp.floor(ys[:, 2])], axis=1)
    x_hi = jnp.floor(xs_hi)

    y_lo = jnp.maximum(y_lo, 0.0)
    y_hi = jnp.minimum(y_hi, float(height - 1))
    x_lo = jnp.maximum(x_lo, 0.0)
    x_hi = jnp.minimum(x_hi, float(width - 1))

    xy1_to_bary, bary_valid = safe_barycentric_matrices(v_xy)  # (T, 3, 3), (T,)
    if perspective_correct:
        z_src = 1.0 / jnp.where(v_z == 0, 1.0, v_z)
        bary_valid = bary_valid & jnp.all(v_z != 0, axis=1)
    else:
        z_src = v_z
    z_coef = jnp.einsum("tk,tkj->tj", z_src, xy1_to_bary, precision=jax.lax.Precision.HIGHEST)

    finite = bary_valid & jnp.all(jnp.isfinite(z_coef), axis=1)
    return TriangleRowSetup(y_lo, y_hi, left_eq, right_eq, x_lo, x_hi, z_coef, draw & finite)


@partial(jax.jit, static_argnames=("width", "height", "strict_edge", "perspective_correct", "chunk"))
def find_winners(
    v_xy: jnp.ndarray,
    v_z: jnp.ndarray,
    draw: jnp.ndarray,
    width: int,
    height: int,
    strict_edge: bool = True,
    perspective_correct: bool = False,
    chunk: int = 64,
):
    """Resolve per-pixel visibility.

    Returns (winner (H, W) int32, -1 where uncovered; z_buffer (H, W), +inf
    where uncovered). All outputs are non-differentiable (visibility is
    discrete); callers should treat them as constants — which is exactly the
    reference's adjoint semantics (the z-buffer is an input of
    ``renderScene_B``, never differentiated).
    """
    v_xy = jax.lax.stop_gradient(v_xy)
    v_z = jax.lax.stop_gradient(v_z)
    dtype = v_xy.dtype
    nt = v_xy.shape[0]
    n_chunks = max(1, -(-nt // chunk))
    pad = n_chunks * chunk - nt

    setup = triangle_row_setup(v_xy, v_z, draw, width, height, strict_edge, perspective_correct)
    setup = jax.tree.map(lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)), setup)
    setup = jax.tree.map(lambda a: a.reshape((n_chunks, chunk) + a.shape[1:]), setup)

    yy = jnp.arange(height, dtype=dtype)  # (H,)
    xx = jnp.arange(width, dtype=dtype)  # (W,)
    big = jnp.asarray(jnp.inf, dtype)

    def x_range(eq_l, eq_r, x_lo, x_hi):
        """Per-(triangle, row) x interval; emulates ``get_xrange``
        (reference: C++/DifferentiableRenderer.h:864-906)."""
        num_l = -(eq_l[:, :, None, 1] * yy[None, None, :] + eq_l[:, :, None, 2])  # (Tc, 2, H)
        num_r = -(eq_r[:, :, None, 1] * yy[None, None, :] + eq_r[:, :, None, 2])
        lo = (x_lo - 1)[:, None, None]
        hi = x_hi[:, None, None]
        if strict_edge:
            t_l = 1 + floor_div(num_l, eq_l[:, :, None, 0], lo, hi)
        else:
            t_l = ceil_div(num_l, eq_l[:, :, None, 0], lo, hi)
        t_r = floor_div(num_r, eq_r[:, :, None, 0], lo, hi)
        x_begin = jnp.maximum(x_lo[:, None, None], t_l)
        x_end = jnp.minimum(x_hi[:, None, None], t_r)
        return x_begin, x_end

    def body(carry, chunk_data):
        best_z, best_i, base = carry
        s: TriangleRowSetup = chunk_data
        x_begin, x_end = x_range(s.left_eq, s.right_eq, s.x_lo, s.x_hi)  # (Tc, 2, H)
        row_ok = (yy[None, None, :] >= s.y_lo[:, :, None]) & (yy[None, None, :] <= s.y_hi[:, :, None])
        # coverage: (Tc, H, W) = any part covers the pixel
        cov = jnp.any(
            row_ok[:, :, :, None]
            & (xx[None, None, None, :] >= x_begin[:, :, :, None])
            & (xx[None, None, None, :] <= x_end[:, :, :, None]),
            axis=1,
        )
        zlin = s.z_coef[:, None, None, 0] * xx[None, None, :] + (
            s.z_coef[:, None, 1:2] * yy[None, :, None] + s.z_coef[:, None, 2:3]
        )
        z = 1.0 / zlin if perspective_correct else zlin
        z_eff = jnp.where(cov & s.valid[:, None, None] & jnp.isfinite(z), z, big)
        c_i = jnp.argmin(z_eff, axis=0)  # first (lowest local index) wins ties
        c_z = jnp.take_along_axis(z_eff, c_i[None], axis=0)[0]
        better = c_z < best_z
        best_z = jnp.where(better, c_z, best_z)
        best_i = jnp.where(better, base + c_i.astype(jnp.int32), best_i)
        return (best_z, best_i, base + chunk), None

    from deodr_tpu.ops.common import match_vma

    init = match_vma(
        (
            jnp.full((height, width), big),
            jnp.full((height, width), -1, jnp.int32),
            jnp.int32(0),
        ),
        setup,
    )
    (z_buffer, winner, _), _ = jax.lax.scan(body, init, setup)
    return winner, z_buffer


def interpolate_at_pixels(bary, corner_vals, corner_z, perspective_correct: bool):
    """Barycentric interpolation of per-corner values at pixels.

    bary: (..., 3); corner_vals: (..., 3, C) or (..., 3); corner_z: (..., 3).
    Perspective-correct mode interpolates value/z and rescales by the
    perspective depth (reference: C++/DifferentiableRenderer.h:761-786,
    :945-957).
    """
    squeeze = corner_vals.ndim == bary.ndim
    if squeeze:
        corner_vals = corner_vals[..., None]
    if perspective_correct:
        inv_z = 1.0 / corner_z
        big_z = 1.0 / jnp.sum(bary * inv_z, axis=-1)
        out = jnp.einsum("...k,...kc->...c", bary * inv_z, corner_vals, precision=jax.lax.Precision.HIGHEST) * big_z[..., None]
    else:
        out = jnp.einsum("...k,...kc->...c", bary, corner_vals, precision=jax.lax.Precision.HIGHEST)
    return out[..., 0] if squeeze else out


def shade_pixels(
    winner: jnp.ndarray,
    ij_off: jnp.ndarray,
    depths: jnp.ndarray,
    faces: jnp.ndarray,
    faces_uv: jnp.ndarray,
    colors: jnp.ndarray,
    uv: jnp.ndarray,
    shade: jnp.ndarray,
    textured: jnp.ndarray,
    shaded: jnp.ndarray,
    texture,
    background: jnp.ndarray,
    perspective_correct: bool = False,
) -> jnp.ndarray:
    """Differentiable shading of resolved pixels. ``winner`` must be
    treated as a constant (stop-gradded by the caller)."""
    height, width = winner.shape
    covered = winner >= 0
    tri = jnp.maximum(winner, 0)
    f = faces[tri]  # (H, W, 3)
    v_xy = ij_off[f]  # (H, W, 3, 2)
    v_z = depths[f]  # (H, W, 3)

    dtype = ij_off.dtype
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    p = jnp.stack(
        [
            jnp.broadcast_to(xs[None, :], (height, width)),
            jnp.broadcast_to(ys[:, None], (height, width)),
            jnp.ones((height, width), dtype),
        ],
        axis=-1,
    )  # (H, W, 3)

    # safe inverse: uncovered pixels gather triangle 0 (winner clamped to 0),
    # which may be degenerate — its singular inverse would NaN the backward
    xy1_to_bary, _ = safe_barycentric_matrices(v_xy)  # (H, W, 3, 3)
    bary = jnp.einsum("hwkj,hwj->hwk", xy1_to_bary, p, precision=jax.lax.Precision.HIGHEST)

    colors_px = interpolate_at_pixels(bary, colors[f], v_z, perspective_correct)  # (H, W, C)

    if texture is not None:
        fuv = faces_uv[tri]
        uv_px = interpolate_at_pixels(bary, uv[fuv], v_z, perspective_correct)  # (H, W, 2)
        lum = interpolate_at_pixels(bary, shade[f], v_z, perspective_correct)  # (H, W)
        tex_px = bilinear_sample(texture, uv_px) * lum[..., None]
        use_tex = (textured[tri] & shaded[tri])[..., None]
        pix = jnp.where(use_tex, tex_px, colors_px)
    else:
        pix = colors_px

    pix = jnp.where(jnp.isfinite(pix), pix, 0.0)
    return jnp.where(covered[..., None], pix, background)
