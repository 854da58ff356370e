"""Pallas TPU kernel for the discontinuity-edge-overdraw pass, textured
(Gouraud-shaded texture-mapped) attribute path.

The reference composites textured silhouette bands sequentially, with a
per-pixel bilinear texture fetch and adjoints into the texture, uv and
shade (reference: C++/DifferentiableRenderer.h:1781-2064, :2066-2368).
The sequential JAX equivalent (`edge_overdraw_pass[_windowed]`) runs one
XLA scan step per edge; this kernel instead runs the painter loop per
framebuffer tile entirely in VMEM, like the untextured kernel in
``edge_kernel.py``, with the texture access TPU-shaped:

* on the band, barycentrics satisfy b0 + b1 = 1, so the per-pixel uv lies
  ON the segment [uv0, uv1] — all bilinear taps of one edge fit a small
  static texture *window*. Windows are gathered per edge (differentiably)
  in XLA; the kernel receives a (E, C, wh, ww) window stack resident in
  VMEM and indexes it by edge id.
* the 4-tap bilinear fetch per pixel is evaluated as soft-one-hot MXU
  contractions in a pixel-major (window, P = tile_h·tile_w) layout:
  ``sample = Σ_{r,c} Y[r,p]·T[r,c]·X[c,p]`` with
  ``Y[r,p] = (1−ev)·1[iv=r] + ev·1[iv+1=r]`` (X likewise in u). TPU has no
  vector gather; the contraction form runs on the MXU and its transposes
  (the texture/uv adjoints) are the same matmuls reordered.
* the backward pass accumulates per-edge window gradients directly into a
  VMEM-resident (E, C, wh, ww) output across the (sequential) tile grid;
  XLA then chains them to the texture atlas through the window gather's
  autodiff transpose, and the uv/shade gradients through the
  differentiable coefficient folds.

Edge-table row layout = the untextured layout (see edge_kernel.py) plus:
  [uc (3) | vc (3) | lc (3) | toy | tox | eid | use_tex]
where uc/vc are the XLA-prefolded affine (x, y, 1) coefficients of the
texture coordinates (u indexes texture columns, v rows), lc those of the
Gouraud shade, (toy, tox) the texel origin of the edge's texture window
and eid the row index into the window stack.

Gradient-table row layout (width 12 + 3·C):
  [g_t (3) | g_a (3 per channel) | g_uc (3) | g_vc (3) | g_lc (3)]
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from deodr_tpu.ops.pallas import out_struct, pallas_call_vma
from jax.experimental.pallas import tpu as pltpu

from deodr_tpu.ops.pallas.edge_kernel import (
    _affine_plane,
    _attr_plane,
    _band_mask_and_t,
    _t_div,
    edge_row_width,
)


class PallasEdgeTexConfig(NamedTuple):
    tile_h: int
    tile_w: int
    n_ty: int
    n_tx: int
    cap: int  # per-tile edge-slot capacity
    nb_colors: int
    error_mode: bool
    tex_h: int  # full texture dims (for the reference's border clamps)
    tex_w: int
    win_h: int  # static texture-window shape
    win_w: int
    n_edges: int  # window-stack leading dim
    interpret: bool = False


def tex_row_width(nb_colors: int) -> int:
    return edge_row_width(nb_colors) + 13


def _e_uc(c: int) -> int:
    return edge_row_width(c)


def _e_vc(c: int) -> int:
    return edge_row_width(c) + 3


def _e_lc(c: int) -> int:
    return edge_row_width(c) + 6


def _e_toy(c: int) -> int:
    return edge_row_width(c) + 9


def _e_tox(c: int) -> int:
    return edge_row_width(c) + 10


def _e_eid(c: int) -> int:
    return edge_row_width(c) + 11


def _e_utex(c: int) -> int:
    return edge_row_width(c) + 12


def _grad_row_width_tex(nb_colors: int) -> int:
    return 12 + 3 * nb_colors


def _soft_onehots(cfg: PallasEdgeTexConfig, row, x_p, y_p, cols, rows_i, dtype):
    """Per-pixel bilinear taps/weights in pixel-major layout.

    Returns (X0, X1, eu, gate_u, Y0, Y1, ev, gate_v): X0/X1 are the
    (win_w, P) hard one-hots of the two u-taps, eu the (1, P) fractional
    weight (border-clamped exactly like ``bilinear_sample``; reference:
    C++/DifferentiableRenderer.h:521-560), gate_u the (1, P) indicator that
    d eu/du = 1 (zero where the reference clamps; reference:
    C++/DifferentiableRenderer.h:626-630).
    """
    texh, texw = cfg.tex_h, cfg.tex_w
    u = _affine_plane(row(_e_uc(cfg.nb_colors)), row(_e_uc(cfg.nb_colors) + 1), row(_e_uc(cfg.nb_colors) + 2), y_p, x_p)
    v = _affine_plane(row(_e_vc(cfg.nb_colors)), row(_e_vc(cfg.nb_colors) + 1), row(_e_vc(cfg.nb_colors) + 2), y_p, x_p)
    fu = jnp.floor(u)
    fv = jnp.floor(v)
    eu = jnp.where(fu < 0, 0.0, jnp.where(fu > texw - 2, 1.0, u - fu))
    ev = jnp.where(fv < 0, 0.0, jnp.where(fv > texh - 2, 1.0, v - fv))
    gate_u = ((fu >= 0) & (fu <= texw - 2)).astype(dtype)
    gate_v = ((fv >= 0) & (fv <= texh - 2)).astype(dtype)
    # window-local tap indices (float compares against iota rows)
    iuw = jnp.clip(jnp.clip(fu, 0, texw - 2) - row(_e_tox(cfg.nb_colors)), 0, cfg.win_w - 2)
    ivw = jnp.clip(jnp.clip(fv, 0, texh - 2) - row(_e_toy(cfg.nb_colors)), 0, cfg.win_h - 2)
    X0 = (cols == iuw).astype(dtype)
    X1 = (cols == iuw + 1.0).astype(dtype)
    Y0 = (rows_i == ivw).astype(dtype)
    Y1 = (rows_i == ivw + 1.0).astype(dtype)
    return X0, X1, eu, gate_u, Y0, Y1, ev, gate_v


def _dotT(a, b):
    """aᵀ @ b for a (k, m), b (k, n) → (m, n), exact fp32."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=a.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dotN(a, b):
    """a @ b contracting a's last with b's first, exact fp32."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=a.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _fwd_kernel(cfg: PallasEdgeTexConfig, count_ref, table_ref, wins_ref, zbuf_ref, obs_ref, buf_in_ref, buf_out_ref):
    th, tw, cap, c = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.nb_colors
    nch = 1 if cfg.error_mode else c
    dtype = buf_out_ref.dtype
    p_n = th * tw
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    yrow = (ty * th + jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)).astype(dtype)
    xx = (tx * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)).astype(dtype)
    zbuf = zbuf_ref[:, :]
    width_f = float(cfg.n_tx * tw)
    # pixel-major coordinate planes (loop-invariant)
    x_p = xx.reshape(1, p_n)
    y_p = jnp.broadcast_to(yrow, (th, tw)).reshape(1, p_n)
    cols = jax.lax.broadcasted_iota(jnp.int32, (cfg.win_w, p_n), 0).astype(dtype)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (cfg.win_h, p_n), 0).astype(dtype)

    tile_id = pl.program_id(0) * cfg.n_tx + pl.program_id(1)
    count = jnp.minimum(count_ref[0, tile_id], cap)

    def tex_planes_for(row):
        X0, X1, eu, _, Y0, Y1, ev, _ = _soft_onehots(cfg, row, x_p, y_p, cols, rows_i, dtype)
        X = X0 * (1.0 - eu) + X1 * eu
        Y = Y0 * (1.0 - ev) + Y1 * ev
        lum = _affine_plane(row(_e_lc(c)), row(_e_lc(c) + 1), row(_e_lc(c) + 2), yrow, xx)
        # window stack layout (C·wh, ww): repack to (wh, C·ww) with
        # static slices and contract ALL channels in ONE MXU issue —
        # the per-slot loop is matmul-latency bound, not MAC bound
        eid = jnp.clip(row(_e_eid(c)).astype(jnp.int32), 0, cfg.n_edges - 1)
        t2 = wins_ref[eid]
        t3 = jnp.concatenate([t2[ch * cfg.win_h : (ch + 1) * cfg.win_h] for ch in range(c)], axis=1)
        w3 = _dotT(t3, Y)  # (C·win_w, P)
        planes = []
        for ch in range(c):
            sval = jnp.sum(X * w3[ch * cfg.win_w : (ch + 1) * cfg.win_w], axis=0, keepdims=True)
            planes.append(sval.reshape(th, tw) * lum)
        return tuple(planes)

    def blend(bufs, mask, t, a):
        if cfg.error_mode:
            err = jnp.zeros((th, tw), dtype)
            for ch in range(c):
                diff = a[ch] - obs_ref[ch, :, :]
                err = err + diff * diff
            return (jnp.where(mask, err + t * (bufs[0] - err), bufs[0]),)
        return tuple(jnp.where(mask, a[ch] + t * (bufs[ch] - a[ch]), bufs[ch]) for ch in range(c))

    def one_slot(k, bufs, force_invalid):
        row = lambda j: table_ref[0, j, k]
        mask, t = _band_mask_and_t(cfg, row, yrow, xx, zbuf, width_f)
        mask = mask & jnp.logical_not(force_invalid)
        use_tex = row(_e_utex(c)) > 0.5

        def plain_planes():
            return tuple(_attr_plane(row, ch, c, yrow, xx) for ch in range(c))

        a = jax.lax.cond(use_tex, lambda: tex_planes_for(row), plain_planes)
        return blend(bufs, mask, t, a)

    # two slots per iteration: each slot's heavy work (band planes, one-hots
    # and the small window matmuls) is independent of the painter carry, and
    # a single slot's chain is matmul-LATENCY bound — pairing lets the VLIW
    # scheduler interleave two slots' chains, with only the two cheap blends
    # ordered. The all-textured pair (the common case on textured meshes) is
    # one straight-line block; mixed/plain pairs take the sequential path.
    def body2(j, bufs):
        k0 = 2 * j
        k1v = k0 + 1
        valid1 = k1v < count
        k1 = jnp.minimum(k1v, cap - 1)
        row0 = lambda jj: table_ref[0, jj, k0]
        row1 = lambda jj: table_ref[0, jj, k1]
        use_tex0 = row0(_e_utex(c)) > 0.5
        use_tex1 = row1(_e_utex(c)) > 0.5
        fused_ok = use_tex0 & (use_tex1 | jnp.logical_not(valid1))

        def fused(bufs):
            mask0, t0 = _band_mask_and_t(cfg, row0, yrow, xx, zbuf, width_f)
            mask1, t1 = _band_mask_and_t(cfg, row1, yrow, xx, zbuf, width_f)
            mask1 = mask1 & valid1
            a0 = tex_planes_for(row0)
            a1 = tex_planes_for(row1)
            bufs = blend(bufs, mask0, t0, a0)
            return blend(bufs, mask1, t1, a1)

        def seq(bufs):
            bufs = one_slot(k0, bufs, jnp.bool_(False))
            return one_slot(k1, bufs, jnp.logical_not(valid1))

        return jax.lax.cond(fused_ok, fused, seq, bufs)

    bufs = tuple(buf_in_ref[ch, :, :] for ch in range(nch))
    bufs = jax.lax.fori_loop(0, (count + 1) // 2, body2, bufs)
    for ch in range(nch):
        buf_out_ref[ch, :, :] = bufs[ch]


def _bwd_kernel(cfg: PallasEdgeTexConfig, count_ref, table_ref, wins_ref, zbuf_ref, obs_ref, buf_final_ref,
                gbuf_in_ref, gtable_ref, gbuf0_ref, gwins_ref, scratch_ref):
    th, tw, cap, c = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.nb_colors
    nch = 1 if cfg.error_mode else c
    dtype = gbuf0_ref.dtype
    p_n = th * tw
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    yrow = (ty * th + jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)).astype(dtype)
    xx = (tx * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)).astype(dtype)
    zbuf = zbuf_ref[:, :]
    width_f = float(cfg.n_tx * tw)
    x_p = xx.reshape(1, p_n)
    y_p = jnp.broadcast_to(yrow, (th, tw)).reshape(1, p_n)
    cols = jax.lax.broadcasted_iota(jnp.int32, (cfg.win_w, p_n), 0).astype(dtype)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (cfg.win_h, p_n), 0).astype(dtype)

    tile_id = pl.program_id(0) * cfg.n_tx + pl.program_id(1)
    count = jnp.minimum(count_ref[0, tile_id], cap)

    def put_partials(k, q, g):
        # quantity order [t | a_0..a_{C-1} | u | v | lum]; pair rows (2q, 2q+1)
        scratch_ref[k, 2 * q, :] = jnp.sum(g, axis=0)
        scratch_ref[k, 2 * q + 1, :] = jnp.sum(g * yrow, axis=0)

    # the per-edge window-gradient accumulator spans the whole (sequential)
    # tile grid: zero it once on the first tile
    @pl.when(tile_id == 0)
    def _():
        gwins_ref[...] = jnp.zeros_like(gwins_ref)

    def heavy_tex(row):
        """Carry-independent per-slot work: band planes, one-hots, window
        matmuls and the sample/attribute planes."""
        mask, t = _band_mask_and_t(cfg, row, yrow, xx, zbuf, width_f)
        rt = 1.0 / _t_div(t)
        X0, X1, eu, gate_u, Y0, Y1, ev, gate_v = _soft_onehots(cfg, row, x_p, y_p, cols, rows_i, dtype)
        X = X0 * (1.0 - eu) + X1 * eu
        Y = Y0 * (1.0 - ev) + Y1 * ev
        Xd = X1 - X0
        Yd = Y1 - Y0
        lum = _affine_plane(row(_e_lc(c)), row(_e_lc(c) + 1), row(_e_lc(c) + 2), yrow, xx)
        # batched-channel contractions (see forward)
        eid = jnp.clip(row(_e_eid(c)).astype(jnp.int32), 0, cfg.n_edges - 1)
        t2 = wins_ref[eid]  # (C·wh, ww)
        t3 = jnp.concatenate([t2[ch * cfg.win_h : (ch + 1) * cfg.win_h] for ch in range(c)], axis=1)
        w3 = _dotT(t3, Y)  # (C·ww, P)
        v3 = _dotN(t2, X)  # (C·wh, P)
        svals = []
        a = []
        for ch in range(c):
            sval = jnp.sum(X * w3[ch * cfg.win_w : (ch + 1) * cfg.win_w], axis=0, keepdims=True)
            svals.append(sval)
            a.append(sval.reshape(th, tw) * lum)
        return (mask, t, rt, X, Y, Xd, Yd, gate_u, gate_v, lum, eid, w3, v3, svals, a)

    def apply_tex(k, heavy, carry, valid):
        """Carry-dependent unblend + gradient chains for one slot whose
        heavy planes were precomputed. ``valid`` gates the carry update and
        the scratch write (an invalid slot leaves both untouched)."""
        bufs, gbufs = carry
        (mask, t, rt, X, Y, Xd, Yd, gate_u, gate_v, lum, eid, w3, v3, svals, a) = heavy
        mask = mask & valid
        one_minus_t = 1.0 - t

        g_t = jnp.zeros((th, tw), dtype)
        g_lum = jnp.zeros((th, tw), dtype)
        gu_p = jnp.zeros((1, p_n), dtype)
        gv_p = jnp.zeros((1, p_n), dtype)
        if cfg.error_mode:
            err = jnp.zeros((th, tw), dtype)
            diffs = []
            for ch in range(c):
                d = a[ch] - obs_ref[ch, :, :]
                diffs.append(d)
                err = err + d * d
            before0 = jnp.where(mask, (bufs[0] - err) * rt + err, bufs[0])
            g_out = gbufs[0]
            g_masked = jnp.where(mask, g_out, 0.0)
            g_t = g_masked * (before0 - err)
            g_err = g_masked * one_minus_t
            g_a = [g_err * 2.0 * diffs[ch] for ch in range(c)]
            new_bufs = (before0,)
            new_gbufs = (jnp.where(mask, t * g_out, g_out),)
        else:
            g_a = []
            new_bufs = []
            new_gbufs = []
            for ch in range(c):
                before = jnp.where(mask, (bufs[ch] - a[ch]) * rt + a[ch], bufs[ch])
                g_out = gbufs[ch]
                g_masked = jnp.where(mask, g_out, 0.0)
                g_t = g_t + g_masked * (before - a[ch])
                g_a.append(g_masked * one_minus_t)
                new_bufs.append(before)
                new_gbufs.append(jnp.where(mask, t * g_out, g_out))
            new_bufs = tuple(new_bufs)
            new_gbufs = tuple(new_gbufs)

        yg = []
        for ch in range(c):
            g_lum = g_lum + g_a[ch] * svals[ch].reshape(th, tw)
            gs_p = (g_a[ch] * lum).reshape(1, p_n)  # d/d sval
            yg.append(Y * gs_p)
            # uv gradients: dval/du = Σ_c dX·W, dval/dv = Σ_r dY·(T @ X)
            gu_p = gu_p + gs_p * jnp.sum(Xd * w3[ch * cfg.win_w : (ch + 1) * cfg.win_w], axis=0, keepdims=True)
            gv_p = gv_p + gs_p * jnp.sum(Yd * v3[ch * cfg.win_h : (ch + 1) * cfg.win_h], axis=0, keepdims=True)
        # texture-window gradient for all channels in one contraction:
        # (Y ∘ gs)·Xᵀ rows stacked channel-major, accumulated per edge
        # (an invalid slot's g_a is all-zero, so this adds zeros)
        gwins_ref[eid] += jax.lax.dot_general(
            jnp.concatenate(yg, axis=0), X, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

        gu = (gu_p * gate_u).reshape(th, tw)
        gv = (gv_p * gate_v).reshape(th, tw)

        # per-slot gradient rows (sublane partials; lanes reduced once
        # per tile after the loop, like the untextured kernel). The g_a
        # rows are NOT zeroed here: they hold stale values from other
        # slots/tiles, and the XLA wrapper masks each slot's gradient
        # columns by its use_texture flag.
        # TWO lane partials per quantity (sum g, sum g*y); the x-moment
        # is recovered after the loop (x constant along sublanes)
        @pl.when(valid)
        def _():
            put_partials(k, 0, g_t)
            put_partials(k, 1 + c, gu)
            put_partials(k, 2 + c, gv)
            put_partials(k, 3 + c, g_lum)

        return new_bufs, new_gbufs

    def plain_bwd_slot(k, row, mask, t, rt, carry):
        bufs, gbufs = carry
        one_minus_t = 1.0 - t
        g_t = jnp.zeros((th, tw), dtype)
        if cfg.error_mode:
            a = []
            err = jnp.zeros((th, tw), dtype)
            for ch in range(c):
                a_ch = _attr_plane(row, ch, c, yrow, xx)
                a.append(a_ch)
                diff = a_ch - obs_ref[ch, :, :]
                err = err + diff * diff
            before0 = jnp.where(mask, (bufs[0] - err) * rt + err, bufs[0])
            g_out = gbufs[0]
            g_masked = jnp.where(mask, g_out, 0.0)
            g_t = g_masked * (before0 - err)
            g_err = g_masked * one_minus_t
            for ch in range(c):
                g_a = g_err * 2.0 * (a[ch] - obs_ref[ch, :, :])
                put_partials(k, 1 + ch, g_a)
            new_bufs = (before0,)
            new_gbufs = (jnp.where(mask, t * g_out, g_out),)
        else:
            new_bufs = []
            new_gbufs = []
            for ch in range(c):
                a_ch = _attr_plane(row, ch, c, yrow, xx)
                before = jnp.where(mask, (bufs[ch] - a_ch) * rt + a_ch, bufs[ch])
                g_out = gbufs[ch]
                g_masked = jnp.where(mask, g_out, 0.0)
                g_t = g_t + g_masked * (before - a_ch)
                g_a = g_masked * one_minus_t
                put_partials(k, 1 + ch, g_a)
                new_bufs.append(before)
                new_gbufs.append(jnp.where(mask, t * g_out, g_out))
            new_bufs = tuple(new_bufs)
            new_gbufs = tuple(new_gbufs)
        # uv/lum rows left stale (masked by ~use_texture in the wrapper)
        put_partials(k, 0, g_t)
        return new_bufs, new_gbufs

    def one_slot_bwd(k, carry, valid):
        row = lambda j: table_ref[0, j, k]
        use_tex = row(_e_utex(c)) > 0.5

        def tex_branch(carry):
            return apply_tex(k, heavy_tex(row), carry, valid)

        def plain_branch(carry):
            mask, t = _band_mask_and_t(cfg, row, yrow, xx, zbuf, width_f)
            mask = mask & valid

            def do(carry):
                rt = 1.0 / _t_div(t)
                return plain_bwd_slot(k, row, mask, t, rt, carry)

            # an invalid slot must not touch the carry or scratch rows
            return jax.lax.cond(valid, do, lambda cr: cr, carry)

        return jax.lax.cond(use_tex, tex_branch, plain_branch, carry)

    # paired reverse loop: slot pair (k0, k0−1), processed k0 first (exact
    # reverse of the forward painter order); the heavy per-slot work is
    # carry-independent and interleaves across the pair (see forward)
    def body2(i, carry):
        k0 = count - 1 - 2 * i
        k1v = k0 - 1
        valid1 = k1v >= 0
        k1 = jnp.maximum(k1v, 0)
        row0 = lambda jj: table_ref[0, jj, k0]
        row1 = lambda jj: table_ref[0, jj, k1]
        use_tex0 = row0(_e_utex(c)) > 0.5
        use_tex1 = row1(_e_utex(c)) > 0.5
        fused_ok = use_tex0 & (use_tex1 | jnp.logical_not(valid1))

        def fused(carry):
            h0 = heavy_tex(row0)
            h1 = heavy_tex(row1)
            carry = apply_tex(k0, h0, carry, jnp.bool_(True))
            return apply_tex(k1, h1, carry, valid1)

        def seq(carry):
            carry = one_slot_bwd(k0, carry, jnp.bool_(True))
            return one_slot_bwd(k1, carry, valid1)

        return jax.lax.cond(fused_ok, fused, seq, carry)

    bufs = tuple(buf_final_ref[ch, :, :] for ch in range(nch))
    gbufs = tuple(gbuf_in_ref[ch, :, :] for ch in range(nch))
    bufs, gbufs = jax.lax.fori_loop(0, (count + 1) // 2, body2, (bufs, gbufs))
    for ch in range(nch):
        gbuf0_ref[ch, :, :] = gbufs[ch]
    # finish the deferred lane reductions: quantity q yields gradient-row
    # columns [sum g*x | sum g*y | sum g] from its two stored partials
    x_lane = (tx * tw + jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1)).astype(dtype)
    cols = []
    for q in range(4 + c):
        s1 = scratch_ref[:, 2 * q, :]
        s2 = scratch_ref[:, 2 * q + 1, :]
        cols.append(jnp.sum(s1 * x_lane, axis=-1, keepdims=True))
        cols.append(jnp.sum(s2, axis=-1, keepdims=True))
        cols.append(jnp.sum(s1, axis=-1, keepdims=True))
    gtable_ref[0, :, :] = jnp.concatenate(cols, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def edge_pass_pallas_tex(cfg: PallasEdgeTexConfig, table_tile, windows, buffer0, z_buffer, obs, counts):
    """table_tile (n_tiles, W, cap); windows (E, C·wh, ww) channel-major; buffer0
    (nch, H', W'); z_buffer (H', W'); obs (C, H', W'); counts (1, n_tiles)
    int32 → blended buffer (nch, H', W').

    Differentiable in table_tile, windows and buffer0."""
    return _tex_fwd_call(cfg, table_tile, windows, buffer0, z_buffer, obs, counts)


def _tex_fwd_call(cfg, table_tile, windows, buffer0, z_buffer, obs, counts):
    th, tw, cap, c = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.nb_colors
    nch = buffer0.shape[0]
    dtype = buffer0.dtype
    grid = (cfg.n_ty, cfg.n_tx)
    ew = tex_row_width(c)

    def tile_idx(i, j):
        return (i * cfg.n_tx + j, 0, 0)

    return pallas_call_vma(
        functools.partial(_fwd_kernel, cfg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, cfg.n_ty * cfg.n_tx), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ew, cap), tile_idx, memory_space=pltpu.SMEM),
            pl.BlockSpec((cfg.n_edges, c * cfg.win_h, cfg.win_w), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nch, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        out_shape=out_struct(buffer0.shape, dtype),
        # the window stack + its gradient accumulator are VMEM-resident for
        # the whole grid; the 16 MiB default scoped-vmem limit is far below
        # the chip's physical VMEM (128 MiB on v5e)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(counts, table_tile, windows, z_buffer, obs, buffer0)


def _tex_fwd(cfg, table_tile, windows, buffer0, z_buffer, obs, counts):
    out = _tex_fwd_call(cfg, table_tile, windows, buffer0, z_buffer, obs, counts)
    return out, (table_tile, windows, out, z_buffer, obs, counts)


def _tex_bwd(cfg, residuals, g_out):
    table_tile, windows, final, z_buffer, obs, counts = residuals
    th, tw, cap, c = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.nb_colors
    nch = final.shape[0]
    dtype = final.dtype
    grid = (cfg.n_ty, cfg.n_tx)
    ew = tex_row_width(c)
    gw = _grad_row_width_tex(c)

    def tile_idx(i, j):
        return (i * cfg.n_tx + j, 0, 0)

    g_table, g_buf0, g_windows = pallas_call_vma(
        functools.partial(_bwd_kernel, cfg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, cfg.n_ty * cfg.n_tx), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ew, cap), tile_idx, memory_space=pltpu.SMEM),
            pl.BlockSpec((cfg.n_edges, c * cfg.win_h, cfg.win_w), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cap, gw), tile_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_edges, c * cfg.win_h, cfg.win_w), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_struct((cfg.n_ty * cfg.n_tx, cap, gw), dtype),
            out_struct(final.shape, dtype),
            out_struct(windows.shape, dtype),
        ],
        scratch_shapes=[pltpu.VMEM((cap, 2 * (4 + c), tw), dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(counts, table_tile, windows, z_buffer, obs, final, g_out)

    ks = jnp.arange(cap, dtype=jnp.int32)
    row_valid = ks[None, :] < jnp.minimum(counts.reshape(-1, 1), cap)
    g_table = jnp.where(row_valid[:, :, None], g_table, 0.0)
    # the kernel branches write only their own gradient rows (skipping ~18
    # per-slot zero stores); mask the other branch's stale columns here
    utex = table_tile[:, _e_utex(c), :] > 0.5  # (n_tiles, cap)
    col = jnp.arange(gw)
    is_ga = (col >= 3) & (col < 3 + 3 * c)
    is_uv = col >= 3 + 3 * c
    keep = jnp.where(
        utex[:, :, None], ~is_ga[None, None, :], ~is_uv[None, None, :]
    )
    g_table = jnp.where(keep, g_table, 0.0)

    # expand to the full table width: b0/b1 rows, y bounds, z coefficients,
    # flags and window addressing are non-differentiable
    zeros = lambda w: jnp.zeros((g_table.shape[0], cap, w), dtype)
    g_table_full = jnp.concatenate(
        [
            zeros(16),  # transformed ineq rows + thetas
            g_table[:, :, 0:3],  # t coeffs
            zeros(2),  # y_begin, y_end
            g_table[:, :, 3 : 3 + 3 * c],  # a coeffs
            zeros(4),  # z coeffs, active
            g_table[:, :, 3 + 3 * c : 3 + 3 * c + 9],  # uc, vc, lc
            zeros(4),  # toy, tox, eid, use_tex
        ],
        axis=2,
    )
    return (
        jnp.swapaxes(g_table_full, 1, 2),
        g_windows,
        g_buf0,
        jnp.zeros_like(z_buffer),
        jnp.zeros_like(obs),
        None,
    )


edge_pass_pallas_tex.defvjp(_tex_fwd, _tex_bwd)
