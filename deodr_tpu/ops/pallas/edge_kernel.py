"""Pallas TPU kernel for the discontinuity-edge-overdraw pass
(untextured attribute path).

The XLA tiled edge pass scans edge slots with a full HBM round-trip of the
framebuffer tile per step; this kernel keeps the tile in registers/VMEM for
the whole painter's-algorithm loop:

    for each binned edge slot (back-to-front):
        T  = t·(x, y, 1)                (transparency ramp)
        A  = b0·attrs0 + b1·attrs1     (edge color)
        buffer ← mask ? T·buffer + (1−T)·A : buffer

with the band mask evaluated as four uniform plane-threshold tests that
encode the reference's sequential inequality refinement semantics
(reference: C++/DifferentiableRenderer.h:2620-2648 — see _band_mask_and_t)
and the z-test against the solid pass's z-buffer (strict <, no z write).

The backward kernel runs the loop in reverse, reconstructing the pre-blend
buffer by inverting the blend — buffer = (out − (1−T)·A)/T — exactly the
reference adjoint's trick (reference: C++/DifferentiableRenderer.h:1738),
and reduces the pixel cotangents into per-slot gradients of the stencil
coefficient rows (T row and per-channel attribute rows). XLA chains those
to vertex positions through the (differentiable) stencil matrix inverse.

Edge-table row layout (width = 25 + 3·C):
  [transformed band-clip inequality coeffs (4 x 3) | thresholds (4) |
   t coeffs (3) | y_begin | y_end |
   a coeffs (3 per channel: ax, ay, ac) | z coeffs (3) | active]

The per-channel edge color a_ch = b0·attrs0[ch] + b1·attrs1[ch] and the
depth z = b0·z0 + b1·z1 are affine in (x, y); their coefficients are folded
in XLA *before* the kernel (differentiably — gradients to endpoint
positions/attributes chain through the fold), so the kernel evaluates one
fma per plane and the b0/b1 rows are used only for the band-clip
inequalities (whose boundary is non-differentiable, as in the reference).

Gradient-table row layout (width = 3 + 3·C):
  [g_t (3) | g_a coeffs (3 per channel)]
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from deodr_tpu.ops.pallas import out_struct, pallas_call_vma
from jax.experimental.pallas import tpu as pltpu


class PallasEdgeConfig(NamedTuple):
    tile_h: int
    tile_w: int
    n_ty: int
    n_tx: int
    cap: int
    nb_colors: int
    error_mode: bool
    interpret: bool = False


def edge_row_width(nb_colors: int) -> int:
    return 25 + 3 * nb_colors


_E_I = 0  # 4 transformed band-clip inequality rows x 3 coeffs
_E_TH = 12  # 4 per-inequality comparison thresholds
_E_T = 16
_E_YBEG, _E_YEND = 19, 20
_E_A = 21  # 3 columns (ax, ay, ac) per channel


def _e_z(nb_colors: int) -> int:
    return 21 + 3 * nb_colors


def _e_act(nb_colors: int) -> int:
    return 24 + 3 * nb_colors


def _grad_row_width(nb_colors: int) -> int:
    return 3 + 3 * nb_colors


def _affine_plane(xc, yc, cc, yrow, xx):
    """Evaluate the affine map xc·x + yc·y + cc on the tile: the y-part is a
    (th, 1) column, only one fma runs on the full (th, tw) grid."""
    return xc * xx + (yc * yrow + cc)


def _band_mask_and_t(cfg, row, yrow, xx, zbuf, width_f):
    """Blend mask and transparency plane T for one edge row (``row`` is a
    scalar accessor: j -> SMEM scalar). The depth plane uses the
    XLA-prefolded z coefficients.

    The band clip evaluates the four inequalities as uniform threshold
    tests ``plane_i > θ_i`` of XLA-pretransformed rows (see
    ``_transform_ineq_rows`` in ops/tiled.py): the transform encodes the
    reference's rational x-range semantics — strict > for a > 0, ≥ 0 for
    a < 0 (θ = −min_normal), and the den == 0 row convention by sign
    flip — so the predicate is the SAME in exact arithmetic. In fp32 the
    two roundings (a·x + py here vs the floored num/a division in the
    reference emulation) can disagree only for pixels within ~2 ulp of an
    exact band boundary — the same boundary-pixel deviation class the
    textured edge kernel documents vs the sequential path. The rational
    refinement form this replaces measured ~50% of the kernel's device
    time: its (th, 1) column chains occupy full vregs (1 of 128 lanes
    used), so ~48 column ops and four divisions per slot cost like 48
    full-tile ops; the threshold form is ~4 fused planes and
    division-free. The XLA tiled/windowed paths keep the rational
    refinement (bit-parity with the compiled reference core).
    """
    c = cfg.nb_colors
    t = _affine_plane(row(_E_T), row(_E_T + 1), row(_E_T + 2), yrow, xx)

    cov = None
    for i in range(4):
        j = _E_I + 3 * i
        plane = row(j) * xx + (row(j + 1) * yrow + row(j + 2))
        ok = plane > row(_E_TH + i)
        cov = ok if cov is None else cov & ok
    row_ok = (yrow >= row(_E_YBEG)) & (yrow <= row(_E_YEND))
    cov &= row_ok

    zc = _e_z(c)
    active = row(_e_act(c)) > 0.5
    z = _affine_plane(row(zc), row(zc + 1), row(zc + 2), yrow, xx)
    mask = cov & (z < zbuf) & active & jnp.isfinite(t)
    t_safe = jnp.where(mask, t, 0.5)
    return mask, t_safe


def _attr_plane(row, ch, c, yrow, xx):
    """Channel value a_ch from its XLA-prefolded affine coefficients."""
    return _affine_plane(row(_E_A + 3 * ch), row(_E_A + 3 * ch + 1), row(_E_A + 3 * ch + 2), yrow, xx)


def _t_div(t):
    """Division-safe transparency: the exact rational x-range test can admit
    a pixel whose fp32 T evaluates to exactly 0, so floor |T| for the
    backward's unblend division (the reference divides in float64 where this
    is measure-zero; reference: C++/DifferentiableRenderer.h:1738)."""
    eps = 1e-6
    return jnp.where(jnp.abs(t) < eps, jnp.where(t < 0, -eps, eps), t)


def _fwd_kernel(cfg: PallasEdgeConfig, count_ref, table_ref, zbuf_ref, obs_ref, buf_in_ref, buf_out_ref):
    th, tw, cap, c = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.nb_colors
    nch = 1 if cfg.error_mode else c
    dtype = buf_out_ref.dtype
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    yrow = (ty * th + jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)).astype(dtype)
    xx = (tx * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)).astype(dtype)
    zbuf = zbuf_ref[:, :]
    width_f = float(cfg.n_tx * tw)

    tile_id = pl.program_id(0) * cfg.n_tx + pl.program_id(1)
    count = jnp.minimum(count_ref[0, tile_id], cap)

    def slot_planes(k, force_invalid):
        """Carry-independent per-slot work: band mask, ramp, blend planes."""
        row = lambda j: table_ref[0, j, k]
        mask, t = _band_mask_and_t(cfg, row, yrow, xx, zbuf, width_f)
        mask = mask & jnp.logical_not(force_invalid)
        if cfg.error_mode:
            err = jnp.zeros((th, tw), dtype)
            for ch in range(c):
                diff = _attr_plane(row, ch, c, yrow, xx) - obs_ref[ch, :, :]
                err = err + diff * diff
            return mask, t, (err,)
        return mask, t, tuple(_attr_plane(row, ch, c, yrow, xx) for ch in range(c))

    def blend(bufs, mask, t, a):
        # t·buf + (1−t)·a rewritten as a + t·(buf − a): 2 ops/px
        return tuple(
            jnp.where(mask, a[ch] + t * (bufs[ch] - a[ch]), bufs[ch]) for ch in range(nch)
        )

    # two slots per iteration: a single slot's chain is dependency-latency
    # bound; pairing interleaves two slots' carry-free plane work, with only
    # the two cheap painter blends ordered
    def body2(j, bufs):
        k0 = 2 * j
        k1v = k0 + 1
        valid1 = k1v < count
        k1 = jnp.minimum(k1v, cap - 1)
        mask0, t0, a0 = slot_planes(k0, jnp.bool_(False))
        mask1, t1, a1 = slot_planes(k1, jnp.logical_not(valid1))
        bufs = blend(bufs, mask0, t0, a0)
        return blend(bufs, mask1, t1, a1)

    bufs = tuple(buf_in_ref[ch, :, :] for ch in range(nch))
    bufs = jax.lax.fori_loop(0, (count + 1) // 2, body2, bufs)
    for ch in range(nch):
        buf_out_ref[ch, :, :] = bufs[ch]


def _bwd_kernel(cfg: PallasEdgeConfig, count_ref, table_ref, zbuf_ref, obs_ref, buf_final_ref, gbuf_in_ref,
                gtable_ref, gbuf0_ref, scratch_ref):
    th, tw, cap, c = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.nb_colors
    nch = 1 if cfg.error_mode else c
    dtype = gbuf0_ref.dtype
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    yrow = (ty * th + jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)).astype(dtype)
    xx = (tx * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)).astype(dtype)
    zbuf = zbuf_ref[:, :]
    width_f = float(cfg.n_tx * tw)
    gw = _grad_row_width(c)

    tile_id = pl.program_id(0) * cfg.n_tx + pl.program_id(1)
    count = jnp.minimum(count_ref[0, tile_id], cap)

    nq = 1 + c  # gradient quantities: t plus one attribute row per channel

    def heavy(k, force_invalid):
        """Carry-independent per-slot work: band mask, ramp, attr planes."""
        row = lambda j: table_ref[0, j, k]
        mask, t = _band_mask_and_t(cfg, row, yrow, xx, zbuf, width_f)
        mask = mask & jnp.logical_not(force_invalid)
        # one reciprocal per slot; unblend (buf − (1−t)a)/t ≡ (buf − a)·rt + a
        rt = 1.0 / _t_div(t)
        a = tuple(_attr_plane(row, ch, c, yrow, xx) for ch in range(c))
        return mask, t, rt, a

    def apply_slot(k, hv, carry, valid):
        """Carry-dependent unblend + gradient chains; ``valid`` gates the
        carry update (via the mask) and the scratch write."""
        bufs, gbufs = carry
        mask, t, rt, a = hv
        mask = mask & valid
        one_minus_t = 1.0 - t

        # Per-slot reductions store only TWO lane partials per quantity —
        # Σ_y g and Σ_y g·y — because the x-weighted moment is recoverable
        # after the loop as a lane-weighted reduction of Σ_y g (x is
        # constant along the sublane axis). The (expensive) cross-lane
        # reductions run once per tile after the loop.
        ga_parts = []
        if cfg.error_mode:
            err = jnp.zeros((th, tw), dtype)
            for ch in range(c):
                err = err + (a[ch] - obs_ref[ch, :, :]) ** 2
            before0 = jnp.where(mask, (bufs[0] - err) * rt + err, bufs[0])
            g_out = gbufs[0]
            g_masked = jnp.where(mask, g_out, 0.0)
            g_t = g_masked * (before0 - err)
            g_err = g_masked * one_minus_t
            for ch in range(c):
                g_a = g_err * 2.0 * (a[ch] - obs_ref[ch, :, :])
                ga_parts.append(jnp.sum(g_a, axis=0))
                ga_parts.append(jnp.sum(g_a * yrow, axis=0))
            new_bufs = (before0,)
            new_gbufs = (jnp.where(mask, t * g_out, g_out),)
        else:
            g_t = jnp.zeros((th, tw), dtype)
            new_bufs = []
            new_gbufs = []
            for ch in range(c):
                before = jnp.where(mask, (bufs[ch] - a[ch]) * rt + a[ch], bufs[ch])
                g_out = gbufs[ch]
                g_masked = jnp.where(mask, g_out, 0.0)
                g_t = g_t + g_masked * (before - a[ch])
                g_a = g_masked * one_minus_t
                ga_parts.append(jnp.sum(g_a, axis=0))
                ga_parts.append(jnp.sum(g_a * yrow, axis=0))
                new_bufs.append(before)
                new_gbufs.append(jnp.where(mask, t * g_out, g_out))
            new_bufs = tuple(new_bufs)
            new_gbufs = tuple(new_gbufs)

        parts = [jnp.sum(g_t, axis=0), jnp.sum(g_t * yrow, axis=0)] + ga_parts

        @pl.when(valid)
        def _():
            scratch_ref[pl.ds(k, 1), :, :] = jnp.stack(parts)[None]  # (1, 2·nq, tw)

        return new_bufs, new_gbufs

    # paired reverse loop (see the forward kernel): slot pair (k0, k0−1),
    # processed k0 first — the exact reverse of the forward painter order
    def body2(i, carry):
        k0 = count - 1 - 2 * i
        k1v = k0 - 1
        valid1 = k1v >= 0
        k1 = jnp.maximum(k1v, 0)
        h0 = heavy(k0, jnp.bool_(False))
        h1 = heavy(k1, jnp.logical_not(valid1))
        carry = apply_slot(k0, h0, carry, jnp.bool_(True))
        return apply_slot(k1, h1, carry, valid1)

    bufs = tuple(buf_final_ref[ch, :, :] for ch in range(nch))
    gbufs = tuple(gbuf_in_ref[ch, :, :] for ch in range(nch))
    bufs, gbufs = jax.lax.fori_loop(0, (count + 1) // 2, body2, (bufs, gbufs))
    for ch in range(nch):
        gbuf0_ref[ch, :, :] = gbufs[ch]
    # finish the deferred lane reductions for all slots at once: quantity q
    # yields gradient-row columns [Σ g·x | Σ g·y | Σ g] from its two stored
    # partials (Σ g·x = Σ_lanes x · Σ_y g). Rows past count hold stale
    # scratch and are masked by the XLA wrapper.
    x_lane = (tx * tw + jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1)).astype(dtype)
    cols = []
    for q in range(nq):
        s1 = scratch_ref[:, 2 * q, :]  # (cap, tw): Σ_y g
        s2 = scratch_ref[:, 2 * q + 1, :]  # Σ_y g·y
        cols.append(jnp.sum(s1 * x_lane, axis=-1, keepdims=True))
        cols.append(jnp.sum(s2, axis=-1, keepdims=True))
        cols.append(jnp.sum(s1, axis=-1, keepdims=True))
    gtable_ref[0, :, :] = jnp.concatenate(cols, axis=-1)  # (cap, 3·nq)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def edge_pass_pallas(cfg: PallasEdgeConfig, table_tile, buffer0, z_buffer, obs, counts):
    """table_tile (n_tiles, W, cap); buffer0 (nch, H', W'); z_buffer
    (H', W'); obs (C, H', W') (error mode); counts (1, n_tiles) int32 →
    blended buffer (nch, H', W').

    Differentiable in table_tile and buffer0 (z_buffer/obs constant)."""
    return _edge_fwd_call(cfg, table_tile, buffer0, z_buffer, obs, counts)


def _edge_fwd_call(cfg, table_tile, buffer0, z_buffer, obs, counts):
    th, tw, cap, c = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.nb_colors
    nch = buffer0.shape[0]
    dtype = buffer0.dtype
    grid = (cfg.n_ty, cfg.n_tx)
    ew = edge_row_width(c)

    def tile_idx(i, j):
        return (i * cfg.n_tx + j, 0, 0)

    return pallas_call_vma(
        functools.partial(_fwd_kernel, cfg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, cfg.n_ty * cfg.n_tx), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            # (ew, cap): narrow axis as rows — Mosaic pads SMEM rows to ~1 KiB
            pl.BlockSpec((1, ew, cap), tile_idx, memory_space=pltpu.SMEM),
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nch, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        out_shape=out_struct(buffer0.shape, dtype),
        interpret=cfg.interpret,
    )(counts, table_tile, z_buffer, obs, buffer0)


def _edge_fwd(cfg, table_tile, buffer0, z_buffer, obs, counts):
    out = _edge_fwd_call(cfg, table_tile, buffer0, z_buffer, obs, counts)
    return out, (table_tile, out, z_buffer, obs, counts)


def _edge_bwd(cfg, residuals, g_out):
    table_tile, final, z_buffer, obs, counts = residuals
    th, tw, cap, c = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.nb_colors
    nch = final.shape[0]
    dtype = final.dtype
    grid = (cfg.n_ty, cfg.n_tx)
    ew = edge_row_width(c)
    gw = _grad_row_width(c)

    def tile_idx(i, j):
        return (i * cfg.n_tx + j, 0, 0)

    g_table, g_buf0 = pallas_call_vma(
        functools.partial(_bwd_kernel, cfg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, cfg.n_ty * cfg.n_tx), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ew, cap), tile_idx, memory_space=pltpu.SMEM),
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cap, gw), tile_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_struct((cfg.n_ty * cfg.n_tx, cap, gw), dtype),
            out_struct(final.shape, dtype),
        ],
        scratch_shapes=[pltpu.VMEM((cap, 2 * (1 + c), tw), dtype)],
        interpret=cfg.interpret,
    )(counts, table_tile, z_buffer, obs, final, g_out)

    # rows past each tile's count are uninitialized
    ks = jnp.arange(cap, dtype=jnp.int32)
    row_valid = ks[None, :] < jnp.minimum(counts.reshape(-1, 1), cap)
    g_table = jnp.where(row_valid[:, :, None], g_table, 0.0)

    # expand gradient rows to the full table width: b0/b1 rows (band clip),
    # y bounds, z coefficients and the active flag are non-differentiable
    g_table_full = jnp.concatenate(
        [
            jnp.zeros((g_table.shape[0], cap, 16), dtype),  # ineq rows + thetas
            g_table[:, :, 0:3],  # t coeffs
            jnp.zeros((g_table.shape[0], cap, 2), dtype),  # y_begin, y_end
            g_table[:, :, 3 : 3 + 3 * c],  # a coeffs
            jnp.zeros((g_table.shape[0], cap, 4), dtype),  # z coeffs, active
        ],
        axis=2,
    )
    # cotangent layout must match the (n_tiles, ew, cap) input
    return jnp.swapaxes(g_table_full, 1, 2), g_buf0, jnp.zeros_like(z_buffer), jnp.zeros_like(obs), None


edge_pass_pallas.defvjp(_edge_fwd, _edge_bwd)
