"""Pallas TPU kernel for the tiled solid rasterization pass.

One fused kernel per framebuffer tile: iterate the tile's binned triangle
slots, evaluate the exact scanline coverage predicate and the affine depth,
keep the per-pixel minimum (ties → lowest slot = lowest triangle index,
matching the reference's back-to-front strict-< z-test), and *accumulate the
winning slot's affine attribute values* A(x, y) in the same loop — the
equivalent of the reference's ``xy1_to_A`` evaluation (reference:
C++/DifferentiableRenderer.h:807-830). Everything stays in VMEM/registers;
the XLA version of this loop materializes (K, th, tw) intermediates in HBM
each step.

The kernel is wrapped in a custom VJP whose backward is a second kernel:
for each slot, the pixel cotangents are masked by slot ownership and
reduced against (x, y, 1) to give per-slot affine-map gradients, which XLA
then scatter-adds per triangle and chains to vertex positions / colors /
uv / shade via the (differentiable) affine-map construction.

Layouts (Mosaic-friendly: framebuffer arrays keep (…, th, tw) as the last
two dims; the attribute axis is leading/planar):

- setup_tile   (n_tiles, 22, cap)   stop-grad per-slot scalars
- affine_tile  (n_tiles, 3D, cap + 1) grouped [x-coeffs D | y-coeffs D | const D]
- slot_map     (H', W') int32 (cap = miss)
- z            (H', W')
- vals         (D, H', W')

SMEM tables are stored column-per-slot (the *narrow* axis is the row axis):
Mosaic pads every SMEM window row to ~1 KiB, so a (cap, 22) layout costs
cap KiB — at capacity 1024 that alone exceeds the ~1 MiB SMEM budget — while
(22, cap) costs 22 rows regardless of capacity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from deodr_tpu.ops.pallas import out_struct, pallas_call_vma
from jax.experimental.pallas import tpu as pltpu


class PallasRasterConfig(NamedTuple):
    tile_h: int
    tile_w: int
    n_ty: int
    n_tx: int
    cap: int
    n_attr: int
    strict_edge: bool
    perspective_correct: bool
    interpret: bool = False


_S_YLO0, _S_YLO1, _S_YHI0, _S_YHI1 = 0, 1, 2, 3
_S_LEQ = 4
_S_REQ = 10
_S_XLO, _S_XHI = 16, 17
_S_Z = 18
_S_VALID = 21
SETUP_WIDTH = 22


def _floor_div_k(num, den, lo, hi):
    q = jnp.floor(num / jnp.where(den == 0, 1.0, den))
    q = jnp.clip(q, lo, hi)
    q0 = jnp.where(num <= 0, hi, lo)
    return jnp.where(den == 0, q0, q)


def _ceil_div_k(num, den, lo, hi):
    q = jnp.ceil(num / jnp.where(den == 0, 1.0, den))
    q = jnp.clip(q, lo, hi)
    q0 = jnp.where(num < 0, hi, lo)
    return jnp.where(den == 0, q0, q)


def _pixel_coords(cfg, dtype):
    th, tw = cfg.tile_h, cfg.tile_w
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    yrow = (ty * th + jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)).astype(dtype)
    xx = (tx * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)).astype(dtype)
    return yrow, xx


def _coverage_and_z(cfg, row, yrow, xx):
    """Exact coverage predicate + affine depth for one setup row (``row`` is
    a scalar accessor: j -> SMEM scalar).

    strict_edge (the default): the left/right edge equations arrive SIGN-
    NORMALIZED from ``_pack_setup_rows`` so coverage is two uniform plane-
    threshold tests per sub-triangle — left ``plane > 0`` (strict), right
    ``plane > −min_normal`` (i.e. ≥ 0 exactly for normal floats) — which
    encode the reference's rational x-range semantics (reference:
    C++/DifferentiableRenderer.h:864-906) at the predicate level. The
    rational emulation this replaces ran ~4 divisions and ~30 (th, 1)
    column ops per slot, each occupying full vregs (1 of 128 lanes used);
    fp rounding of the two forms can disagree only for pixels within ~2 ulp
    of an exact edge (the boundary-pixel deviation class the edge kernels
    document). The non-strict path keeps the rational emulation: its
    den == 0 ceil convention is not expressible as one sign-normalized
    threshold."""
    valid = row(_S_VALID) > 0.5
    x_lo = row(_S_XLO)
    x_hi = row(_S_XHI)
    cov = jnp.zeros(xx.shape, jnp.bool_)
    theta_r = -float(jnp.finfo(yrow.dtype).tiny)
    for p in range(2):
        la, lb, lc = row(_S_LEQ + 3 * p), row(_S_LEQ + 3 * p + 1), row(_S_LEQ + 3 * p + 2)
        ra, rb, rc = row(_S_REQ + 3 * p), row(_S_REQ + 3 * p + 1), row(_S_REQ + 3 * p + 2)
        row_ok = (yrow >= row(_S_YLO0 + p)) & (yrow <= row(_S_YHI0 + p))
        if cfg.strict_edge:
            plane_l = la * xx + (lb * yrow + lc)
            plane_r = ra * xx + (rb * yrow + rc)
            cov = cov | (row_ok & (plane_l > 0.0) & (plane_r > theta_r))
        else:
            num_l = -(lb * yrow + lc)
            num_r = -(rb * yrow + rc)
            t_l = _ceil_div_k(num_l, la, x_lo - 1, x_hi)
            t_r = _floor_div_k(num_r, ra, x_lo - 1, x_hi)
            x_begin = jnp.maximum(x_lo, t_l)  # (th, 1)
            x_end = jnp.minimum(x_hi, t_r)
            cov = cov | (row_ok & (xx >= x_begin) & (xx <= x_end))
    if cfg.strict_edge:
        cov = cov & (xx >= x_lo) & (xx <= x_hi)
    z_y = row(_S_Z + 1) * yrow + row(_S_Z + 2)  # (th, 1)
    zlin = row(_S_Z) * xx + z_y
    z = 1.0 / zlin if cfg.perspective_correct else zlin
    return cov & valid & jnp.isfinite(z), z


def _fwd_kernel(cfg: PallasRasterConfig, count_ref, setup_ref, affine_ref, slot_ref, z_ref, vals_ref):
    th, tw, cap, d = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.n_attr
    dtype = z_ref.dtype
    yrow, xx = _pixel_coords(cfg, dtype)
    big = jnp.asarray(jnp.inf, dtype)
    tile_id = pl.program_id(0) * cfg.n_tx + pl.program_id(1)
    count = jnp.minimum(count_ref[0, tile_id], cap)

    def slot_planes(k, force_invalid):
        """Carry-independent per-slot work: coverage, depth, attr planes."""
        row = lambda j: setup_ref[0, j, k]
        cov, z = _coverage_and_z(cfg, row, yrow, xx)
        cov = cov & jnp.logical_not(force_invalid)
        vk = []
        for j in range(d):
            v_y = affine_ref[0, d + j, k] * yrow + affine_ref[0, 2 * d + j, k]  # (th, 1)
            vk.append(affine_ref[0, j, k] * xx + v_y)
        return cov, z, vk

    def winner_update(carry, k, cov, z, vk):
        best_z, best_slot, vals = carry
        z_eff = jnp.where(cov, z, big)
        better = z_eff < best_z
        best_z = jnp.where(better, z_eff, best_z)
        best_slot = jnp.where(better, k, best_slot)
        new_vals = tuple(jnp.where(better, vk[j], vals[j]) for j in range(d))
        return best_z, best_slot, new_vals

    # two slots per iteration: the heavy per-slot planes are carry-free and
    # interleave on the VLIW scheduler (the single-slot chain is dependency-
    # latency bound); the two winner updates stay ordered, preserving the
    # strict-< tie semantics (lowest slot wins) exactly
    def body2(jj, carry):
        k0 = 2 * jj
        k1v = k0 + 1
        valid1 = k1v < count
        k1 = jnp.minimum(k1v, cap - 1)
        cov0, z0, vk0 = slot_planes(k0, jnp.bool_(False))
        cov1, z1, vk1 = slot_planes(k1, jnp.logical_not(valid1))
        carry = winner_update(carry, k0, cov0, z0, vk0)
        return winner_update(carry, k1, cov1, z1, vk1)

    init = (
        jnp.full((th, tw), big),
        jnp.full((th, tw), cap, jnp.int32),
        tuple(jnp.zeros((th, tw), dtype) for _ in range(d)),
    )
    # dynamic trip count: compute scales with the tile's actual occupancy,
    # not the worst-case capacity
    best_z, best_slot, vals = jax.lax.fori_loop(0, (count + 1) // 2, body2, init)
    slot_ref[:, :] = best_slot
    z_ref[:, :] = best_z
    for j in range(d):
        vals_ref[j, :, :] = vals[j]


def _bwd_kernel(cfg: PallasRasterConfig, count_ref, slot_ref, gvals_ref, gtable_ref, scratch_ref):
    th, tw, cap, d = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.n_attr
    dtype = gvals_ref.dtype
    yrow, xx = _pixel_coords(cfg, dtype)
    best_slot = slot_ref[:, :]
    tile_id = pl.program_id(0) * cfg.n_tx + pl.program_id(1)
    count = jnp.minimum(count_ref[0, tile_id], cap)

    # the y-weighted cotangents are slot-independent: hoist them out of the
    # slot loop. No x-weighted hoists: Σ_y g·x = x · Σ_y g (x is constant
    # along sublanes), recovered from the plain partial after the loop.
    gy = tuple(gvals_ref[j, :, :] * yrow for j in range(d))

    def put_slot(k, mask):
        # TWO sublane partials per attribute — Σ_y g and Σ_y g·y; cross-lane
        # reductions and the x moment happen once per tile after the loop
        for j in range(d):
            scratch_ref[k, j, :] = jnp.sum(gvals_ref[j, :, :] * mask, axis=0)
            scratch_ref[k, d + j, :] = jnp.sum(gy[j] * mask, axis=0)

    # carry-free loop: pair slots for ILP (see forward); the odd tail slot's
    # write is guarded so it cannot clobber a real row
    def body2(jj, _):
        k0 = 2 * jj
        k1v = k0 + 1
        valid1 = k1v < count
        k1 = jnp.minimum(k1v, cap - 1)
        mask0 = (best_slot == k0).astype(dtype)
        mask1 = (best_slot == k1).astype(dtype)
        put_slot(k0, mask0)

        @pl.when(valid1)
        def _():
            put_slot(k1, mask1)

        return 0

    # rows >= count stay uninitialized; the XLA wrapper masks them out
    jax.lax.fori_loop(0, (count + 1) // 2, body2, 0)
    x_lane = (pl.program_id(1) * tw + jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1)).astype(dtype)
    cols = []
    for j in range(d):
        s1 = scratch_ref[:, j, :]  # (cap, tw): Σ_y g
        s2 = scratch_ref[:, d + j, :]  # Σ_y g·y
        cols.append(jnp.sum(s1 * x_lane, axis=-1, keepdims=True))
    for j in range(d):
        cols.append(jnp.sum(scratch_ref[:, d + j, :], axis=-1, keepdims=True))
    for j in range(d):
        cols.append(jnp.sum(scratch_ref[:, j, :], axis=-1, keepdims=True))
    gtable_ref[0, :, :] = jnp.concatenate(cols, axis=-1)  # (cap, 3d): [gx | gy | gc]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def raster_eval_pallas(cfg: PallasRasterConfig, affine_tile, setup_tile, counts):
    """(affine_tile (n_tiles, 3D, cap+1), setup_tile (n_tiles, S, cap),
    counts (1, n_tiles) int32) → (slot_map (H', W'), z (H', W'),
    vals (D, H', W'))."""
    return _raster_fwd_call(cfg, affine_tile, setup_tile, counts)


def _raster_fwd_call(cfg, affine_tile, setup_tile, counts):
    th, tw, cap, d = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.n_attr
    dtype = affine_tile.dtype
    grid = (cfg.n_ty, cfg.n_tx)

    def tile_idx(i, j):
        return (i * cfg.n_tx + j, 0, 0)

    slot_map, z, vals = pallas_call_vma(
        functools.partial(_fwd_kernel, cfg),
        grid=grid,
        in_specs=[
            # whole counts vector in SMEM (Mosaic requires sub-array blocks to
            # be 8x128-aligned even in SMEM; the full array is exempt)
            pl.BlockSpec((1, cfg.n_ty * cfg.n_tx), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            # per-slot scalar tables live in SMEM: the winner loop reads them
            # scalar-by-scalar on the scalar core, which is slow from VMEM
            pl.BlockSpec((1, SETUP_WIDTH, cap), tile_idx, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3 * d, cap + 1), tile_idx, memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_struct((cfg.n_ty * th, cfg.n_tx * tw), jnp.int32),
            out_struct((cfg.n_ty * th, cfg.n_tx * tw), dtype),
            out_struct((d, cfg.n_ty * th, cfg.n_tx * tw), dtype),
        ],
        interpret=cfg.interpret,
    )(counts, setup_tile, affine_tile)
    return slot_map, z, vals


def _raster_fwd(cfg, affine_tile, setup_tile, counts):
    out = _raster_fwd_call(cfg, affine_tile, setup_tile, counts)
    slot_map, _, _ = out
    return out, (slot_map, counts)


def _raster_bwd(cfg, residuals, cotangents):
    slot_map, counts = residuals
    _, _, g_vals = cotangents
    th, tw, cap, d = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.n_attr
    dtype = g_vals.dtype
    grid = (cfg.n_ty, cfg.n_tx)

    g_table = pallas_call_vma(
        functools.partial(_bwd_kernel, cfg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, cfg.n_ty * cfg.n_tx), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, cap + 1, 3 * d), lambda i, j: (i * cfg.n_tx + j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=out_struct((cfg.n_ty * cfg.n_tx, cap + 1, 3 * d), dtype),
        scratch_shapes=[pltpu.VMEM((cap + 1, 2 * d, tw), dtype)],
        interpret=cfg.interpret,
    )(counts, slot_map, g_vals)
    # rows past each tile's count (incl. the miss row) are uninitialized
    ks = jnp.arange(cap + 1, dtype=jnp.int32)
    row_valid = ks[None, :] < jnp.minimum(counts.reshape(-1, 1), cap)
    g_table = jnp.where(row_valid[:, :, None], g_table, 0.0)
    # cotangent layout must match the (n_tiles, 3D, cap+1) input
    return jnp.swapaxes(g_table, 1, 2), None, None


raster_eval_pallas.defvjp(_raster_fwd, _raster_bwd)
