"""Pallas TPU kernel for the tiled solid rasterization pass.

One fused kernel per framebuffer tile:

1. **winner loop** (VPU): iterate the tile's binned triangle slots, evaluate
   the exact scanline coverage predicate and the affine depth, and keep the
   per-pixel minimum (ties → lowest slot = lowest triangle index, matching
   the reference's back-to-front strict-< z-test). Everything stays in VMEM;
   the XLA version of this loop materializes (K, th, tw) intermediates in
   HBM each step.
2. **shading gather** (MXU): a one-hot (pixels × slots) matrix multiplied
   with the tile's affine attribute table evaluates every pixel's winning
   attribute maps A(x, y) in a single matmul.

The kernel is wrapped in a custom VJP whose backward is a second kernel:
the pixel cotangents are contracted against the same one-hot matrix
(transposed matmul on the MXU) to give per-slot affine-map gradients, which
XLA then scatter-adds per triangle and chains to vertex positions / colors /
uv / shade via the (differentiable) affine-map construction.

Attribute-table layout per triangle row (D attributes): the 3 affine
coefficients are stored grouped — [x-coeffs (D), y-coeffs (D), const (D)] —
so the kernel can evaluate A = Cx·x + Cy·y + Cc with contiguous slices.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class PallasRasterConfig(NamedTuple):
    tile_h: int
    tile_w: int
    n_ty: int
    n_tx: int
    cap: int  # triangle slots per tile
    n_attr: int  # D
    strict_edge: bool
    perspective_correct: bool
    interpret: bool = False


# setup row layout (stop-grad scalars per binned slot)
_S_YLO0, _S_YLO1, _S_YHI0, _S_YHI1 = 0, 1, 2, 3
_S_LEQ = 4  # left eq part0: a,b,c ; part1: a,b,c  -> 4..9
_S_REQ = 10  # right eq part0/part1 -> 10..15
_S_XLO, _S_XHI = 16, 17
_S_Z = 18  # z coeffs -> 18..20
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


def _fwd_kernel(cfg: PallasRasterConfig, setup_ref, affine_ref, slot_ref, z_ref, vals_ref):
    th, tw, cap, d = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.n_attr
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    dtype = z_ref.dtype
    yy = (ty * th + jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)[:, 0]).astype(dtype)  # (th,)
    xx = (tx * tw + jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1)[0, :]).astype(dtype)  # (tw,)
    big = jnp.asarray(jnp.inf, dtype)

    def body(k, carry):
        best_z, best_slot = carry
        row = setup_ref[0, k, :]
        valid = row[_S_VALID] > 0.5
        x_lo = row[_S_XLO]
        x_hi = row[_S_XHI]
        cov = jnp.zeros((th, tw), jnp.bool_)
        for p in range(2):
            la, lb, lc = row[_S_LEQ + 3 * p], row[_S_LEQ + 3 * p + 1], row[_S_LEQ + 3 * p + 2]
            ra, rb, rc = row[_S_REQ + 3 * p], row[_S_REQ + 3 * p + 1], row[_S_REQ + 3 * p + 2]
            num_l = -(lb * yy + lc)
            num_r = -(rb * yy + rc)
            if cfg.strict_edge:
                t_l = 1 + _floor_div_k(num_l, la, x_lo - 1, x_hi)
            else:
                t_l = _ceil_div_k(num_l, la, x_lo - 1, x_hi)
            t_r = _floor_div_k(num_r, ra, x_lo - 1, x_hi)
            x_begin = jnp.maximum(x_lo, t_l)
            x_end = jnp.minimum(x_hi, t_r)
            row_ok = (yy >= row[_S_YLO0 + p]) & (yy <= row[_S_YHI0 + p])
            cov_p = row_ok[:, None] & (xx[None, :] >= x_begin[:, None]) & (xx[None, :] <= x_end[:, None])
            cov = cov | cov_p
        zlin = row[_S_Z] * xx[None, :] + (row[_S_Z + 1] * yy[:, None] + row[_S_Z + 2])
        z = 1.0 / zlin if cfg.perspective_correct else zlin
        z_eff = jnp.where(cov & valid & jnp.isfinite(z), z, big)
        better = z_eff < best_z
        best_z = jnp.where(better, z_eff, best_z)
        best_slot = jnp.where(better, k, best_slot)
        return best_z, best_slot

    init = (jnp.full((th, tw), big), jnp.full((th, tw), cap, jnp.int32))
    best_z, best_slot = jax.lax.fori_loop(0, cap, body, init)

    slot_ref[:, :] = best_slot
    z_ref[:, :] = best_z

    # MXU shading: one-hot gather of the affine rows, then evaluate at pixels
    onehot = (best_slot.reshape(th * tw, 1) == jax.lax.broadcasted_iota(jnp.int32, (1, cap + 1), 1)).astype(dtype)
    table = affine_ref[0]  # (cap + 1, 3 * d)
    px = jnp.dot(onehot, table, preferred_element_type=dtype)  # (P, 3d)
    x_flat = jnp.broadcast_to(xx[None, :], (th, tw)).reshape(th * tw, 1)
    y_flat = jnp.broadcast_to(yy[:, None], (th, tw)).reshape(th * tw, 1)
    vals = px[:, :d] * x_flat + px[:, d : 2 * d] * y_flat + px[:, 2 * d :]
    vals_ref[:, :, :] = vals.reshape(th, tw, d)


def _bwd_kernel(cfg: PallasRasterConfig, slot_ref, gvals_ref, gtable_ref):
    th, tw, cap, d = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.n_attr
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    dtype = gvals_ref.dtype
    yy = (ty * th + jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)[:, 0]).astype(dtype)
    xx = (tx * tw + jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1)[0, :]).astype(dtype)
    x_flat = jnp.broadcast_to(xx[None, :], (th, tw)).reshape(th * tw, 1)
    y_flat = jnp.broadcast_to(yy[:, None], (th, tw)).reshape(th * tw, 1)
    g = gvals_ref[:, :, :].reshape(th * tw, d)
    g3 = jnp.concatenate([g * x_flat, g * y_flat, g], axis=1)  # (P, 3d)
    best_slot = slot_ref[:, :]
    onehot = (best_slot.reshape(th * tw, 1) == jax.lax.broadcasted_iota(jnp.int32, (1, cap + 1), 1)).astype(dtype)
    gtable_ref[0] = jnp.dot(onehot.T, g3, preferred_element_type=dtype)  # (cap + 1, 3d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def raster_eval_pallas(cfg: PallasRasterConfig, affine_tile, setup_tile):
    """(affine_tile (n_tiles, cap+1, 3D), setup_tile (n_tiles, cap, S)) →
    (slot_map, z, vals) each tiled (n_tiles, th, tw[, D])."""
    return _raster_fwd_call(cfg, affine_tile, setup_tile)


def _raster_fwd_call(cfg, affine_tile, setup_tile):
    th, tw, cap, d = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.n_attr
    n_tiles = cfg.n_ty * cfg.n_tx
    dtype = affine_tile.dtype
    grid = (cfg.n_ty, cfg.n_tx)

    def tile_idx(i, j):
        return (i * cfg.n_tx + j, 0, 0)

    slot_map, z, vals = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, cap, SETUP_WIDTH), tile_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap + 1, 3 * d), tile_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cfg.n_ty * th, cfg.n_tx * tw), jnp.int32),
            jax.ShapeDtypeStruct((cfg.n_ty * th, cfg.n_tx * tw), dtype),
            jax.ShapeDtypeStruct((cfg.n_ty * th, cfg.n_tx * tw, d), dtype),
        ],
        interpret=cfg.interpret,
    )(setup_tile, affine_tile)
    return slot_map, z, vals


def _raster_fwd(cfg, affine_tile, setup_tile):
    out = _raster_fwd_call(cfg, affine_tile, setup_tile)
    slot_map, _, _ = out
    return out, (slot_map,)


def _raster_bwd(cfg, residuals, cotangents):
    (slot_map,) = residuals
    _, _, g_vals = cotangents
    th, tw, cap, d = cfg.tile_h, cfg.tile_w, cfg.cap, cfg.n_attr
    dtype = g_vals.dtype
    grid = (cfg.n_ty, cfg.n_tx)

    g_table = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cap + 1, 3 * d), lambda i, j: (i * cfg.n_tx + j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cfg.n_ty * cfg.n_tx, cap + 1, 3 * d), dtype),
        interpret=cfg.interpret,
    )(slot_map, g_vals)
    return g_table, None


raster_eval_pallas.defvjp(_raster_fwd, _raster_bwd)
