"""Tiled / binned rasterization.

The brute-force path in :mod:`deodr_tpu.ops.raster` evaluates every triangle
against every pixel — simple and exact, but O(T·H·W). This module adds the
scalable path: the framebuffer is split into fixed-size tiles, triangles and
silhouette edges are *binned* to the tiles their bounding boxes overlap
(padded per-tile index lists with a static capacity, the standard
static-shape answer to data-dependent bin sizes on TPU), and the per-tile
work is vmapped. Per-pixel math is identical to the brute-force path, so
tiled and untiled renders agree exactly; only the amount of wasted coverage
work changes (O(H·W·K) with K = per-tile bin occupancy, instead of
O(H·W·T)).

This replaces the role of the reference's per-triangle scanline bounding
(reference: C++/DifferentiableRenderer.h:864-906) at the tile granularity.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from deodr_tpu.ops.raster import TriangleRowSetup, triangle_row_setup
from deodr_tpu.ops.common import ceil_div, floor_div, gather_rows_mm
from deodr_tpu.ops.edge_aa import EdgeAAConfig, EdgeData, edge_overdraw_pass, edge_overdraw_pass_window_at


class TilingConfig(NamedTuple):
    """Static tiling parameters. Capacities bound per-tile bin sizes; bins
    overflowing their capacity drop the lowest-priority entries (use
    :func:`suggest_tiling` or generous capacities)."""

    tile_h: int = 64
    tile_w: int = 64
    triangle_capacity: int = 64
    edge_capacity: int = 32
    # 0 = no compaction; else drawn (non-culled) triangles are compacted to
    # this static capacity before binning (see rasterize_tiled_pallas)
    drawn_capacity: int = 0
    # the edge passes may use a different (usually taller) tile height than
    # the solid pass: thin AA bands span most of a tall tile anyway, so
    # taller tiles mean fewer slot visits and less per-tile fixed cost,
    # while small triangles want short tiles in the solid pass. 0 = same
    # as tile_h. edge_capacity is sized for THIS tile height.
    edge_tile_h: int = 0
    # long silhouette edges are chopped into ≤ edge_split collinear segments
    # before binning: segment bands have tight bounding boxes, cutting the
    # wasted coverage of long diagonal bands (the blend result is identical —
    # the transparency ramp is a line distance and attributes are affine
    # along the edge, so sub-segments composite to exactly the same values)
    edge_split: int = 1
    edge_segment_length: float = 48.0
    # 0 = sample textures over the full frame; else the solid pass's
    # bilinear texture fetch (and its gather/scatter adjoints — the most
    # expensive per-row ops of a textured frame) runs only on the tiles
    # with a non-empty triangle bin, compacted to this static capacity.
    # Background-only tiles (half the frame for a typical object render)
    # then cost nothing. Size it to the number of occupied tiles
    # (suggest_tiling measures it).
    tex_tile_capacity: int = 0
    # > 0 enables quad-granular texture fetching in the compacted solid
    # pass: one 8×8 stride-2 window row per 2×2 screen quad (4× fewer
    # gather/scatter rows than per-pixel footprints), with quads whose taps
    # exceed the window (uv seams / minification) re-fetched per pixel
    # through a compacted fallback list of THIS capacity. While the capacity
    # holds (checked via check_capacity), results are bit-identical to the
    # per-pixel fetch on the XLA extraction path, and equal up to f32/f64
    # summation order (≤ 2 ulp) on the kernel path (use_kernel=True).
    quad_fallback_capacity: int = 0
    # texture-fetch block width (0 = tile_w): the compacted bilinear fetch
    # gates 8-row × tex_block_w blocks on the covered-textured flag;
    # narrower blocks fetch fewer pixels at object boundaries at the cost
    # of more (fatter-amortized) gather rows
    tex_block_w: int = 0
    # two-level binning (see _bin_to_tiles_hier): when super_capacity > 0,
    # triangles are first binned to supertiles of (super_ty × super_tx)
    # tiles compacted to super_capacity candidates each, and only those are
    # binned to tiles. Cuts the binning mask from O(n_tiles·N) to
    # O(n_super·N + n_tiles·super_capacity) — required for 100k-face
    # meshes / 2048² framebuffers where the dense mask alone would be GBs.
    super_ty: int = 0
    super_tx: int = 0
    super_capacity: int = 0
    # pair-expansion binning (see _bin_to_tiles_pairs): when pair_ry ×
    # pair_rx > 0, each drawn triangle enumerates its ≤ pair_ry·pair_rx
    # overlapped tiles as explicit (triangle, tile) PAIRS; slot lists come
    # from one flat scatter by (tile, rank) instead of the (n_tiles × N ×
    # capacity) one-hot contraction, and the per-tile table gathers route
    # their adjoints through the pairs (one flat row-gather + a per-triangle
    # segment sum) instead of a big scatter-add. This is the large-mesh fast
    # path: at 131k faces the one-hot contractions + hier-binning gathers
    # it replaces measured ~26 ms/iter. Triangles whose bbox spans more
    # tiles than (pair_ry, pair_rx) overflow (checked via check_capacity,
    # like every other capacity) — the planner sizes the spans from
    # measured geometry. Takes precedence over super_* when set.
    pair_ry: int = 0
    pair_rx: int = 0


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_table_rows_pairs(r, table, idx, pair_row, pair_ok):
    """``table[idx]`` whose adjoint routes through the binning PAIRS.

    ``table`` is (N+1, W) with a trailing miss row; ``idx`` (n_tiles,
    cap+1) are the per-tile slot ids (+ miss column). The plain adjoint is
    a scatter-add over n_tiles·(cap+1) rows (~8.6 ms at 131k faces); since
    every VALID slot was placed by exactly one pair (PairBins.pair_row),
    the transpose is instead ONE flat row-gather of the cotangent at the
    pair rows plus a per-triangle segment sum over the triangle-major pairs
    (~2 ms). Slots past each tile's count and the miss column must carry
    zero cotangent (the raster backward zeroes them)."""
    del r, pair_row, pair_ok
    return table[idx]


def _gather_table_rows_pairs_fwd(r, table, idx, pair_row, pair_ok):
    return table[idx], (table.shape, idx.shape, pair_row, pair_ok)


def _gather_table_rows_pairs_bwd(r, res, ct):
    tshape, idx_shape, pair_row, pair_ok = res
    n_rows, w = int(tshape[0]), int(tshape[1])
    nt, c1 = idx_shape
    ct_flat = ct.reshape(nt * c1, w)
    rows = jnp.clip(pair_row, 0, nt * c1 - 1)
    g_pair = ct_flat[rows] * pair_ok[:, None].astype(ct.dtype)
    g = jnp.sum(g_pair.reshape(n_rows - 1, r, w), axis=1)
    g = jnp.concatenate([g, jnp.zeros((1, w), ct.dtype)], axis=0)
    return g, None, None, None


_gather_table_rows_pairs.defvjp(_gather_table_rows_pairs_fwd, _gather_table_rows_pairs_bwd)


def _exclusive_prefix_count(maskf: jnp.ndarray) -> jnp.ndarray:
    """Exclusive per-row prefix sum of a 0/1 matrix (n_tiles, N), computed
    with 128-wide chunked triangular matmuls on the MXU instead of
    jnp.cumsum (XLA lowers that to a slow reduce-window on TPU). Exact:
    0/1 inputs and integer-valued fp32 accumulation."""
    tn, n = maskf.shape
    chunk = 128
    pad = (-n) % chunk
    m = jnp.pad(maskf, ((0, 0), (0, pad))).reshape(tn, -1, chunk)
    tri = (jnp.arange(chunk)[:, None] < jnp.arange(chunk)[None, :]).astype(maskf.dtype)
    within = jnp.einsum("tbc,cd->tbd", m, tri)  # strictly-lower contributions
    chunk_tot = jnp.sum(m, axis=2)  # (tn, B)
    offs = jnp.cumsum(chunk_tot, axis=1) - chunk_tot  # tiny (B ~ N/128)
    rank = within + offs[:, :, None]
    return rank.reshape(tn, -1)[:, :n]


class PairBins(NamedTuple):
    """Slot lists plus the (triangle, tile) pair enumeration that produced
    them (see _bin_to_tiles_pairs). ``pair_row[p]`` is the flat
    ``tile·(cap+1) + rank`` row each pair occupies in a cap+1-row per-tile
    table (the +1 leaves the miss row addressable), ``pair_ok`` marks pairs
    that landed (in-grid, within span, rank < cap). Pairs are
    triangle-major: pair p belongs to triangle p // (ry·rx)."""

    slots: jnp.ndarray  # (n_tiles, cap) int32
    slot_valid: jnp.ndarray  # (n_tiles, cap) bool
    counts: jnp.ndarray  # (n_tiles,) int32
    pair_row: Optional[jnp.ndarray] = None  # (P,) int32
    pair_ok: Optional[jnp.ndarray] = None  # (P,) bool
    r: int = 0  # pairs per triangle (ry·rx); 0 = no pair info


def _bin_boxes(tiling, x_lo, x_hi, y_lo, y_hi, valid, n_ty, n_tx, capacity, checks=None):
    """Dispatch bbox binning: pair-expansion when the TilingConfig enables
    it, two-level when super_* is set (and the grid is actually coarser
    than one supertile), dense otherwise. Returns a PairBins (pair fields
    populated only on the pair path)."""
    th, tw = tiling.tile_h, tiling.tile_w
    if tiling.pair_ry and tiling.pair_rx:
        return _bin_to_tiles_pairs(
            x_lo, x_hi, y_lo, y_hi, valid, n_ty, n_tx, th, tw, capacity,
            tiling.pair_ry, tiling.pair_rx, checks=checks,
        )
    if tiling.super_capacity and (n_ty > tiling.super_ty or n_tx > tiling.super_tx):
        return PairBins(*_bin_to_tiles_hier(
            x_lo, x_hi, y_lo, y_hi, valid, n_ty, n_tx, th, tw, capacity,
            (tiling.super_ty, tiling.super_tx), tiling.super_capacity, checks=checks,
        ))
    return PairBins(*_bin_to_tiles(x_lo, x_hi, y_lo, y_hi, valid, n_ty, n_tx, th, tw, capacity))


def _bin_to_tiles_pairs(
    x_lo, x_hi, y_lo, y_hi, valid, n_ty, n_tx, tile_h, tile_w, capacity, ry, rx, checks=None
):
    """Pair-expansion binning: same slot lists as :func:`_bin_to_tiles`
    (identical ranks — both use the stable prefix-count order), built
    without the (n_tiles × N × cap) one-hot contraction.

    The dense membership mask and its prefix counts are kept (they are
    chunked MXU matmuls, cheap even at 131k faces); the expensive slot
    EXTRACTION becomes: enumerate each triangle's ≤ ry·rx overlapped tiles
    as pairs, read each pair's rank with one flat element-gather from the
    prefix matrix, and scatter triangle ids into the (n_tiles · cap) slot
    buffer at (tile, rank). Cost scales with the PAIR count (≈ N for tiny
    triangles) instead of n_tiles · N · cap.
    """
    n = x_lo.shape[0]
    n_tiles = n_ty * n_tx
    cap = min(capacity, n)
    ix0 = jnp.floor_divide(x_lo.astype(jnp.int32), tile_w)
    ix1 = jnp.floor_divide(x_hi.astype(jnp.int32), tile_w)
    iy0 = jnp.floor_divide(y_lo.astype(jnp.int32), tile_h)
    iy1 = jnp.floor_divide(y_hi.astype(jnp.int32), tile_h)
    nonempty = valid & (x_lo <= x_hi) & (y_lo <= y_hi)
    # clamp the enumeration origin into the grid (membership below only
    # tests in-grid tiles, so this matches the dense mask exactly) and drop
    # fully off-grid boxes
    nonempty = nonempty & (iy1 >= 0) & (ix1 >= 0) & (iy0 < n_ty) & (ix0 < n_tx)
    iy0 = jnp.clip(iy0, 0, n_ty - 1)
    ix0 = jnp.clip(ix0, 0, n_tx - 1)
    iy1 = jnp.clip(iy1, 0, n_ty - 1)
    ix1 = jnp.clip(ix1, 0, n_tx - 1)

    if checks is not None:
        span_y = jnp.max(jnp.where(nonempty, iy1 - iy0 + 1, 0))
        span_x = jnp.max(jnp.where(nonempty, ix1 - ix0 + 1, 0))
        checks.append(("pair-binning y tile span", span_y, ry))
        checks.append(("pair-binning x tile span", span_x, rx))

    # dense membership mask + stable ranks (shared with _bin_to_tiles)
    tys = jnp.arange(n_ty)[:, None, None]
    txs = jnp.arange(n_tx)[None, :, None]
    mask = (
        nonempty[None, None, :]
        & (tys >= iy0[None, None, :]) & (tys <= iy1[None, None, :])
        & (txs >= ix0[None, None, :]) & (txs <= ix1[None, None, :])
    ).reshape(n_tiles, n)
    rank_mat = _exclusive_prefix_count(mask.astype(jnp.float32)).astype(jnp.int32)
    counts = jnp.sum(mask, axis=1).astype(jnp.int32)

    # pair enumeration (triangle-major): p = tri·(ry·rx) + dy·rx + dx
    dy = jnp.arange(ry, dtype=jnp.int32)[None, :, None]
    dx = jnp.arange(rx, dtype=jnp.int32)[None, None, :]
    ty_p = iy0[:, None, None] + dy  # (N, ry, rx)
    tx_p = ix0[:, None, None] + dx
    ok = (
        nonempty[:, None, None]
        & (dy <= (iy1 - iy0)[:, None, None]) & (dx <= (ix1 - ix0)[:, None, None])
        & (ty_p < n_ty) & (tx_p < n_tx)
    )
    tile_p = (ty_p * n_tx + tx_p).reshape(-1)
    ok = ok.reshape(-1)
    tri_p = jnp.repeat(jnp.arange(n, dtype=jnp.int32), ry * rx)
    # flat element-gather of each pair's rank from the prefix matrix
    flat_idx = jnp.where(ok, tile_p * n + tri_p, 0)
    rank_p = rank_mat.reshape(-1)[flat_idx]
    ok = ok & (rank_p < cap)  # rank overflow == bin-capacity overflow (checked)

    # one flat scatter builds every tile's slot list at once; colliding
    # (tile, rank) pairs cannot exist for ok pairs (ranks are unique per
    # tile), the rest land in the dump row
    idx = jnp.where(ok, tile_p * cap + rank_p, n_tiles * cap)
    slots = (
        jnp.zeros(n_tiles * cap + 1, jnp.int32).at[idx].set(tri_p, mode="drop")[: n_tiles * cap]
    ).reshape(n_tiles, cap)
    ks = jnp.arange(cap, dtype=jnp.int32)
    slot_valid = ks[None, :] < counts[:, None]
    # pair_row addresses rows of a (n_tiles, cap+1)-row table (miss row kept
    # addressable at rank == cap) — what the table-gather adjoints consume
    pair_row = jnp.where(ok, tile_p * (cap + 1) + rank_p, n_tiles * (cap + 1))
    return PairBins(slots, slot_valid, counts, pair_row, ok, ry * rx)


def _bin_to_tiles_hier(
    x_lo, x_hi, y_lo, y_hi, valid, n_ty, n_tx, tile_h, tile_w, capacity,
    super_shape, super_capacity, checks=None,
):
    """Two-level (supertile → tile) binning for large scenes.

    The single-level binner materializes an (n_tiles, N) membership mask
    plus its prefix counts — ~2.4 kB per triangle at 640×480/8-row tiles,
    hopeless at 100k faces or 2048² framebuffers. This version first bins
    items to coarse SUPERTILES of ``super_shape = (s_ty, s_tx)`` tiles
    (mask n_super × N with n_super ~ tens), compacts each supertile's
    candidates to the static ``super_capacity``, then bins only those
    candidates to the supertile's member tiles (mask n_super × s_ty·s_tx ×
    K_s). Peak memory drops from O(n_tiles·N) to O(n_super·N +
    n_tiles·K_s). Both compactions are stable, so items keep their global
    relative order inside each tile bin — the invariant the edge pass's
    depth ordering relies on. Supertile overflow drops lowest-priority
    items exactly like tile-capacity overflow (surfaced via ``checks``).

    Returns (slots (n_tiles, K), slot_valid, counts) like _bin_to_tiles.
    """
    s_ty, s_tx = super_shape
    n_sy = -(-n_ty // s_ty)
    n_sx = -(-n_tx // s_tx)
    n_super = n_sy * n_sx
    n = x_lo.shape[0]
    ks = min(super_capacity, n)

    ix0 = jnp.floor_divide(x_lo.astype(jnp.int32), tile_w)
    ix1 = jnp.floor_divide(x_hi.astype(jnp.int32), tile_w)
    iy0 = jnp.floor_divide(y_lo.astype(jnp.int32), tile_h)
    iy1 = jnp.floor_divide(y_hi.astype(jnp.int32), tile_h)
    nonempty = valid & (x_lo <= x_hi) & (y_lo <= y_hi)

    # coarse: supertile membership (n_super, N)
    sys_ = jnp.arange(n_sy)[:, None, None]
    sxs = jnp.arange(n_sx)[None, :, None]
    sy0 = iy0[None, None, :] // s_ty
    sy1 = iy1[None, None, :] // s_ty
    sx0 = ix0[None, None, :] // s_tx
    sx1 = ix1[None, None, :] // s_tx
    mask_s = (
        nonempty[None, None, :]
        & (sys_ >= sy0) & (sys_ <= sy1)
        & (sxs >= sx0) & (sxs <= sx1)
    ).reshape(n_super, n)
    slots_s, valid_s, counts_s = _compact_bins(mask_s, ks)
    ks = slots_s.shape[1]
    if checks is not None:
        checks.append(("supertile bin", jnp.max(counts_s), ks))

    # fine: per supertile, bin its candidates to member tiles. Gather the
    # candidates' tile ranges (no gradients flow through binning).
    cand_ix0 = ix0[slots_s]  # (n_super, Ks)
    cand_ix1 = ix1[slots_s]
    cand_iy0 = iy0[slots_s]
    cand_iy1 = iy1[slots_s]
    cand_ok = valid_s & nonempty[slots_s]

    mty = jnp.arange(s_ty)[None, :, None, None]  # member tile coords
    mtx = jnp.arange(s_tx)[None, None, :, None]
    base_ty = (jnp.arange(n_super) // n_sx * s_ty)[:, None, None, None]
    base_tx = (jnp.arange(n_super) % n_sx * s_tx)[:, None, None, None]
    g_ty = base_ty + mty  # (n_super, s_ty, 1, 1)
    g_tx = base_tx + mtx
    mask_f = (
        cand_ok[:, None, None, :]
        & (g_ty >= cand_iy0[:, None, None, :]) & (g_ty <= cand_iy1[:, None, None, :])
        & (g_tx >= cand_ix0[:, None, None, :]) & (g_tx <= cand_ix1[:, None, None, :])
    ).reshape(n_super * s_ty * s_tx, ks)
    slots_local, slot_valid_f, counts_f = _compact_bins(mask_f, capacity)
    k = slots_local.shape[1]
    # local slot → global item id via the supertile candidate list
    slots_g = jnp.take_along_axis(
        jnp.repeat(slots_s, s_ty * s_tx, axis=0), slots_local, axis=1
    )

    # (super, member) tile order → global (ty, tx) order; tiles padded past
    # the framebuffer edge are dropped
    s_idx = jnp.arange(n_ty)[:, None] // s_ty * n_sx + jnp.arange(n_tx)[None, :] // s_tx
    m_idx = (jnp.arange(n_ty)[:, None] % s_ty) * s_tx + jnp.arange(n_tx)[None, :] % s_tx
    perm = (s_idx * (s_ty * s_tx) + m_idx).reshape(-1)
    return slots_g[perm], slot_valid_f[perm], counts_f[perm]


def _bin_to_tiles(x_lo, x_hi, y_lo, y_hi, valid, n_ty, n_tx, tile_h, tile_w, capacity):
    """Bin items (given clamped pixel bboxes) to tiles.

    Returns slots (n_tiles, K) int32 indices and slot_valid (n_tiles, K).
    Items keep their original relative order inside each bin (stable
    argsort), which the edge pass relies on for depth ordering.
    """
    tx0 = jnp.floor_divide(x_lo.astype(jnp.int32), tile_w)
    tx1 = jnp.floor_divide(x_hi.astype(jnp.int32), tile_w)
    ty0 = jnp.floor_divide(y_lo.astype(jnp.int32), tile_h)
    ty1 = jnp.floor_divide(y_hi.astype(jnp.int32), tile_h)
    nonempty = valid & (x_lo <= x_hi) & (y_lo <= y_hi)

    tys = jnp.arange(n_ty)[:, None, None]
    txs = jnp.arange(n_tx)[None, :, None]
    mask = (
        nonempty[None, None, :]
        & (tys >= ty0[None, None, :])
        & (tys <= ty1[None, None, :])
        & (txs >= tx0[None, None, :])
        & (txs <= tx1[None, None, :])
    )  # (n_ty, n_tx, N)
    mask = mask.reshape(n_ty * n_tx, -1)
    return _compact_bins(mask, capacity)


def _compact_index_perm(keep: jnp.ndarray, cap: int):
    """Stable front-compaction permutation: perm (cap,) int32 listing the
    kept indices in order, got (cap,) bool. For small caps the one-hot MXU
    contraction wins; for large caps (the 131k-face drawn compaction,
    where the (N × cap) contraction measured 6.7 ms/iter) a single flat
    scatter-set of the kept ids at their ranks (~1.7 ms) does."""
    n = keep.shape[0]
    keepf = keep.astype(jnp.float32)
    rank = (jnp.cumsum(keepf) - keepf).astype(jnp.int32)
    ks = jnp.arange(cap, dtype=jnp.int32)
    got = ks < jnp.sum(keep).astype(jnp.int32)
    # crossover: one-hot cost ~ n·cap · 1.1e-3 ns/elem vs scatter ~14 ns/row
    # (measured v5e) → scatter wins once cap exceeds ~12k; use 8192
    if cap > 8192:
        idx = jnp.where(keep & (rank < cap), rank, cap)
        perm = (
            jnp.zeros(cap + 1, jnp.int32)
            .at[idx]
            .set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:cap]
        )
        return perm, got
    onehot = ((rank[:, None] == ks[None, :]) & keep[:, None]).astype(jnp.float32)
    perm = jnp.einsum(
        "nk,n->k", onehot, jnp.arange(n, dtype=jnp.float32), precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.int32)
    return perm, got


def _compact_bins(mask: jnp.ndarray, capacity: int):
    """Compact a (n_tiles, N) membership mask into per-tile slot lists.

    Compaction without sorting (TPU sorts are slow): the in-bin position of
    each item is its prefix count; a one-hot (item, position) contraction
    then yields the per-tile slot lists, preserving item order.
    """
    n_tiles, n = mask.shape
    cap = min(capacity, n)
    maskf = mask.astype(jnp.float32)
    rank = _exclusive_prefix_count(maskf).astype(jnp.int32)  # (n_tiles, N)
    counts = jnp.sum(mask, axis=1)
    ks = jnp.arange(cap, dtype=jnp.int32)
    onehot = ((rank[:, :, None] == ks[None, None, :]) & mask[:, :, None]).astype(jnp.float32)
    ids = jnp.arange(n, dtype=jnp.float32)
    slots = jnp.einsum("tnk,n->tk", onehot, ids, precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    # ranks are contiguous 0..count-1, so slot k is filled iff k < count —
    # no need to reduce the (n_tiles, N, cap) one-hot a second time (that
    # reduce measured 0.45 ms/iter on the duck solid binning)
    slot_valid = ks[None, :] < counts[:, None].astype(jnp.int32)
    return slots, slot_valid, counts


def _occlusion_keep_mask(edge_z, z_buffer, n_ty, n_tx, tile_h, tile_w):
    """(n_tiles, E) bool: can an edge band blend ANY pixel of the tile?

    The edge blend is z-tested with strict < against the solid pass's
    z-buffer (reference: C++/DifferentiableRenderer.h:1632), and on the band
    b0 + b1 = 1 with b0, b1 ≥ 0, so the band's depth lies within
    [min(z0, z1), max(z0, z1)]. A band whose nearest endpoint depth is not
    in front of the tile's farthest z-buffer entry blends nothing there —
    cull it at binning time. Under real occlusion (depth complexity > 1)
    this removes most slot visits from the painter loops; gradients are
    unaffected because an everywhere-z-failed band contributes exactly zero
    to both the blend and its adjoint. A relative depth slack keeps the cull
    conservative against the fp32 rounding of the kernel's affine depth
    plane (bands within the slack of the z-buffer are kept, never dropped).
    """
    h, w = z_buffer.shape
    zp = jnp.pad(
        jax.lax.stop_gradient(z_buffer),
        [(0, n_ty * tile_h - h), (0, n_tx * tile_w - w)],
        constant_values=-jnp.inf,
    )
    tile_z_max = jnp.max(zp.reshape(n_ty, tile_h, n_tx, tile_w), axis=(1, 3)).reshape(-1)
    z = jax.lax.stop_gradient(edge_z)
    z_near = jnp.min(z, axis=1)  # (E,)
    slack = 1e-3 * (1.0 + jnp.abs(z_near))
    return (z_near - slack)[None, :] < tile_z_max[:, None]


def _edge_band_tile_mask(v0, v1, sigma, active, n_ty, n_tx, tile_h, tile_w, height, width, margin=1.0, xp=jnp):
    """(n_tiles, E) bool: does edge e's antialiasing band — the closed
    parallelogram spanned by the edge and its outward normal × sigma —
    intersect tile t? Exact separating-axis test (the band's two axes plus
    the tile rect's two), conservative by ``margin`` pixels.

    Replaces bbox binning for edge bands: a long diagonal edge's bbox covers
    O(len²/tile_area) tiles while its band only crosses O(len/tile_len) —
    this test bins exactly those, without splitting edges into segments
    (which multiplies every per-edge setup cost)."""
    dtype = v0.dtype
    d = v1 - v0  # (E, 2) edge direction (not normalized; n below unnormalized too)
    n = xp.stack([d[:, 1], -d[:, 0]], axis=1)  # one of the two normals; sign-agnostic test below
    # band along its own normal: [min(n·v0, n·v0 ± |n|·sigma)] — use both
    # signs so the test is winding-agnostic (conservative 2x band width)
    c0 = xp.sum(n * v0, axis=1)
    half = xp.sqrt(xp.sum(n * n, axis=1)) * (sigma + margin)
    b_lo_n = c0 - half
    b_hi_n = c0 + half
    # band along the edge direction: projections of the two endpoints
    # (the normal offset is orthogonal to d, so it does not extend this)
    p0 = xp.sum(d * v0, axis=1)
    p1 = xp.sum(d * v1, axis=1)
    dl = xp.sqrt(xp.sum(d * d, axis=1))
    b_lo_d = xp.minimum(p0, p1) - dl * margin
    b_hi_d = xp.maximum(p0, p1) + dl * margin

    tys = xp.arange(n_ty, dtype=dtype)[:, None]
    txs = xp.arange(n_tx, dtype=dtype)[None, :]
    gx0 = (txs * tile_w - margin).reshape(-1)  # (n_tx,)
    gx1 = (xp.minimum(txs * tile_w + tile_w - 1, width - 1) + margin).reshape(-1)
    gy0 = (tys * tile_h - margin).reshape(-1)  # (n_ty,)
    gy1 = (xp.minimum(tys * tile_h + tile_h - 1, height - 1) + margin).reshape(-1)

    # axis-aligned axes: plain bbox overlap
    ex_lo = xp.minimum(v0[:, 0], v1[:, 0]) - (sigma + margin)
    ex_hi = xp.maximum(v0[:, 0], v1[:, 0]) + (sigma + margin)
    ey_lo = xp.minimum(v0[:, 1], v1[:, 1]) - (sigma + margin)
    ey_hi = xp.maximum(v0[:, 1], v1[:, 1]) + (sigma + margin)
    ok_x = (gx0[None, :, None] <= ex_hi[None, None, :]) & (gx1[None, :, None] >= ex_lo[None, None, :])  # (1, n_tx, E)
    ok_y = (gy0[:, None, None] <= ey_hi[None, None, :]) & (gy1[:, None, None] >= ey_lo[None, None, :])  # (n_ty, 1, E)

    def rect_proj(ax, ay):
        # min/max over the 4 tile corners of ax·x + ay·y, separably
        px_lo = xp.minimum(ax[None, :] * gx0[:, None], ax[None, :] * gx1[:, None])  # (n_tx, E)
        px_hi = xp.maximum(ax[None, :] * gx0[:, None], ax[None, :] * gx1[:, None])
        py_lo = xp.minimum(ay[None, :] * gy0[:, None], ay[None, :] * gy1[:, None])  # (n_ty, E)
        py_hi = xp.maximum(ay[None, :] * gy0[:, None], ay[None, :] * gy1[:, None])
        return px_lo, px_hi, py_lo, py_hi

    nx_lo, nx_hi, ny_lo, ny_hi = rect_proj(n[:, 0], n[:, 1])
    ok_n = (nx_lo[None, :, :] + ny_lo[:, None, :] <= b_hi_n[None, None, :]) & (
        nx_hi[None, :, :] + ny_hi[:, None, :] >= b_lo_n[None, None, :]
    )
    dx_lo, dx_hi, dy_lo, dy_hi = rect_proj(d[:, 0], d[:, 1])
    ok_d = (dx_lo[None, :, :] + dy_lo[:, None, :] <= b_hi_d[None, None, :]) & (
        dx_hi[None, :, :] + dy_hi[:, None, :] >= b_lo_d[None, None, :]
    )
    mask = ok_x & ok_y & ok_n & ok_d & active[None, None, :]
    return mask.reshape(n_ty * n_tx, -1)


def split_edges(
    edges: EdgeData, n_split: int, segment_length: Optional[float], uv_segment_length: Optional[float] = None
) -> EdgeData:
    """Chop each edge into up to ``n_split`` collinear segments of roughly
    ``segment_length`` pixels (and/or ``uv_segment_length`` texels along the
    edge's uv segment — the criterion used to bound per-segment texture
    windows); extra segments of short edges are inactive. Segment order is
    edge-major so cross-edge depth ordering is preserved (segments of one
    edge cover disjoint band regions, so their relative order is
    irrelevant). Segment endpoints at t == 0/1 reuse the original endpoint
    arrays bit-for-bit, so unsplit edges are unchanged."""
    e = edges.v0.shape[0]
    dtype = edges.v0.dtype
    need = jnp.ones((e,), dtype)
    if segment_length is not None:
        length = jnp.sqrt(jnp.sum((edges.v1 - edges.v0) ** 2, axis=1))
        need = jnp.maximum(need, length / segment_length)
    if uv_segment_length is not None:
        # chebyshev uv span: texture windows are axis-aligned
        uvlen = jnp.max(jnp.abs(edges.uvs[:, 1] - edges.uvs[:, 0]), axis=1)
        need = jnp.maximum(need, uvlen / uv_segment_length)
    n_seg = jnp.clip(jnp.ceil(jnp.nan_to_num(need, nan=1.0, posinf=float(n_split))), 1, n_split)  # (E,)
    ks = jnp.arange(n_split, dtype=dtype)  # (S,)
    t0 = jnp.minimum(ks[None, :] / n_seg[:, None], 1.0)  # (E, S)
    t1 = jnp.minimum((ks[None, :] + 1) / n_seg[:, None], 1.0)
    seg_active = (ks[None, :] < n_seg[:, None]) & edges.active[:, None]

    def lerp(a0, a1, t):
        extra = a0.ndim - t.ndim
        tt = t.reshape(t.shape + (1,) * extra)
        return jnp.where(tt == 0.0, a0, jnp.where(tt == 1.0, a1, a0 + tt * (a1 - a0)))

    # ONE fused lerp over all endpoint attributes: the per-attribute expand
    # used to emit ~10 small (E, S, ...) where-chains plus their adjoints —
    # a measurable slice of the per-iteration op-count tail on the device
    # (each sub-2 µs op still pays fixed issue cost). Concatenate the
    # per-endpoint columns [v (2) | z (1) | attrs (C) | uv (2) | shade (1)]
    # into one (E, D) matrix, lerp once, slice back out.
    nb_c = edges.attrs.shape[-1]
    cat0 = jnp.concatenate(
        [edges.v0, edges.z[:, 0:1], edges.attrs[:, 0], edges.uvs[:, 0], edges.shades[:, 0:1]],
        axis=1,
    )
    cat1 = jnp.concatenate(
        [edges.v1, edges.z[:, 1:2], edges.attrs[:, 1], edges.uvs[:, 1], edges.shades[:, 1:2]],
        axis=1,
    )
    d = cat0.shape[1]
    c0b = jnp.broadcast_to(cat0[:, None], (e, n_split, d))
    c1b = jnp.broadcast_to(cat1[:, None], (e, n_split, d))
    s0 = lerp(c0b, c1b, t0).reshape(e * n_split, d)
    s1 = lerp(c0b, c1b, t1).reshape(e * n_split, d)
    v0s, v1s = s0[:, 0:2], s1[:, 0:2]
    z0s, z1s = s0[:, 2], s1[:, 2]
    a0s, a1s = s0[:, 3 : 3 + nb_c], s1[:, 3 : 3 + nb_c]
    u0s, u1s = s0[:, 3 + nb_c : 5 + nb_c], s1[:, 3 + nb_c : 5 + nb_c]
    s0s, s1s = s0[:, 5 + nb_c], s1[:, 5 + nb_c]
    return EdgeData(
        v0=v0s,
        v1=v1s,
        z=jnp.stack([z0s, z1s], axis=1),
        attrs=jnp.stack([a0s, a1s], axis=1),
        uvs=jnp.stack([u0s, u1s], axis=1),
        shades=jnp.stack([s0s, s1s], axis=1),
        active=seg_active.reshape(-1),
        use_texture=jnp.repeat(edges.use_texture, n_split),
    )


def find_winners_tiled(
    v_xy: jnp.ndarray,
    v_z: jnp.ndarray,
    draw: jnp.ndarray,
    width: int,
    height: int,
    strict_edge: bool,
    perspective_correct: bool,
    tiling: TilingConfig,
    checks=None,
):
    """Tiled equivalent of :func:`deodr_tpu.ops.raster.find_winners`.

    Returns (winner (H, W) int32, z_buffer (H, W), max_bin_count) — the last
    one lets callers check for fine-bin capacity overflow. Supertile-bin
    overflow (hierarchical binning) is only observable via ``checks``: the
    returned max_bin_count is computed from fine counts AFTER the supertile
    compaction has dropped items.
    """
    v_xy = jax.lax.stop_gradient(v_xy)
    v_z = jax.lax.stop_gradient(v_z)
    dtype = v_xy.dtype
    th, tw = tiling.tile_h, tiling.tile_w
    n_ty = -(-height // th)
    n_tx = -(-width // tw)

    setup = triangle_row_setup(v_xy, v_z, draw, width, height, strict_edge, perspective_correct)
    y_lo_all = setup.y_lo[:, 0]
    y_hi_all = setup.y_hi[:, 1]
    slots, slot_valid, counts = _bin_boxes(
        tiling, setup.x_lo, setup.x_hi, y_lo_all, y_hi_all, setup.valid,
        n_ty, n_tx, tiling.triangle_capacity, checks=checks,
    )[:3]

    big = jnp.asarray(jnp.inf, dtype)
    tile_ids = jnp.arange(n_ty * n_tx, dtype=jnp.int32)

    def one_tile(tile_id, tri_slots, tri_slot_valid):
        ty = tile_id // n_tx
        tx = tile_id % n_tx
        yy = (ty * th + jnp.arange(th)).astype(dtype)  # (th,)
        xx = (tx * tw + jnp.arange(tw)).astype(dtype)  # (tw,)

        s: TriangleRowSetup = jax.tree.map(lambda a: a[tri_slots], setup)
        valid = s.valid & tri_slot_valid

        lo = (s.x_lo - 1)[:, None, None]
        hi = s.x_hi[:, None, None]
        num_l = -(s.left_eq[:, :, None, 1] * yy[None, None, :] + s.left_eq[:, :, None, 2])  # (K, 2, th)
        num_r = -(s.right_eq[:, :, None, 1] * yy[None, None, :] + s.right_eq[:, :, None, 2])
        if strict_edge:
            t_l = 1 + floor_div(num_l, s.left_eq[:, :, None, 0], lo, hi)
        else:
            t_l = ceil_div(num_l, s.left_eq[:, :, None, 0], lo, hi)
        t_r = floor_div(num_r, s.right_eq[:, :, None, 0], lo, hi)
        x_begin = jnp.maximum(s.x_lo[:, None, None], t_l)
        x_end = jnp.minimum(s.x_hi[:, None, None], t_r)
        row_ok = (yy[None, None, :] >= s.y_lo[:, :, None]) & (yy[None, None, :] <= s.y_hi[:, :, None])
        cov = jnp.any(
            row_ok[:, :, :, None]
            & (xx[None, None, None, :] >= x_begin[:, :, :, None])
            & (xx[None, None, None, :] <= x_end[:, :, :, None]),
            axis=1,
        )  # (K, th, tw)
        zlin = s.z_coef[:, None, None, 0] * xx[None, None, :] + (
            s.z_coef[:, None, 1:2] * yy[None, :, None] + s.z_coef[:, None, 2:3]
        )
        z = 1.0 / zlin if perspective_correct else zlin
        z_eff = jnp.where(cov & valid[:, None, None] & jnp.isfinite(z), z, big)
        best_slot = jnp.argmin(z_eff, axis=0)  # first = lowest slot = lowest global index
        best_z = jnp.take_along_axis(z_eff, best_slot[None], axis=0)[0]
        winner = jnp.where(best_z < big, tri_slots[best_slot], -1)
        return winner, best_z

    winner_t, z_t = jax.vmap(one_tile)(tile_ids, slots, slot_valid)  # (n_tiles, th, tw)
    winner = winner_t.reshape(n_ty, n_tx, th, tw).transpose(0, 2, 1, 3).reshape(n_ty * th, n_tx * tw)
    z_buffer = z_t.reshape(n_ty, n_tx, th, tw).transpose(0, 2, 1, 3).reshape(n_ty * th, n_tx * tw)
    return winner[:height, :width], z_buffer[:height, :width], jnp.max(counts)


def _winner_slots_tiled(setup: TriangleRowSetup, width, height, strict_edge, perspective_correct, tiling, checks=None):
    """Per-tile visibility: returns (slots (n_tiles, K), best_slot
    (n_tiles, th, tw) int32 with K meaning 'miss', z (n_tiles, th, tw),
    max_count). Identical coverage/z math to find_winners_tiled but keeps
    the winner as a *tile-local slot index* for matmul-based shading.
    ``checks`` surfaces supertile-bin overflow (hierarchical binning), which
    the returned fine-count max cannot see."""
    dtype = setup.z_coef.dtype
    th, tw = tiling.tile_h, tiling.tile_w
    n_ty = -(-height // th)
    n_tx = -(-width // tw)
    cap = tiling.triangle_capacity

    slots, slot_valid, counts = _bin_boxes(
        tiling, setup.x_lo, setup.x_hi, setup.y_lo[:, 0], setup.y_hi[:, 1], setup.valid,
        n_ty, n_tx, cap, checks=checks,
    )[:3]
    cap = slots.shape[1]  # may be < capacity when there are few triangles
    big = jnp.asarray(jnp.inf, dtype)
    tile_ids = jnp.arange(n_ty * n_tx, dtype=jnp.int32)

    def one_tile(tile_id, tri_slots, tri_slot_valid):
        ty = tile_id // n_tx
        tx = tile_id % n_tx
        yy = (ty * th + jnp.arange(th)).astype(dtype)
        xx = (tx * tw + jnp.arange(tw)).astype(dtype)
        s: TriangleRowSetup = jax.tree.map(lambda a: a[tri_slots], setup)
        valid = s.valid & tri_slot_valid
        lo = (s.x_lo - 1)[:, None, None]
        hi = s.x_hi[:, None, None]
        num_l = -(s.left_eq[:, :, None, 1] * yy[None, None, :] + s.left_eq[:, :, None, 2])
        num_r = -(s.right_eq[:, :, None, 1] * yy[None, None, :] + s.right_eq[:, :, None, 2])
        if strict_edge:
            t_l = 1 + floor_div(num_l, s.left_eq[:, :, None, 0], lo, hi)
        else:
            t_l = ceil_div(num_l, s.left_eq[:, :, None, 0], lo, hi)
        t_r = floor_div(num_r, s.right_eq[:, :, None, 0], lo, hi)
        x_begin = jnp.maximum(s.x_lo[:, None, None], t_l)
        x_end = jnp.minimum(s.x_hi[:, None, None], t_r)
        row_ok = (yy[None, None, :] >= s.y_lo[:, :, None]) & (yy[None, None, :] <= s.y_hi[:, :, None])
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
        z_eff = jnp.where(cov & valid[:, None, None] & jnp.isfinite(z), z, big)
        best_slot = jnp.argmin(z_eff, axis=0).astype(jnp.int32)
        best_z = jnp.take_along_axis(z_eff, best_slot[None], axis=0)[0]
        best_slot = jnp.where(best_z < big, best_slot, cap)
        return best_slot, best_z

    best_slot, z_t = jax.vmap(one_tile)(tile_ids, slots, slot_valid)
    return slots, best_slot, z_t, jnp.max(counts)


def _untile(a, n_ty, n_tx, th, tw, height, width):
    chan = a.shape[3:]
    a = a.reshape((n_ty, n_tx, th, tw) + chan).transpose((0, 2, 1, 3) + tuple(range(4, 4 + len(chan))))
    return a.reshape((n_ty * th, n_tx * tw) + chan)[:height, :width]


def rasterize_tiled(
    scene,
    ij_off: jnp.ndarray,
    draw: jnp.ndarray,
    background: jnp.ndarray,
    tiling: TilingConfig,
    checks=None,
):
    """Full tiled solid pass: visibility + matmul-based shading.

    Shading evaluates, per pixel, the winning triangle's *affine attribute
    maps* A(x, y) = M·(x, y, 1) — the same quantity as the reference's
    ``xy1_to_A`` matrices (reference: C++/DifferentiableRenderer.h:807-830)
    — gathered per tile with a one-hot × table matmul that maps onto the
    MXU, instead of per-pixel gathers. Gradients to vertex positions flow
    through the barycentric matrix inverse inside the affine maps; to
    colors/uv/shade through the corner attributes; visibility (slots) is
    frozen. Returns (image, z_buffer, max_bin_count).
    """
    from deodr_tpu.ops.common import bilinear_sample, safe_barycentric_matrices

    height, width = scene.height, scene.width
    th, tw = tiling.tile_h, tiling.tile_w
    n_ty = -(-height // th)
    n_tx = -(-width // tw)
    cap = tiling.triangle_capacity
    dtype = ij_off.dtype
    has_texture = scene.texture is not None

    faces, faces_uv = scene.faces, scene.faces_uv
    textured, shaded = scene.textured, scene.shaded
    if tiling.drawn_capacity:
        # index-level compaction of drawn triangles: culled faces are often
        # half the mesh, and every downstream cost — the (n_tiles, N) bin
        # mask, its prefix counts and one-hot contraction, the setup/affine
        # row builds — scales with N
        t_all = faces.shape[0]
        dcap = min(tiling.drawn_capacity, t_all)
        if checks is not None:
            checks.append(("drawn-triangle compaction", jnp.sum(draw), dcap))
        perm, got = _compact_index_perm(draw, dcap)
        faces = faces[perm]
        faces_uv = faces_uv[perm]
        textured = textured[perm]
        shaded = shaded[perm]
        draw = draw[perm] & got

    # gather_rows_mm: gathers whose VJP is an MXU one-hot contraction
    # instead of a TPU scatter-add (the scatters were the hottest XLA
    # fusions in the fwd+bwd profile)
    v_xy = gather_rows_mm(ij_off, faces)
    v_z = scene.depths[faces]
    persp = scene.perspective_correct

    setup = triangle_row_setup(
        jax.lax.stop_gradient(v_xy), jax.lax.stop_gradient(v_z), draw,
        width, height, scene.strict_edge, persp,
    )
    slots, best_slot, z_t, max_count = _winner_slots_tiled(
        setup, width, height, scene.strict_edge, persp, tiling, checks=checks
    )
    cap = slots.shape[1]

    # ---- differentiable per-triangle affine attribute maps ----
    xy1_to_bary, _ = safe_barycentric_matrices(v_xy)  # (T, 3, 3); coverage
    # comes from the stop-gradded setup, which excludes degenerate triangles
    corner_list = [scene.colors[scene.faces]]  # (T, 3, C)
    if has_texture:
        corner_list.append(scene.uv[scene.faces_uv])  # (T, 3, 2)
        corner_list.append(scene.shade[scene.faces][..., None])  # (T, 3, 1)
    corner = jnp.concatenate(corner_list, axis=-1)  # (T, 3, D)
    if persp:
        corner = corner / v_z[..., None]
    affine = jnp.einsum("tkd,tkj->tdj", corner, xy1_to_bary, precision=jax.lax.Precision.HIGHEST)  # (T, D, 3)
    n_attr = affine.shape[1]
    if persp:
        z_row = jnp.einsum("tk,tkj->tj", 1.0 / v_z, xy1_to_bary, precision=jax.lax.Precision.HIGHEST)[:, None, :]  # (T, 1, 3)
        affine = jnp.concatenate([affine, z_row], axis=1)
    if has_texture:
        flagv = (scene.textured & scene.shaded).astype(dtype)
        zero = jnp.zeros_like(flagv)
        flag_row = jnp.stack([zero, zero, flagv], axis=-1)[:, None, :]  # constant-term-only row
        affine = jnp.concatenate([affine, flag_row], axis=1)
    d_total = affine.shape[1]
    affine_flat = affine.reshape(affine.shape[0], d_total * 3)
    # append a zero "miss" row
    affine_flat = jnp.concatenate([affine_flat, jnp.zeros((1, d_total * 3), dtype)], axis=0)

    tile_ids = jnp.arange(n_ty * n_tx, dtype=jnp.int32)

    def shade_tile(tile_id, tri_slots, slot_px):
        ty = tile_id // n_tx
        tx = tile_id % n_tx
        yy = (ty * th + jnp.arange(th)).astype(dtype)
        xx = (tx * tw + jnp.arange(tw)).astype(dtype)
        table = affine_flat[jnp.concatenate([tri_slots, jnp.full((1,), affine_flat.shape[0] - 1, jnp.int32)])]
        onehot = (slot_px.reshape(-1)[:, None] == jnp.arange(cap + 1, dtype=jnp.int32)[None, :]).astype(dtype)
        px = jnp.dot(onehot, table, preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST)  # (P, D*3)
        px = px.reshape(th * tw, d_total, 3)
        x_flat = jnp.broadcast_to(xx[None, :], (th, tw)).reshape(-1)
        y_flat = jnp.broadcast_to(yy[:, None], (th, tw)).reshape(-1)
        vals = px[:, :, 0] * x_flat[:, None] + px[:, :, 1] * y_flat[:, None] + px[:, :, 2]  # (P, D)
        return vals

    vals_t = jax.vmap(shade_tile)(tile_ids, slots, best_slot)  # (n_tiles, P, D)
    vals_t = vals_t.reshape(n_ty * n_tx, th, tw, d_total)
    vals = _untile(vals_t, n_ty, n_tx, th, tw, height, width)  # (H, W, D)

    nb_colors = scene.colors.shape[1]
    idx = nb_colors
    if persp:
        # attributes were premultiplied by 1/z; recover with the
        # perspective depth (reference: C++/DifferentiableRenderer.h:945-957)
        z_idx = d_total - (2 if has_texture else 1)
        big_z = 1.0 / vals[..., z_idx]
        pix = vals[..., :nb_colors] * big_z[..., None]
    else:
        pix = vals[..., :nb_colors]
    if has_texture:
        uv_px = vals[..., idx : idx + 2]
        lum = vals[..., idx + 2]
        if persp:
            uv_px = uv_px * big_z[..., None]
            lum = lum * big_z
        tex_px = bilinear_sample(scene.texture, uv_px) * lum[..., None]
        use_tex = jax.lax.stop_gradient(vals[..., d_total - 1]) > 0.5
        pix = jnp.where(use_tex[..., None], tex_px, pix)

    z_buffer = _untile(z_t, n_ty, n_tx, th, tw, height, width)
    covered = jnp.isfinite(z_buffer)
    pix = jnp.where(jnp.isfinite(pix), pix, 0.0)
    image = jnp.where(covered[..., None], pix, background)
    return image, jax.lax.stop_gradient(z_buffer), max_count


def edge_pass_tiled(
    cfg: EdgeAAConfig,
    buffer: jnp.ndarray,
    edges: EdgeData,
    texture: jnp.ndarray,
    z_buffer: jnp.ndarray,
    obs,
    tiling: TilingConfig,
):
    """Tiled edge-overdraw compositing: bin edge bands to tiles, vmap the
    sequential painter blend per tile. Per-bin depth order is preserved by
    the stable binning, so results match the untiled pass exactly.

    Returns (buffer, max_bin_count).
    """
    height, width = cfg.height, cfg.width
    th = tiling.edge_tile_h or tiling.tile_h
    tw = tiling.tile_w
    n_ty = -(-height // th)
    n_tx = -(-width // tw)
    sigma = cfg.sigma

    # exact band-vs-tile binning (same test as the pallas path; binning only
    # decides which tiles consider which edges — the per-tile stencil clips
    # exactly, so results are invariant to the binning rule)
    mask = _edge_band_tile_mask(
        jax.lax.stop_gradient(edges.v0), jax.lax.stop_gradient(edges.v1), sigma,
        edges.active, n_ty, n_tx, th, tw, height, width,
    )
    mask = mask & _occlusion_keep_mask(edges.z, z_buffer, n_ty, n_tx, th, tw)
    slots, slot_valid, counts = _compact_bins(mask, tiling.edge_capacity)

    # pad buffer / z_buffer to the tile grid and split into tiles
    ph, pw = n_ty * th - height, n_tx * tw - width
    chan = buffer.shape[2:] if buffer.ndim == 3 else ()

    def to_tiles(a, fill):
        a = jnp.pad(a, [(0, ph), (0, pw)] + [(0, 0)] * (a.ndim - 2), constant_values=fill)
        a = a.reshape((n_ty, th, n_tx, tw) + a.shape[2:]).transpose((0, 2, 1, 3) + tuple(range(4, 4 + a.ndim - 2)))
        return a.reshape((n_ty * n_tx, th, tw) + a.shape[4:])

    buffer_t = to_tiles(buffer, 0.0)
    z_t = to_tiles(z_buffer, jnp.inf)
    obs_t = to_tiles(obs, 0.0) if (cfg.error_mode and obs is not None) else None

    tile_ids = jnp.arange(n_ty * n_tx, dtype=jnp.int32)

    def one_tile(tile_id, buf, zb, obs_tile, edge_slots, edge_slot_valid):
        ty = tile_id // n_tx
        tx = tile_id % n_tx
        # stencils evaluate in GLOBAL coordinates on the tile's window —
        # shifting vertices per tile would re-round the edge equations in
        # fp32 and flip pixel inclusion on band boundaries vs the untiled
        # pass (cfg keeps the full-frame height/width for border clamps)
        origin = jnp.stack([(ty * th).astype(buffer.dtype), (tx * tw).astype(buffer.dtype)])
        e: EdgeData = jax.tree.map(lambda a: a[edge_slots], edges)
        e = e._replace(active=e.active & edge_slot_valid)
        return edge_overdraw_pass_window_at(cfg, buf, e, texture, zb, obs_tile, origin, (th, tw))

    if obs_t is None:
        obs_dummy = jnp.zeros((1, 1, 1), buffer.dtype)
        out_t = jax.vmap(lambda ti, b, z, es, ev: one_tile(ti, b, z, obs_dummy, es, ev))(
            tile_ids, buffer_t, z_t, slots, slot_valid
        )
    else:
        out_t = jax.vmap(one_tile)(tile_ids, buffer_t, z_t, obs_t, slots, slot_valid)

    out = out_t.reshape((n_ty, n_tx, th, tw) + chan).transpose((0, 2, 1, 3) + tuple(range(4, 4 + len(chan))))
    out = out.reshape((n_ty * th, n_tx * tw) + chan)
    return out[:height, :width], jnp.max(counts)


def _affine_attribute_maps(scene, v_xy, v_z, faces=None, faces_uv=None, textured=None, shaded=None):
    """Differentiable per-triangle affine attribute maps (T, D, 3) with the
    attribute order [colors (C), uv (2), shade (1) if textured][, 1/z if
    perspective][, textured-flag]; see rasterize_tiled. ``faces``/... allow
    a caller to pass a compacted triangle subset (default: all of scene's)."""
    from deodr_tpu.ops.common import safe_barycentric_matrices

    faces = scene.faces if faces is None else faces
    faces_uv = scene.faces_uv if faces_uv is None else faces_uv
    textured = scene.textured if textured is None else textured
    shaded = scene.shaded if shaded is None else shaded
    dtype = v_xy.dtype
    persp = scene.perspective_correct
    has_texture = scene.texture is not None
    xy1_to_bary, _ = safe_barycentric_matrices(v_xy)
    corner_list = [gather_rows_mm(scene.colors, faces)]
    if has_texture:
        corner_list.append(gather_rows_mm(scene.uv, faces_uv))
        corner_list.append(gather_rows_mm(scene.shade[:, None], faces))
    corner = jnp.concatenate(corner_list, axis=-1)
    if persp:
        corner = corner / v_z[..., None]
    affine = jnp.einsum("tkd,tkj->tdj", corner, xy1_to_bary, precision=jax.lax.Precision.HIGHEST)
    if persp:
        z_row = jnp.einsum("tk,tkj->tj", 1.0 / v_z, xy1_to_bary, precision=jax.lax.Precision.HIGHEST)[:, None, :]
        affine = jnp.concatenate([affine, z_row], axis=1)
    if has_texture:
        flagv = (textured & shaded).astype(dtype)
        zero = jnp.zeros_like(flagv)
        flag_row = jnp.stack([zero, zero, flagv], axis=-1)[:, None, :]
        affine = jnp.concatenate([affine, flag_row], axis=1)
    return affine


def _finish_shading(scene, vals, z_buffer, background):
    """Shared post-processing: perspective recovery, texture fetch,
    background compositing. vals: (H, W, D)."""
    from deodr_tpu.ops.common import bilinear_sample

    persp = scene.perspective_correct
    has_texture = scene.texture is not None
    nb_colors = scene.colors.shape[1]
    d_total = vals.shape[-1]
    if persp:
        z_idx = d_total - (2 if has_texture else 1)
        big_z = 1.0 / vals[..., z_idx]
        pix = vals[..., :nb_colors] * big_z[..., None]
    else:
        pix = vals[..., :nb_colors]
    if has_texture:
        idx = nb_colors
        uv_px = vals[..., idx : idx + 2]
        lum = vals[..., idx + 2]
        if persp:
            uv_px = uv_px * big_z[..., None]
            lum = lum * big_z
        tex_px = bilinear_sample(scene.texture, uv_px) * lum[..., None]
        use_tex = jax.lax.stop_gradient(vals[..., d_total - 1]) > 0.5
        pix = jnp.where(use_tex[..., None], tex_px, pix)
    covered = jnp.isfinite(z_buffer)
    pix = jnp.where(jnp.isfinite(pix), pix, 0.0)
    image = jnp.where(covered[..., None], pix, background)
    return image


def _finish_shading_tile_tex(
    scene, vals_pad, z_pad, counts, tiling, n_ty, n_tx, background, checks, interpret=False
):
    """Block-compacted variant of :func:`_finish_shading`'s texture fetch.

    The per-pixel bilinear gather and its scatter transpose cost ~13
    cycles/row on TPU — the dominant per-frame cost of a textured solid
    pass. The fetch runs only on 8-row × tile_w BLOCKS that actually
    contain a covered textured pixel (gated by the rasterizer's own
    textured-flag plane — tighter than bin occupancy, and independent of
    the solid pass's tile height), compacted to the static
    ``tex_tile_capacity``. Results are identical to the full-frame fetch
    when the capacity holds (checked via ``check_capacity``)."""
    del counts  # flag-based occupancy replaces bin-based
    from deodr_tpu.ops.common import bilinear_sample

    bw = tiling.tex_block_w or tiling.tile_w
    th, tw = 8, bw
    n_ty = n_ty * (tiling.tile_h // 8)  # fetch-block grid
    n_tx = n_tx * (tiling.tile_w // bw)
    height, width = scene.height, scene.width
    nb_colors = scene.colors.shape[1]
    d_total = vals_pad.shape[0]
    n_tiles = n_ty * n_tx
    k_cap = min(tiling.tex_tile_capacity, n_tiles)
    # a block participates iff any of its pixels is covered AND textured
    # (exactly the pixels whose sample survives the use_tex select below)
    flag = vals_pad[d_total - 1].reshape(n_ty, th, n_tx, tw) > 0.5
    occupied = jax.lax.stop_gradient(jnp.any(flag, axis=(1, 3)).reshape(-1))
    if checks is not None:
        checks.append(("texture tile compaction", jnp.sum(occupied), k_cap))
    tids_row, tvalid_row, _ = _compact_bins(occupied[None, :], k_cap)
    tids, tvalid = tids_row[0], tvalid_row[0]

    vt = vals_pad.reshape(d_total, n_ty, th, n_tx, tw)
    vt = jnp.transpose(vt, (1, 3, 0, 2, 4)).reshape(n_tiles, d_total * th * tw)
    sel = gather_rows_mm(vt, tids).reshape(k_cap, d_total, th, tw)
    idx = nb_colors
    uv_px = jnp.stack([sel[:, idx], sel[:, idx + 1]], axis=-1)  # (K, th, tw, 2)
    lum = sel[:, idx + 2]
    tex_h, tex_w = scene.texture.shape[0], scene.texture.shape[1]
    if (
        tiling.quad_fallback_capacity
        and th % 2 == 0
        and tw % 2 == 0
        and tex_h % 2 == 0
        and tex_w % 2 == 0
        and tex_h >= 8
        and tex_w >= 8
    ):
        from deodr_tpu.ops.common import bilinear_sample_quads

        # group pixels into 2×2 screen quads: one window-table row per quad
        # instead of one footprint row per pixel (see bilinear_sample_quads)
        def to_quads(a):
            # (K, th, tw, ...) → (K·th/2·tw/2, 4, ...)
            chan = a.shape[3:]
            a = a.reshape((k_cap, th // 2, 2, tw // 2, 2) + chan)
            a = jnp.moveaxis(a, 2, 3)  # (K, th/2, tw/2, 2, 2, ...)
            return a.reshape((k_cap * (th // 2) * (tw // 2), 4) + chan)

        use_px = jax.lax.stop_gradient(sel[:, d_total - 1]) > 0.5  # (K, th, tw)
        samples = bilinear_sample_quads(
            scene.texture,
            to_quads(uv_px),
            to_quads(use_px),
            tiling.quad_fallback_capacity,
            checks=checks,
            use_kernel=True,
            interpret=interpret,
        )
        samples = samples.reshape(k_cap, th // 2, tw // 2, 2, 2, nb_colors)
        samples = jnp.moveaxis(samples, 3, 2).reshape(k_cap, th, tw, nb_colors)
        tex_px = samples * lum[..., None]
    else:
        tex_px = bilinear_sample(scene.texture, uv_px) * lum[..., None]
    tex_px = jnp.where(jnp.isfinite(tex_px), tex_px, 0.0)
    # invalid slots point at tile 0; zero their rows so the .add is a no-op
    tex_rows = (tex_px * tvalid[:, None, None, None].astype(tex_px.dtype)).reshape(
        k_cap, th * tw * nb_colors
    )
    full = jnp.zeros((n_tiles, th * tw * nb_colors), tex_px.dtype).at[tids].add(tex_rows)
    tex_full = _untile(full.reshape(n_tiles, th, tw, nb_colors), n_ty, n_tx, th, tw, height, width)

    vals = jnp.moveaxis(vals_pad, 0, -1)[:height, :width, :]
    pix = vals[..., :nb_colors]
    use_tex = jax.lax.stop_gradient(vals[..., d_total - 1]) > 0.5
    pix = jnp.where(use_tex[..., None], tex_full, pix)
    z_buffer = z_pad[:height, :width]
    covered = jnp.isfinite(z_buffer)
    pix = jnp.where(jnp.isfinite(pix), pix, 0.0)
    return jnp.where(covered[..., None], pix, background)


def _pack_setup_rows(setup: TriangleRowSetup, dtype, strict_edge: bool = True):
    """Pack TriangleRowSetup into the (T, 22) float layout consumed by the
    Pallas kernel (see deodr_tpu.ops.pallas.raster_kernel).

    For strict_edge, the left/right edge equations are SIGN-NORMALIZED so
    the kernel's coverage is a uniform plane-threshold test encoding the
    reference's rational x-range semantics: a left equation with
    a ≤ 0 (including the den == 0 row convention) and a right equation with
    a > 0 are negated, making inclusion exactly ``plane > 0`` (left,
    strict) and ``plane ≥ 0`` (right) — see raster_kernel._coverage_and_z.
    """

    def norm_left(eq):  # (T, 2, 3)
        if not strict_edge:
            return eq
        return jnp.where((eq[:, :, 0:1] > 0), eq, -eq)

    def norm_right(eq):
        if not strict_edge:
            return eq
        return jnp.where((eq[:, :, 0:1] > 0), -eq, eq)

    leq = norm_left(setup.left_eq)
    req = norm_right(setup.right_eq)
    cols = [
        setup.y_lo[:, 0:1],
        setup.y_lo[:, 1:2],
        setup.y_hi[:, 0:1],
        setup.y_hi[:, 1:2],
        leq[:, 0, :],
        leq[:, 1, :],
        req[:, 0, :],
        req[:, 1, :],
        setup.x_lo[:, None],
        setup.x_hi[:, None],
        setup.z_coef,
        setup.valid[:, None].astype(dtype),
    ]
    return jnp.concatenate([c.astype(dtype) for c in cols], axis=1)


def rasterize_tiled_pallas(
    scene, ij_off, draw, background, tiling: TilingConfig, interpret: bool = False, checks=None
):
    """Pallas-kernel version of :func:`rasterize_tiled` (same results)."""
    from deodr_tpu.ops.pallas.raster_kernel import (
        PallasRasterConfig,
        SETUP_WIDTH,
        raster_eval_pallas,
    )

    height, width = scene.height, scene.width
    th, tw = tiling.tile_h, tiling.tile_w
    n_ty = -(-height // th)
    n_tx = -(-width // tw)
    dtype = ij_off.dtype

    faces, faces_uv = scene.faces, scene.faces_uv
    textured, shaded = scene.textured, scene.shaded
    if tiling.drawn_capacity:
        # index-level compaction of drawn triangles: culled faces are often
        # half the mesh, and every downstream cost — the (n_tiles, N) bin
        # mask, its prefix counts and one-hot contraction, the setup/affine
        # row builds — scales with N
        t_all = faces.shape[0]
        dcap = min(tiling.drawn_capacity, t_all)
        if checks is not None:
            checks.append(("drawn-triangle compaction", jnp.sum(draw), dcap))
        perm, got = _compact_index_perm(draw, dcap)
        faces = faces[perm]
        faces_uv = faces_uv[perm]
        textured = textured[perm]
        shaded = shaded[perm]
        draw = draw[perm] & got

    # gather_rows_mm: gathers whose VJP is an MXU one-hot contraction
    # instead of a TPU scatter-add (the scatters were the hottest XLA
    # fusions in the fwd+bwd profile)
    v_xy = gather_rows_mm(ij_off, faces)
    v_z = scene.depths[faces]
    persp = scene.perspective_correct

    setup = triangle_row_setup(
        jax.lax.stop_gradient(v_xy), jax.lax.stop_gradient(v_z), draw,
        width, height, scene.strict_edge, persp,
    )
    bins = _bin_boxes(
        tiling, setup.x_lo, setup.x_hi, setup.y_lo[:, 0], setup.y_hi[:, 1], setup.valid,
        n_ty, n_tx, tiling.triangle_capacity, checks=checks,
    )
    slots, slot_valid, counts = bins.slots, bins.slot_valid, bins.counts
    cap = slots.shape[1]

    packed = _pack_setup_rows(setup, dtype, scene.strict_edge)  # (T, 22)
    setup_tile = packed[slots]  # (n_tiles, cap, 22)
    setup_tile = setup_tile.at[:, :, SETUP_WIDTH - 1].multiply(slot_valid.astype(dtype))
    # SMEM layout: the narrow axis must be the row axis (Mosaic pads every
    # SMEM row to ~1 KiB) — see raster_kernel module docstring
    setup_tile = jnp.swapaxes(setup_tile, 1, 2)  # (n_tiles, 22, cap)

    affine = _affine_attribute_maps(scene, v_xy, v_z, faces, faces_uv, textured, shaded)  # (T, D, 3)
    d_total = affine.shape[1]
    # kernel layout: [x-coeffs D | y-coeffs D | const D]
    affine_g = jnp.swapaxes(affine, 1, 2).reshape(affine.shape[0], 3 * d_total)
    affine_g = jnp.concatenate([affine_g, jnp.zeros((1, 3 * d_total), dtype)], axis=0)
    miss = jnp.full((slots.shape[0], 1), affine_g.shape[0] - 1, jnp.int32)
    idx_m = jnp.concatenate([slots, miss], axis=1)
    if bins.r:
        # pair-routed adjoint: one flat cotangent row-gather + segment sum
        # instead of the n_tiles·(cap+1)-row scatter-add
        affine_tile = jnp.swapaxes(
            _gather_table_rows_pairs(bins.r, affine_g, idx_m, bins.pair_row, bins.pair_ok), 1, 2
        )  # (n_tiles, 3D, cap+1)
    else:
        affine_tile = jnp.swapaxes(gather_rows_mm(affine_g, idx_m), 1, 2)

    cfg = PallasRasterConfig(
        tile_h=th, tile_w=tw, n_ty=n_ty, n_tx=n_tx, cap=cap, n_attr=d_total,
        strict_edge=scene.strict_edge, perspective_correct=persp, interpret=interpret,
    )
    counts_i = counts.astype(jnp.int32)[None, :]
    slot_map, z_pad, vals_pad = raster_eval_pallas(cfg, affine_tile, setup_tile, counts_i)
    z_buffer = z_pad[:height, :width]
    if scene.texture is not None and tiling.tex_tile_capacity and not persp:
        image = _finish_shading_tile_tex(
            scene, vals_pad, z_pad, counts, tiling, n_ty, n_tx, background, checks,
            interpret=interpret,
        )
    else:
        vals = jnp.moveaxis(vals_pad, 0, -1)[:height, :width, :]
        image = _finish_shading(scene, vals, z_buffer, background)
    return image, jax.lax.stop_gradient(z_buffer), jnp.max(counts)


def suggest_tiling(
    ij: "np.ndarray",
    faces: "np.ndarray",
    height: int,
    width: int,
    sigma: float = 0.0,
    edgeflags: "np.ndarray" = None,
    tile_h: int = None,
    tile_w: int = 64,
    margin: float = 1.5,
    for_pallas: bool = False,
    bucket_mode: str = "pow2",
) -> TilingConfig:
    """Eagerly (numpy) estimate per-tile bin occupancies for the given
    projected geometry and return a TilingConfig with power-of-two
    capacities (so jit keys stay stable across fitting iterations).

    Uses the 2D difference-array / integral-image trick to count, per tile,
    how many triangle (and silhouette-edge band) bounding boxes overlap it.
    """
    import numpy as _np

    ij = _np.asarray(ij)
    faces = _np.asarray(faces)

    if for_pallas:
        # Mosaic block constraints: last dim multiple of 128, second-to-last
        # multiple of 8
        tile_w = 128
    if tile_h is None:
        # pick the tile height from the typical triangle bbox height: small
        # triangles want small tiles (less bbox-overlap waste)
        tri_h = ij[faces][:, :, 1]
        med_h = float(_np.median(tri_h.max(axis=1) - tri_h.min(axis=1))) if len(faces) else 32.0
        if med_h <= 12:
            tile_h = 8
        elif med_h <= 32:
            tile_h = 16 if for_pallas else 32
        else:
            # 48-row tiles (6 sublane groups) measured fastest for the Pallas
            # kernels on big-triangle scenes after the round-4 band-clip
            # optimization (512² microbench σ=1: 464 vs 443 Mpix/s at 32,
            # ~459 at 64) — per-slot vector work shrank, moving the
            # visit-count vs tile-area balance upward
            tile_h = 48 if for_pallas else 64
        tile_h = min(tile_h, max(8, height))
    n_ty = -(-height // tile_h)
    n_tx = -(-width // tile_w)

    def occupancy(x_lo, x_hi, y_lo, y_hi, valid, gh=None, gw=None, gny=None, gnx=None):
        gh = tile_h if gh is None else gh
        gw = tile_w if gw is None else gw
        gny = n_ty if gny is None else gny
        gnx = n_tx if gnx is None else gnx
        tx0 = _np.clip(x_lo // gw, 0, gnx - 1).astype(int)
        tx1 = _np.clip(x_hi // gw, 0, gnx - 1).astype(int)
        ty0 = _np.clip(y_lo // gh, 0, gny - 1).astype(int)
        ty1 = _np.clip(y_hi // gh, 0, gny - 1).astype(int)
        ok = valid & (x_lo <= x_hi) & (y_lo <= y_hi)
        delta = _np.zeros((gny + 1, gnx + 1))
        _np.add.at(delta, (ty0[ok], tx0[ok]), 1)
        _np.add.at(delta, (ty1[ok] + 1, tx0[ok]), -1)
        _np.add.at(delta, (ty0[ok], tx1[ok] + 1), -1)
        _np.add.at(delta, (ty1[ok] + 1, tx1[ok] + 1), 1)
        counts = _np.cumsum(_np.cumsum(delta, axis=0), axis=1)[:gny, :gnx]
        return int(counts.max()) if counts.size else 0

    tri = ij[faces]
    x_lo = _np.clip(_np.floor(tri[:, :, 0].min(axis=1)), 0, width - 1)
    x_hi = _np.clip(_np.floor(tri[:, :, 0].max(axis=1)), 0, width - 1)
    y_lo = _np.clip(_np.floor(tri[:, :, 1].min(axis=1)), 0, height - 1)
    y_hi = _np.clip(_np.floor(tri[:, :, 1].max(axis=1)), 0, height - 1)
    tri_cap = occupancy(x_lo, x_hi, y_lo, y_hi, _np.ones(len(faces), bool))

    edge_cap = 8
    edge_split = 1
    seg_len = 48.0
    if sigma > 0 and edgeflags is not None and _np.any(edgeflags):
        sub0 = _np.array([1, 2, 0])
        sub1 = _np.array([0, 1, 2])
        flat = _np.asarray(edgeflags).reshape(-1)
        tri_ids = _np.repeat(_np.arange(len(faces)), 3)[flat]
        slot = _np.tile(_np.arange(3), len(faces))[flat]
        i0 = faces[tri_ids, sub0[slot]]
        i1 = faces[tri_ids, sub1[slot]]
        p0 = ij[i0]
        p1 = ij[i1]
        # mirror the exact band-vs-tile SAT binning used by both tiled edge
        # passes (whole edges, no splitting) — in numpy: this runs eagerly
        # per fitting iteration, and eager jnp ops each pay a device
        # (tunnel) roundtrip
        mask = _edge_band_tile_mask(
            p0.astype(_np.float32), p1.astype(_np.float32), float(sigma),
            _np.ones((len(p0),), bool), n_ty, n_tx, tile_h, tile_w, height, width,
            xp=_np,
        )
        edge_cap = int(mask.sum(axis=1).max()) if mask.size else 0

    def bucket(n):
        import math

        n = max(1, int(math.ceil(n * margin)))
        if bucket_mode == "exact":
            return max(8, -(-n // 8) * 8)  # round up to a multiple of 8
        return max(8, int(2 ** math.ceil(math.log2(n))))

    # two-level binning once the dense (n_tiles × N) mask would be large;
    # supertile capacity measured at the coarse granularity
    super_ty = super_tx = super_capacity = 0
    if n_ty * n_tx * max(len(faces), 1) > (1 << 22):
        super_ty, super_tx = 8, 4
        s_occ = occupancy(
            x_lo, x_hi, y_lo, y_hi, _np.ones(len(faces), bool),
            gh=tile_h * super_ty, gw=tile_w * super_tx,
            gny=-(-n_ty // super_ty), gnx=-(-n_tx // super_tx),
        )
        super_capacity = bucket(max(s_occ, 8))

    return TilingConfig(
        tile_h=tile_h,
        tile_w=tile_w,
        triangle_capacity=bucket(tri_cap),
        edge_capacity=bucket(edge_cap),
        edge_split=edge_split,
        edge_segment_length=seg_len,
        super_ty=super_ty,
        super_tx=super_tx,
        super_capacity=super_capacity,
    )


def _transform_ineq_rows(b0c, b1c, tc, dtype):
    """Pre-transform the four band-clip inequality rows so the Pallas edge
    kernel's inclusion predicate is a uniform ``plane > θ`` per inequality.

    Encodes the reference's rational x-range semantics (reference:
    C++/DifferentiableRenderer.h:2620-2648; emulated by floor_div in
    ops/common.py) at the predicate level: for a row (a, b, c) with plane
    p(x, y) = a·x + b·y + c, a pixel is kept iff p > 0 when a > 0 (strict),
    p ≥ 0 when a < 0, and — the den == 0 floor_div convention — iff
    b·y + c < 0 when a == 0. ``p ≥ 0`` becomes ``p > −min_normal`` exactly
    (every float ≥ 0 exceeds −min_normal; every normal float < 0 does not;
    negative denormals mis-classify, which is the flush-to-zero-level
    boundary window already accepted for the kernels), and the a == 0 case
    becomes a strict > 0 test of the sign-flipped row. Rows are
    non-differentiable (band-clip boundary), like the reference's pixel-set
    decision.

    Returns (rows (E, 12), thetas (E, 4)).
    """
    tiny = float(jnp.finfo(dtype).tiny)
    neg_tc = jnp.concatenate([-tc[:, 0:2], 1.0 - tc[:, 2:3]], axis=1)

    def one(r3):
        r3 = jax.lax.stop_gradient(r3)
        a = r3[:, 0]
        coeffs = jnp.where((a == 0)[:, None], -r3, r3)
        theta = jnp.where(a < 0, -tiny, 0.0).astype(dtype)
        return coeffs, theta

    pairs = [one(r) for r in (b0c, b1c, tc, neg_tc)]
    rows = jnp.concatenate([p[0] for p in pairs], axis=1)
    thetas = jnp.stack([p[1] for p in pairs], axis=1)
    return rows, thetas


def _edge_stencil_rows(cfg: EdgeAAConfig, edges: EdgeData, height: int):
    """Differentiable per-edge stencil coefficient rows shared by the Pallas
    edge wrappers: (b0c, b1c, tc, y_beg, y_end, zcoef, active).

    Degenerate (inactive / zero-length) edges would make the stencil matrix
    singular; NaN primals would poison the zero cotangents flowing back
    through the matrix-inverse VJP, so substitute a harmless dummy edge.
    """
    from deodr_tpu.ops.common import inv3x3

    sigma = cfg.sigma
    v0 = edges.v0
    # cancellation-aware threshold: the stencil det is ±|edge| computed via
    # O(coord) cofactor products, so edges shorter than the fp noise floor
    # (O(coord·eps)) can produce det == 0 exactly → inf inverse
    eps_d = jnp.finfo(edges.v0.dtype).eps
    scale2 = jnp.maximum(1.0, jnp.sum(v0**2 + edges.v1**2, axis=1))
    degenerate = ~(jnp.sum((edges.v1 - v0) ** 2, axis=1) > (100.0 * eps_d) ** 2 * scale2)
    v1 = jnp.where(degenerate[:, None], v0 + jnp.asarray([1.0, 0.0], edges.v1.dtype), edges.v1)
    if cfg.clockwise:
        n = jnp.stack([v0[:, 1] - v1[:, 1], v1[:, 0] - v0[:, 0]], axis=1)
    else:
        n = jnp.stack([v1[:, 1] - v0[:, 1], v0[:, 0] - v1[:, 0]], axis=1)
    n = n / jnp.sqrt(jnp.sum(n**2, axis=1, keepdims=True))
    ones = jnp.ones_like(v0[:, 0])
    zeros = jnp.zeros_like(ones)
    m = jnp.stack(
        [
            jnp.stack([v0[:, 0], v1[:, 0], n[:, 0]], axis=1),
            jnp.stack([v0[:, 1], v1[:, 1], n[:, 1]], axis=1),
            jnp.stack([ones, ones, zeros], axis=1),
        ],
        axis=1,
    )  # (E, 3, 3)
    inv = inv3x3(m)
    b0c = inv[:, 0, :]
    b1c = inv[:, 1, :]
    tc = inv[:, 2, :] / sigma

    vy_min = jnp.minimum(v0[:, 1], v1[:, 1])
    vy_max = jnp.maximum(v0[:, 1], v1[:, 1])
    y_beg = jax.lax.stop_gradient(jnp.maximum(jnp.floor(vy_min - sigma) + 1, 0.0))
    y_end = jax.lax.stop_gradient(jnp.minimum(jnp.floor(vy_max + sigma), float(height - 1)))

    finite = jnp.all(jnp.isfinite(inv), axis=(1, 2))
    active = edges.active & finite & ~degenerate
    zcoef = jax.lax.stop_gradient(b0c * edges.z[:, 0:1] + b1c * edges.z[:, 1:2])  # (E, 3)
    return b0c, b1c, tc, y_beg, y_end, zcoef, active


def compact_active_edges(edges: EdgeData, capacity: int) -> EdgeData:
    """Compact active edges/segments to the front, preserving order.

    Index-level (sort-free prefix-count ranks), then ONE feature-matrix
    gather with a matmul adjoint so the backward pass pays a single MXU
    contraction instead of per-field scatter-adds.
    """
    e = edges.active.shape[0]
    cap = min(capacity, e)
    activef = edges.active.astype(jnp.float32)
    rank = (jnp.cumsum(activef) - activef).astype(jnp.int32)
    ks = jnp.arange(cap, dtype=jnp.int32)
    onehot = ((rank[:, None] == ks[None, :]) & edges.active[:, None]).astype(jnp.float32)
    perm = jnp.einsum(
        "nk,n->k", onehot, jnp.arange(e, dtype=jnp.float32), precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.int32)
    got = ks < jnp.sum(edges.active).astype(jnp.int32)

    c = edges.attrs.shape[-1]
    feat = jnp.concatenate(
        [
            edges.v0,
            edges.v1,
            edges.z,
            edges.attrs[:, 0],
            edges.attrs[:, 1],
            edges.uvs[:, 0],
            edges.uvs[:, 1],
            edges.shades,
        ],
        axis=1,
    )  # (E, 10 + 2C)
    f = gather_rows_mm(feat, perm)
    return EdgeData(
        v0=f[:, 0:2],
        v1=f[:, 2:4],
        z=f[:, 4:6],
        attrs=jnp.stack([f[:, 6 : 6 + c], f[:, 6 + c : 6 + 2 * c]], axis=1),
        uvs=jnp.stack([f[:, 6 + 2 * c : 8 + 2 * c], f[:, 8 + 2 * c : 10 + 2 * c]], axis=1),
        shades=f[:, 10 + 2 * c : 12 + 2 * c],
        active=edges.active[perm] & got,
        use_texture=edges.use_texture[perm],
    )


def edge_pass_tiled_pallas(
    cfg: EdgeAAConfig,
    buffer: jnp.ndarray,
    edges: EdgeData,
    z_buffer: jnp.ndarray,
    obs,
    tiling: TilingConfig,
    interpret: bool = False,
):
    """Pallas-kernel edge-overdraw pass (untextured attribute path).

    The differentiable per-edge stencil coefficients (b0/b1/T affine rows,
    via the 3x3 edge-matrix inverse) are built in XLA so jax.grad chains
    per-slot gradients from the kernel's custom VJP back to the edge
    endpoint positions; the sequential per-tile blending runs in VMEM.
    Returns (buffer, max_bin_count).
    """
    from deodr_tpu.ops.pallas.edge_kernel import (
        PallasEdgeConfig,
        edge_pass_pallas,
        edge_row_width,
    )

    height, width = cfg.height, cfg.width
    th = tiling.edge_tile_h or tiling.tile_h
    tw = tiling.tile_w
    n_ty = -(-height // th)
    n_tx = -(-width // tw)
    sigma = cfg.sigma
    dtype = buffer.dtype
    c = edges.attrs.shape[-1]

    b0c, b1c, tc, y_beg, y_end, zcoef, active = _edge_stencil_rows(cfg, edges, height)
    v0, v1 = edges.v0, edges.v1

    # fold the per-channel edge color a_ch = b0·attrs0[ch] + b1·attrs1[ch]
    # and the depth z = b0·z0 + b1·z1 into affine (x, y) coefficients here —
    # differentiably, so endpoint-position/attribute gradients chain through
    # the fold; the kernel then evaluates one fma per plane. The b0/b1 rows
    # are kept only for the band-clip inequalities (non-differentiable
    # boundary, like the reference's pixel-set decision) and z is constant
    # per the reference adjoint's contract.
    a0 = edges.attrs[:, 0, :]  # (E, C)
    a1 = edges.attrs[:, 1, :]
    acoef = b0c[:, None, :] * a0[:, :, None] + b1c[:, None, :] * a1[:, :, None]  # (E, C, 3)
    i14, th14 = _transform_ineq_rows(b0c, b1c, tc, dtype)
    rows = jnp.concatenate(
        [
            i14,
            th14,
            tc,
            y_beg[:, None],
            y_end[:, None],
            acoef.reshape(acoef.shape[0], 3 * c),
            zcoef,
            active.astype(dtype)[:, None],
        ],
        axis=1,
    )
    assert rows.shape[1] == edge_row_width(c)

    # --- bin edge bands to tiles: exact band-parallelogram vs tile-rect
    # separating-axis test (tight for long diagonal bands, no edge
    # splitting needed) ---
    mask = _edge_band_tile_mask(
        jax.lax.stop_gradient(v0), jax.lax.stop_gradient(v1), sigma, active,
        n_ty, n_tx, th, tw, height, width,
    )
    mask = mask & _occlusion_keep_mask(edges.z, z_buffer, n_ty, n_tx, th, tw)
    slots, slot_valid, counts = _compact_bins(mask, tiling.edge_capacity)
    cap = slots.shape[1]
    table_tile = gather_rows_mm(rows, slots)  # (n_tiles, cap, W)
    table_tile = table_tile.at[:, :, edge_row_width(c) - 1].multiply(slot_valid.astype(dtype))
    # SMEM layout: narrow axis as rows (Mosaic pads SMEM rows to ~1 KiB)
    table_tile = jnp.swapaxes(table_tile, 1, 2)  # (n_tiles, W, cap)

    # --- planar padded framebuffer views ---
    ph, pw = n_ty * th - height, n_tx * tw - width
    if cfg.error_mode:
        buf_pad = jnp.pad(buffer, [(0, ph), (0, pw)])[None]  # (1, H', W')
    else:
        buf_pad = jnp.moveaxis(jnp.pad(buffer, [(0, ph), (0, pw), (0, 0)]), -1, 0)  # (C, H', W')
    z_pad = jnp.pad(z_buffer, [(0, ph), (0, pw)], constant_values=jnp.inf)
    if cfg.error_mode and obs is not None:
        obs_pad = jnp.moveaxis(jnp.pad(obs, [(0, ph), (0, pw), (0, 0)]), -1, 0)
    else:
        obs_pad = jnp.zeros((c, n_ty * th, n_tx * tw), dtype)

    kcfg = PallasEdgeConfig(
        tile_h=th, tile_w=tw, n_ty=n_ty, n_tx=n_tx, cap=cap, nb_colors=c,
        error_mode=cfg.error_mode, interpret=interpret,
    )
    out_pad = edge_pass_pallas(kcfg, table_tile, buf_pad, z_pad, obs_pad, counts.astype(jnp.int32)[None, :])
    if cfg.error_mode:
        out = out_pad[0, :height, :width]
    else:
        out = jnp.moveaxis(out_pad, 0, -1)[:height, :width, :]
    return out, jnp.max(counts)


class EdgeTexPlan(NamedTuple):
    """Static plan for the Pallas textured edge pass.

    ``win_h``/``win_w`` bound every segment's bilinear texture taps (band uv
    lies on the segment [uv0, uv1]); edges whose uv span exceeds the window
    are pre-split into ≤ ``n_split`` collinear segments of uv length ≤
    ``uv_segment_length`` and the active segments compacted to
    ``seg_capacity`` slots (splitting a band lengthwise is exact: the
    transparency ramp is a line distance and every attribute is affine
    along the edge).
    """

    win_h: int = 16
    win_w: int = 16
    n_split: int = 1
    seg_capacity: int = 0  # 0 = no compaction (segments == edges)
    uv_segment_length: float = 12.0


def edge_pass_tiled_pallas_tex(
    cfg: EdgeAAConfig,
    buffer: jnp.ndarray,
    edges: EdgeData,
    texture: jnp.ndarray,
    z_buffer: jnp.ndarray,
    obs,
    tiling: TilingConfig,
    tex_plan: EdgeTexPlan,
    interpret: bool = False,
    checks=None,
):
    """Pallas-kernel edge-overdraw pass for textured (and mixed) scenes.

    Replaces the sequential per-edge scan (`edge_overdraw_pass[_windowed]`)
    with the per-tile VMEM painter loop: per-edge texture *windows* are
    gathered differentiably here (their autodiff transpose is the
    scatter-add back into the atlas), uv/shade are folded into affine
    (x, y, 1) coefficient rows, and the kernel samples the windows with
    soft-one-hot MXU contractions (see
    deodr_tpu/ops/pallas/edge_tex_kernel.py). Equivalent of the reference's
    textured-Gouraud edge rasterizers and adjoints (reference:
    C++/DifferentiableRenderer.h:1781-2064, :2066-2368).
    Returns (buffer, max_bin_count).
    """
    from deodr_tpu.ops.pallas.edge_tex_kernel import (
        PallasEdgeTexConfig,
        edge_pass_pallas_tex,
        tex_row_width,
    )

    height, width = cfg.height, cfg.width
    th = tiling.edge_tile_h or tiling.tile_h
    tw = tiling.tile_w
    n_ty = -(-height // th)
    n_tx = -(-width // tw)
    sigma = cfg.sigma
    dtype = buffer.dtype
    c = edges.attrs.shape[-1]
    texh, texw = texture.shape[0], texture.shape[1]

    if tex_plan.n_split > 1:
        edges = split_edges(edges, tex_plan.n_split, None, uv_segment_length=tex_plan.uv_segment_length)
        if tex_plan.seg_capacity:
            if checks is not None:
                checks.append(
                    ("texture-window segment compaction", jnp.sum(edges.active), tex_plan.seg_capacity)
                )
            edges = compact_active_edges(edges, tex_plan.seg_capacity)
    e_n = edges.v0.shape[0]

    b0c, b1c, tc, y_beg, y_end, zcoef, active = _edge_stencil_rows(cfg, edges, height)
    v0, v1 = edges.v0, edges.v1

    # --- per-edge texture windows, gathered differentiably ---
    # NOT vmapped dynamic_slice: XLA lowers that to a sequential while loop
    # of per-edge DUS steps (~3.5 ms/iter for 1024 windows on v5e). And NOT
    # a per-column rolled stack of the whole atlas (ww rolls = ww strided
    # (tex_h·tex_w, C) writes + a (…, ww, C) reshape copy: ~16 ms/iter on
    # the duck — it was 40% of the whole fwd+bwd). Instead, quantize the
    # window column origin to multiples of ww and DOUBLE the kernel window
    # width: the atlas reshaped to ww-texel blocks plus ONE block roll gives
    # a (tex_h·n_bx, 2·ww·C) "block rows" table whose row (y, bx) holds
    # texels [ww·bx : ww·bx + 2·ww] of atlas row y — any ww-wide span lies
    # inside the 2·ww window starting at its quantized origin. One fast
    # (1, minor)-slice row gather fetches each window row (E·wh rows); the
    # autodiff transpose is an equally-flat scatter-add plus dense un-rolls.
    # The kernel pays 2x wider soft-one-hot contractions — MXU work, far
    # cheaper than the HBM traffic this removes.
    wh, ww = tex_plan.win_h, tex_plan.win_w
    ww_eff = 2 * ww
    nb_c = texture.shape[2]
    n_bx = -(-texw // ww)
    texw_p = n_bx * ww
    uv_lo = jax.lax.stop_gradient(
        jnp.nan_to_num(jnp.floor(jnp.minimum(edges.uvs[:, 0], edges.uvs[:, 1])))
    )  # (E, 2) (u, v)
    toy = jnp.clip(uv_lo[:, 1], 0, max(texh - wh, 0)).astype(jnp.int32)
    tox_b = jnp.clip(uv_lo[:, 0], 0, max(texw - ww, 0)).astype(jnp.int32) // ww  # block index
    tex_p = jnp.pad(texture, [(0, 0), (0, texw_p - texw), (0, 0)]) if texw_p != texw else texture
    blocks = tex_p.reshape(texh, n_bx, ww * nb_c)
    # wrapped texels of the last block sit at window columns >= ww and are
    # never addressed (taps stop at texw - 2 <= ww·(bx+1) - 2)
    block_rows = jnp.concatenate([blocks, jnp.roll(blocks, -1, axis=1)], axis=2)
    block_rows = block_rows.reshape(texh * n_bx, ww_eff * nb_c)
    row_idx = (toy[:, None] + jnp.arange(wh, dtype=jnp.int32)[None, :]) * n_bx + tox_b[:, None]
    windows = block_rows[row_idx].reshape(e_n, wh, ww_eff, nb_c)  # (E, wh, 2ww, C)
    # kernel layout: channel-major row stacking (E, C·wh, 2ww)
    windows = jnp.moveaxis(windows, -1, 1).reshape(e_n, nb_c * wh, ww_eff)
    tox = tox_b * ww

    # --- differentiable coefficient folds (see edge_pass_tiled_pallas) ---
    a0 = edges.attrs[:, 0, :]
    a1 = edges.attrs[:, 1, :]
    acoef = b0c[:, None, :] * a0[:, :, None] + b1c[:, None, :] * a1[:, :, None]  # (E, C, 3)
    ucoef = b0c * edges.uvs[:, 0, 0:1] + b1c * edges.uvs[:, 1, 0:1]  # (E, 3)
    vcoef = b0c * edges.uvs[:, 0, 1:2] + b1c * edges.uvs[:, 1, 1:2]
    lcoef = b0c * edges.shades[:, 0:1] + b1c * edges.shades[:, 1:2]
    eid = jnp.arange(e_n, dtype=dtype)[:, None]
    i14, th14 = _transform_ineq_rows(b0c, b1c, tc, dtype)
    rows = jnp.concatenate(
        [
            i14,
            th14,
            tc,
            y_beg[:, None],
            y_end[:, None],
            acoef.reshape(e_n, 3 * c),
            zcoef,
            active.astype(dtype)[:, None],
            ucoef,
            vcoef,
            lcoef,
            toy.astype(dtype)[:, None],
            tox.astype(dtype)[:, None],
            eid,
            edges.use_texture.astype(dtype)[:, None],
        ],
        axis=1,
    )
    assert rows.shape[1] == tex_row_width(c)

    mask = _edge_band_tile_mask(
        jax.lax.stop_gradient(v0), jax.lax.stop_gradient(v1), sigma, active,
        n_ty, n_tx, th, tw, height, width,
    )
    mask = mask & _occlusion_keep_mask(edges.z, z_buffer, n_ty, n_tx, th, tw)
    slots, slot_valid, counts = _compact_bins(mask, tiling.edge_capacity)
    cap = slots.shape[1]
    table_tile = gather_rows_mm(rows, slots)  # (n_tiles, cap, W)
    from deodr_tpu.ops.pallas.edge_kernel import _e_act

    table_tile = table_tile.at[:, :, _e_act(c)].multiply(slot_valid.astype(dtype))
    table_tile = jnp.swapaxes(table_tile, 1, 2)  # (n_tiles, W, cap)

    ph, pw = n_ty * th - height, n_tx * tw - width
    if cfg.error_mode:
        buf_pad = jnp.pad(buffer, [(0, ph), (0, pw)])[None]
    else:
        buf_pad = jnp.moveaxis(jnp.pad(buffer, [(0, ph), (0, pw), (0, 0)]), -1, 0)
    z_pad = jnp.pad(z_buffer, [(0, ph), (0, pw)], constant_values=jnp.inf)
    if cfg.error_mode and obs is not None:
        obs_pad = jnp.moveaxis(jnp.pad(obs, [(0, ph), (0, pw), (0, 0)]), -1, 0)
    else:
        obs_pad = jnp.zeros((c, n_ty * th, n_tx * tw), dtype)

    kcfg = PallasEdgeTexConfig(
        tile_h=th, tile_w=tw, n_ty=n_ty, n_tx=n_tx, cap=cap, nb_colors=c,
        error_mode=cfg.error_mode, tex_h=texh, tex_w=texw, win_h=wh, win_w=ww_eff,
        n_edges=e_n, interpret=interpret,
    )
    out_pad = edge_pass_pallas_tex(
        kcfg, table_tile, windows, buf_pad, z_pad, obs_pad, counts.astype(jnp.int32)[None, :]
    )
    if cfg.error_mode:
        out = out_pad[0, :height, :width]
    else:
        out = jnp.moveaxis(out_pad, 0, -1)[:height, :width, :]
    return out, jnp.max(counts)
