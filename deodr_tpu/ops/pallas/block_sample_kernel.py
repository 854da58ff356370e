"""Pallas TPU kernel: bilinear texture sampling for the solid pass at
texture-BLOCK granularity.

The solid textured pass needs one bilinear fetch per covered textured pixel
(the per-pixel uv comes from the rasterizer's winner resolution, so unlike
the edge pass it is NOT affine per slot). The per-pixel footprint-table
gather and its scatter transpose cost ~9-14 cycles per PIXEL row on TPU
(~2.8 ms/iter on the duck's 129k covered pixels — the single largest cost
of a textured fwd+bwd step; see PERFORMANCE.md "TPU gather/scatter
reality"). This kernel moves the fetch to per-BLOCK texture windows:

* the fetch already runs on compacted 8-row × ``bw`` screen blocks that
  contain a covered textured pixel (``_finish_shading_tile_tex``). Each
  block's bilinear taps span a bounded texel region when the scene's uv
  mapping is smooth — the planner bounds the span from the per-triangle uv
  affine gradients and enables this path only when a static
  (win_h × 2·win_w) window holds every tap (reference fetch semantics:
  C++/DifferentiableRenderer.h:521-631).
* windows are gathered differentiably in XLA from a block-rows table
  (win_w-quantized column origin + doubled width — the same trick as the
  edge-pass windows, tiled.py edge_pass_tiled_pallas_tex): K·win_h gathered
  rows instead of one row per PIXEL — ~16x fewer rows on the duck.
* the 4-tap fetch per pixel is evaluated as soft-one-hot MXU contractions
  in a pixel-major (window, P = 8·bw) layout, exactly like the edge-tex
  kernel; the backward emits per-block window gradients (chained to the
  atlas through the gather's scatter transpose) and fractional-weight
  gradients (chained to uv in XLA).

Plane-row layout (inputs, per block, padded to 8 sublane rows):
  [iuw | eu | ivw | ev | unused...]   (window-local tap indices + fractions)
Sample rows (outputs): [s_0 .. s_{C-1} | unused...]
Gradient plane rows (bwd outputs): [g_eu | g_ev | unused...]

The eu/ev border-clamp gates (d eu/du = 0 where the reference clamps,
C++/DifferentiableRenderer.h:626-630) are applied by the XLA wrapper when
chaining g_eu to uv, so the kernel itself is clamp-free.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from deodr_tpu.ops.pallas import out_struct, pallas_call_vma
from jax.experimental.pallas import tpu as pltpu


class BlockSampleConfig(NamedTuple):
    n_blocks: int  # K: compacted block count (leading dim of all stacks)
    p_n: int  # pixels per block (8 * bw), multiple of 128
    nb_colors: int
    win_h: int  # texture-window rows (multiple of 8 with channels: C*win_h)
    win_w2: int  # doubled (quantized-origin) window width, multiple of 128
    interpret: bool = False


def _dotT(a, b):
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=a.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dotN(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=a.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _onehots(cfg: BlockSampleConfig, planes, dtype):
    """X/Y tap one-hots and fractional weights from the plane rows."""
    iuw = planes[0:1, :]  # (1, P) float window-local u tap
    eu = planes[1:2, :]
    ivw = planes[2:3, :]
    ev = planes[3:4, :]
    cols = jax.lax.broadcasted_iota(jnp.int32, (cfg.win_w2, cfg.p_n), 0).astype(dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (cfg.win_h, cfg.p_n), 0).astype(dtype)
    X0 = (cols == iuw).astype(dtype)
    X1 = (cols == iuw + 1.0).astype(dtype)
    Y0 = (rows == ivw).astype(dtype)
    Y1 = (rows == ivw + 1.0).astype(dtype)
    return X0, X1, eu, Y0, Y1, ev


def _sample_block(cfg, wins_ref, b, X, Y):
    """w3 = (C·win_w2, P) per-channel column contractions for block b."""
    c = cfg.nb_colors
    t2 = wins_ref[b]  # (C·wh, ww2)
    t3 = jnp.concatenate([t2[ch * cfg.win_h : (ch + 1) * cfg.win_h] for ch in range(c)], axis=1)
    w3 = _dotT(t3, Y)  # (C·ww2, P)
    svals = []
    for ch in range(c):
        svals.append(jnp.sum(X * w3[ch * cfg.win_w2 : (ch + 1) * cfg.win_w2], axis=0, keepdims=True))
    return t2, w3, svals


def _fwd_kernel(cfg: BlockSampleConfig, planes_ref, wins_ref, out_ref):
    dtype = out_ref.dtype
    c = cfg.nb_colors
    b = pl.program_id(0)
    planes = planes_ref[b]  # (8, P)
    X0, X1, eu, Y0, Y1, ev = _onehots(cfg, planes, dtype)
    X = X0 * (1.0 - eu) + X1 * eu
    Y = Y0 * (1.0 - ev) + Y1 * ev
    _, _, svals = _sample_block(cfg, wins_ref, b, X, Y)
    rows = svals + [jnp.zeros((1, cfg.p_n), dtype)] * (8 - c)
    out_ref[b] = jnp.concatenate(rows, axis=0)


def _bwd_kernel(cfg: BlockSampleConfig, planes_ref, wins_ref, g_out_ref, g_planes_ref, g_wins_ref):
    dtype = g_wins_ref.dtype
    c = cfg.nb_colors
    b = pl.program_id(0)
    planes = planes_ref[b]
    X0, X1, eu, Y0, Y1, ev = _onehots(cfg, planes, dtype)
    X = X0 * (1.0 - eu) + X1 * eu
    Y = Y0 * (1.0 - ev) + Y1 * ev
    Xd = X1 - X0
    Yd = Y1 - Y0
    t2, w3, _ = _sample_block(cfg, wins_ref, b, X, Y)
    v3 = _dotN(t2, X)  # (C·wh, P)
    g_rows = g_out_ref[b]  # (8, P): rows 0..C-1 are sample cotangents
    g_eu = jnp.zeros((1, cfg.p_n), dtype)
    g_ev = jnp.zeros((1, cfg.p_n), dtype)
    yg = []
    for ch in range(c):
        gs = g_rows[ch : ch + 1, :]  # (1, P)
        yg.append(Y * gs)
        g_eu = g_eu + gs * jnp.sum(Xd * w3[ch * cfg.win_w2 : (ch + 1) * cfg.win_w2], axis=0, keepdims=True)
        g_ev = g_ev + gs * jnp.sum(Yd * v3[ch * cfg.win_h : (ch + 1) * cfg.win_h], axis=0, keepdims=True)
    # window gradient, all channels in one contraction (see edge_tex_kernel)
    g_wins_ref[b] = jax.lax.dot_general(
        jnp.concatenate(yg, axis=0), X, (((1,), (1,)), ((), ())),
        preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    g_planes_ref[b] = jnp.concatenate(
        [g_eu, g_ev] + [jnp.zeros((1, cfg.p_n), dtype)] * 6, axis=0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def block_sample_pallas(cfg: BlockSampleConfig, planes, windows):
    """planes (K, 8, P) rows [iuw, eu, ivw, ev, 0...]; windows
    (K, C·win_h, win_w2) → samples (K, 8, P) rows [s_0..s_{C-1}, 0...].

    Differentiable in ``planes`` rows 1 and 3 (eu, ev) and ``windows``; the
    integer tap rows carry no gradient (their cotangent is returned zero).
    """
    return _fwd_call(cfg, planes, windows)


def _fwd_call(cfg, planes, windows):
    grid = (cfg.n_blocks,)
    return pallas_call_vma(
        functools.partial(_fwd_kernel, cfg),
        grid=grid,
        in_specs=[
            pl.BlockSpec(planes.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(windows.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(planes.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=out_struct(planes.shape, planes.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(planes, windows)


def _fwd(cfg, planes, windows):
    out = _fwd_call(cfg, planes, windows)
    return out, (planes, windows)


def _bwd(cfg, res, g_out):
    planes, windows = res
    grid = (cfg.n_blocks,)
    g_planes, g_windows = pallas_call_vma(
        functools.partial(_bwd_kernel, cfg),
        grid=grid,
        in_specs=[
            pl.BlockSpec(planes.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(windows.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(planes.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(planes.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(windows.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_struct(planes.shape, planes.dtype),
            out_struct(windows.shape, windows.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(planes, windows, g_out)
    return g_planes, g_windows


block_sample_pallas.defvjp(_fwd, _bwd)
