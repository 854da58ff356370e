"""Pallas TPU kernel for quad-window bilinear tap blending.

The quad-granular texture fetch (ops.common.bilinear_sample_quads) gathers
one 8×8 stride-2 texel window per 2×2 screen quad; each pixel then needs
the bilinear blend of 4 taps addressed by small integer offsets into its
quad's window. In XLA that per-pixel extraction either lowers to
Q-batched tiny dot_generals (slow on the MXU) or to broadcast-multiply
reductions that materialize (Q, 4, 8, 8, C) intermediates in HBM — both
measured several ms/frame on the duck. This kernel computes the blend
directly with quads on the LANE axis:

    out[p, c] = Σ_{r,x} a_r[p] · b_x[p] · W[(r·8+x)·C + c]
    a_r = 1[dv=r]·(1−ev) + 1[dv=r−1]·ev        (b_x likewise with du, eu)

— 64 statically-unrolled fused multiply-accumulates over (4, B) vregs, no
HBM intermediates, with the window table pre-transposed to (192, Q) so
every tap row is a fast sublane slice. The backward kernel emits the
window-table cotangent (whose XLA transpose is the 49k-row scatter back
into the table — the planned cost) and the eu/ev cotangents for uv
gradients, using d a_r/d ev = 1[dv=r−1] − 1[dv=r].

Numerics: each pixel's output is the sum of its 4 weighted taps plus
exact zeros, accumulated in a fixed (r, x) order — equal to the reference
blend ((1−eu)·t00 + eu·t10)·(1−ev) + … up to f32 summation order (≤ 2
ulp); exact in f64 interpret mode up to the same reordering.

Layouts (B = lane block of quads, P = 4 pixels/quad, C = channels):
  win_t  (192, Q)  gathered window rows, transposed, (dy,dx) major C minor
  coeffs (16, Q)   rows [dv(4) | du(4) | ev(4) | eu(4)] — offsets as f32
  out    (4C, Q)   c-major: row c·4+p
  d_e    (8, Q)    rows [d_ev(4) | d_eu(4)]
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from deodr_tpu.ops.pallas import out_struct, pallas_call_vma
from jax.experimental.pallas import tpu as pltpu


class QuadBlendConfig(NamedTuple):
    nb_colors: int
    block_q: int
    n_blocks: int
    interpret: bool = False


def _soft_rows(dv, du, ev, eu):
    """Per-axis soft one-hot factors a_r (r=0..7) and b_x (x=0..7)."""
    a = []
    b = []
    one = 1.0
    for r in range(8):
        ar = (dv == r).astype(ev.dtype) * (one - ev)
        if r >= 1:
            ar = ar + (dv == r - 1).astype(ev.dtype) * ev
        a.append(ar)
    for x in range(8):
        bx = (du == x).astype(eu.dtype) * (one - eu)
        if x >= 1:
            bx = bx + (du == x - 1).astype(eu.dtype) * eu
        b.append(bx)
    return a, b


def _fwd_kernel(cfg: QuadBlendConfig, win_ref, coef_ref, out_ref):
    c = cfg.nb_colors
    dv = coef_ref[0:4, :]
    du = coef_ref[4:8, :]
    ev = coef_ref[8:12, :]
    eu = coef_ref[12:16, :]
    a, b = _soft_rows(dv, du, ev, eu)
    acc = [jnp.zeros(dv.shape, dv.dtype) for _ in range(c)]
    for r in range(8):
        for x in range(8):
            s = a[r] * b[x]  # (4, B)
            j = r * 8 + x
            for ch in range(c):
                acc[ch] = acc[ch] + s * win_ref[j * c + ch, :][None, :]
    for ch in range(c):
        out_ref[ch * 4 : (ch + 1) * 4, :] = acc[ch]


def _bwd_kernel(cfg: QuadBlendConfig, win_ref, coef_ref, ct_ref, dwin_ref, de_ref):
    c = cfg.nb_colors
    dv = coef_ref[0:4, :]
    du = coef_ref[4:8, :]
    ev = coef_ref[8:12, :]
    eu = coef_ref[12:16, :]
    a, b = _soft_rows(dv, du, ev, eu)
    # d a_r / d ev and d b_x / d eu
    da = []
    db = []
    for r in range(8):
        d = -(dv == r).astype(ev.dtype)
        if r >= 1:
            d = d + (dv == r - 1).astype(ev.dtype)
        da.append(d)
    for x in range(8):
        d = -(du == x).astype(eu.dtype)
        if x >= 1:
            d = d + (du == x - 1).astype(eu.dtype)
        db.append(d)
    cts = [ct_ref[ch * 4 : (ch + 1) * 4, :] for ch in range(c)]
    dev = jnp.zeros(dv.shape, dv.dtype)
    deu = jnp.zeros(dv.shape, dv.dtype)
    for r in range(8):
        for x in range(8):
            j = r * 8 + x
            s = a[r] * b[x]
            wct = jnp.zeros(dv.shape, dv.dtype)
            for ch in range(c):
                w_row = win_ref[j * c + ch, :][None, :]
                # window cotangent: Σ_p s·ct  (sublane reduce 4 → 1)
                dwin_ref[j * c + ch, :] = jnp.sum(s * cts[ch], axis=0)
                wct = wct + w_row * cts[ch]
            dev = dev + da[r] * b[x] * wct
            deu = deu + a[r] * db[x] * wct
    de_ref[0:4, :] = dev
    de_ref[4:8, :] = deu


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def quad_blend(cfg: QuadBlendConfig, win_t, coeffs):
    """(win_t (192C/… rows, Q), coeffs (16, Q)) → blended (4C, Q).

    Gradients flow to win_t (→ texture via the table gather's transpose)
    and to the ev/eu rows of coeffs (→ uv); the dv/du offset rows are
    integer-valued and get zero cotangents.
    """
    return _quad_blend_call(cfg, win_t, coeffs)


def _quad_blend_call(cfg, win_t, coeffs):
    c = cfg.nb_colors
    bq = cfg.block_q
    dtype = win_t.dtype
    return pallas_call_vma(
        functools.partial(_fwd_kernel, cfg),
        grid=(cfg.n_blocks,),
        in_specs=[
            pl.BlockSpec((64 * c, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4 * c, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=out_struct((4 * c, cfg.n_blocks * bq), dtype),
        interpret=cfg.interpret,
    )(win_t, coeffs)


def _quad_blend_fwd(cfg, win_t, coeffs):
    return _quad_blend_call(cfg, win_t, coeffs), (win_t, coeffs)


def _quad_blend_bwd(cfg, res, ct):
    win_t, coeffs = res
    c = cfg.nb_colors
    bq = cfg.block_q
    dtype = win_t.dtype
    dwin, de = pallas_call_vma(
        functools.partial(_bwd_kernel, cfg),
        grid=(cfg.n_blocks,),
        in_specs=[
            pl.BlockSpec((64 * c, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * c, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((64 * c, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_struct((64 * c, cfg.n_blocks * bq), dtype),
            out_struct((8, cfg.n_blocks * bq), dtype),
        ],
        interpret=cfg.interpret,
    )(win_t, coeffs, ct)
    # coeffs cotangent: zeros for the integer offset rows, d_ev/d_eu rows
    dcoef = jnp.concatenate([jnp.zeros((8,) + de.shape[1:], dtype), de], axis=0)
    return dwin, dcoef


quad_blend.defvjp(_quad_blend_fwd, _quad_blend_bwd)
