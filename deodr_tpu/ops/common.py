"""Shared rasterization math: robust rational bounds, 3x3 inverses,
edge equations, bilinear texture sampling.

These reproduce, in vectorized jnp form, the per-triangle scalar helpers of
the reference C++ core (reference: C++/DifferentiableRenderer.h:92-631) so
that pixel coverage decisions match the reference scanline rasterizer
exactly — including its behavior for degenerate (vertical/horizontal) edge
equations via the ``floor_div``/``ceil_div`` zero-denominator semantics
(reference: C++/DifferentiableRenderer.h:440-519).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gather_rows_mm(x, idx):
    """``x[idx]`` with a matmul adjoint.

    The autodiff transpose of a gather is a scatter-add, which TPUs execute
    at ~11-14 cycles per row plus a large fixed cost (measured on v5e; see
    PERFORMANCE.md); for the tiled rasterizer's table gathers (a few
    thousand rows into a few hundred) the equivalent one-hot MXU contraction
    is several times faster, while for large index sets the backward
    switches to a plain scatter-add (the one-hot operand itself becomes the
    cost). Forward is a plain gather. HIGHEST precision keeps the f32
    cotangents exact (default TPU dot precision would round them to bf16).
    """
    # NOTE: the convert-pair fusion hint that speeds bilinear_sample's
    # footprint gather was tried here too and is NOT folded in this
    # context (table values genuinely quantize to bf16 — bench image
    # changed by 2.4) with no speed gain; do not reapply.
    return x[idx]


def _gather_rows_mm_fwd(x, idx):
    return x[idx], (idx, x.shape)


def _gather_rows_mm_bwd(res, ct):
    idx, x_shape = res
    n_rows = x_shape[0]
    idx_flat = idx.reshape(-1)
    n = idx_flat.shape[0]
    d = 1
    for s in x_shape[1:]:
        d *= int(s)
    if n == 0 or d == 0:
        return jnp.zeros(x_shape, ct.dtype), None
    ct_flat = ct.reshape(n, d)
    if n * n_rows <= (1 << 22):
        onehot = (idx_flat[:, None] == jnp.arange(n_rows, dtype=idx_flat.dtype)[None, :]).astype(ct_flat.dtype)
        g = jnp.einsum("nr,nd->rd", onehot, ct_flat, precision=jax.lax.Precision.HIGHEST)
        return g.reshape(x_shape), None
    if n_rows <= 4096:
        # mid-size tables, many slots (e.g. the per-tile affine-table gather:
        # ~77k slots into ~2k triangle rows): a scatter-add pays ~9-14ns per
        # slot row (0.7 ms at 77k); chunked one-hot contractions pay
        # O(n·n_rows) compares on the VPU + an MXU matmul per chunk with a
        # bounded (chunk × n_rows) operand — ~2x faster at these shapes
        chunk = max(1, (1 << 24) // n_rows)
        pad = (-n) % chunk
        idx_p = jnp.pad(idx_flat, (0, pad), constant_values=n_rows)  # out-of-range → all-zero one-hot row
        ct_p = jnp.pad(ct_flat, ((0, pad), (0, 0)))
        nb = idx_p.shape[0] // chunk
        idx_c = idx_p.reshape(nb, chunk)
        ct_c = ct_p.reshape(nb, chunk, d)
        rows = jnp.arange(n_rows, dtype=idx_flat.dtype)
        if n * n_rows <= (1 << 29):
            # XLA fuses the one-hot comparison into the dot emitter at these
            # shapes (the duck's 134k-slot × 2k-row affine gather measures
            # 0.38 ms as ONE fused dot), so the logical one-hot is not
            # materialized; keep the single batched einsum up to 2^29
            # elements and reserve the scan for genuinely huge slot counts
            onehot = (idx_c[:, :, None] == rows[None, None, :]).astype(ct_flat.dtype)
            g = jnp.einsum("bnr,bnd->rd", onehot, ct_c, precision=jax.lax.Precision.HIGHEST)
            return g.reshape(x_shape), None

        # genuinely bounded memory for huge slot counts: a sequential scan
        # materializes only ONE (chunk, n_rows) one-hot at a time while the
        # accumulator stays (n_rows, d) — peak HBM is O(chunk·n_rows), not
        # O(n·n_rows), at the cost of nb serialized MXU matmuls
        def _acc(g, xs):
            idx_b, ct_b = xs
            onehot_b = (idx_b[:, None] == rows[None, :]).astype(ct_flat.dtype)
            return (
                g
                + jnp.einsum(
                    "nr,nd->rd", onehot_b, ct_b, precision=jax.lax.Precision.HIGHEST
                ),
                None,
            )

        g, _ = jax.lax.scan(_acc, jnp.zeros((n_rows, d), ct_flat.dtype), (idx_c, ct_c))
        return g.reshape(x_shape), None
    # huge tables: the one-hot operand itself is O(n·n_rows) element ops,
    # while the scatter-add touches only the n gathered rows — the better
    # trade despite the TPU's ~11-14 cycles/row scatter cost
    g = jnp.zeros((n_rows, d), ct_flat.dtype).at[idx_flat].add(ct_flat)
    return g.reshape(x_shape), None


gather_rows_mm.defvjp(_gather_rows_mm_fwd, _gather_rows_mm_bwd)


def match_vma(init, *refs):
    """Stamp ``init``'s leaves with the union of ``refs``' varying-mesh-axes.

    Under ``shard_map(..., check_vma=True)`` a ``lax.scan`` carry must keep
    the same varying-manual-axes (vma) type on every iteration. A carry
    initialized from constants is *unvarying*, but a body that folds in
    device-sharded data produces a *varying* carry — a type mismatch even
    though the computation is purely shard-local. This pre-stamps the init
    as varying over whatever axes the actual data varies on (a no-op
    ``pcast``, no communication). Outside shard_map it returns ``init``
    untouched, so call sites stay shared with unsharded paths.
    """
    vma = frozenset()
    for r in refs:
        for leaf in jax.tree.leaves(r):
            vma |= getattr(jax.typeof(leaf), "vma", None) or frozenset()
    if not vma:
        return init
    axes = tuple(sorted(vma))
    return jax.tree.map(lambda x: jax.lax.pcast(x, axes, to="varying"), init)


def floor_div(num, den, lo, hi):
    """min(hi, max(lo, floor(num/den))) with the reference's den==0 semantics:
    returns hi when num <= 0 else lo (reference:
    C++/DifferentiableRenderer.h:440-476)."""
    q = jnp.floor(num / jnp.where(den == 0, 1.0, den))
    q = jnp.clip(q, lo, hi)
    q0 = jnp.where(num <= 0, hi, lo)
    return jnp.where(den == 0, q0, q)


def ceil_div(num, den, lo, hi):
    """min(hi, max(lo, ceil(num/den))) with the reference's den==0 semantics:
    returns hi when num < 0 else lo (reference:
    C++/DifferentiableRenderer.h:478-519)."""
    q = jnp.ceil(num / jnp.where(den == 0, 1.0, den))
    q = jnp.clip(q, lo, hi)
    q0 = jnp.where(num < 0, hi, lo)
    return jnp.where(den == 0, q0, q)


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form cofactor inverse of (..., 3, 3) matrices.

    Differentiable; jax.grad through it reproduces the reference's
    hand-written ``inv_matrix_3x3_B`` adjoint (reference:
    C++/DifferentiableRenderer.h:92-232).
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    adj = jnp.stack(
        [
            jnp.stack([co00, co01, co02], axis=-1),
            jnp.stack([co10, co11, co12], axis=-1),
            jnp.stack([co20, co21, co22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def edge_equations(v_xy: jnp.ndarray, local_clockwise: jnp.ndarray) -> jnp.ndarray:
    """Per-triangle edge line equations a·x + b·y + c = 0 with the interior on
    the positive side, for edges (v0,v1), (v1,v2), (v2,v0).

    ``local_clockwise`` is the *screen-space* winding of each triangle (sign
    of its raw cross product), independent of the scene's winding convention
    (reference: C++/DifferentiableRenderer.h:373-398, :655).

    v_xy: (..., 3, 2) → returns (..., 3, 3).
    """
    v1 = v_xy
    v2 = jnp.roll(v_xy, -1, axis=-2)  # (v1, v2, v0)
    sign = jnp.where(local_clockwise[..., None], 1.0, -1.0)
    a = sign * (v1[..., 1] - v2[..., 1])
    b = sign * (v2[..., 0] - v1[..., 0])
    c = -0.5 * (a * (v1[..., 0] + v2[..., 0]) + b * (v1[..., 1] + v2[..., 1]))
    return jnp.stack([a, b, c], axis=-1)


def signed_area(v_xy: jnp.ndarray, clockwise: bool) -> jnp.ndarray:
    """0.5 · cross(v1-v0, v2-v0), positive for front-facing triangles under
    the scene's winding convention (reference:
    C++/DifferentiableRenderer.h:391-399)."""
    u = v_xy[..., 1, :] - v_xy[..., 0, :]
    v = v_xy[..., 2, :] - v_xy[..., 0, :]
    raw = 0.5 * (u[..., 0] * v[..., 1] - v[..., 0] * u[..., 1])
    return raw if clockwise else -raw


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(1,))
def _footprint_table(tf: jnp.ndarray, tw: int) -> jnp.ndarray:
    """Bilinear footprint table: row i = [tex[i] | tex[i+1] | tex[i+tw] |
    tex[i+tw+1]] for the flat (th·tw, C) texture ``tf``.

    Forward is three dense rolls + a concat (wrapped rows are never fetched:
    callers clamp to iu ≤ tw-2, iv ≤ th-2). The hand-written transpose
    replaces XLA's lowering of the rolls'/concat's adjoint — lane-sliced
    splits of the (N, 4C) cotangent plus un-rolls, ~2 ms/iter on a 512²
    atlas because every (N, k<128) slice strides the padded T(8,128) lanes —
    with four row-rolls (dense, row-granular) contracted against one-hot
    (4C, C) selectors on the MXU.
    """
    return jnp.concatenate(
        [tf, jnp.roll(tf, -1, 0), jnp.roll(tf, -tw, 0), jnp.roll(tf, -tw - 1, 0)], axis=1
    )


def _footprint_table_fwd(tf, tw):
    return _footprint_table(tf, tw), ()


def _footprint_table_bwd(tw, res, ct):
    # one (N, 4, C) -> (4, N, C) transpose, then free leading-dim slices +
    # row-rolls. The tap split must NOT be lane-strided slices of (N, 4C)
    # (each (N, k<128) slice strides the padded T(8,128) lanes: ~2 ms/iter
    # on a 512^2 atlas); the previous fix — 4 one-hot (4C, C) sel-matmuls on
    # the MXU — cost ~0.74 ms/iter on the duck, while this single dense
    # transpose is memory-bound. A 2x2 conv formulation was also tried and
    # REGRESSED (11.4 -> 12.4 ms); see PERFORMANCE.md "in-loop emitter gap".
    del res
    # a convert-pair hint on this cotangent (after the scatter-add) folds
    # like the forward one but does NOT speed the scatter (duck 9.6 vs 9.5)
    # — the flip only triggers on the gather side; not applied.
    n, c = ct.shape[0], ct.shape[1] // 4
    ct4 = jnp.moveaxis(ct.reshape(n, 4, c), 1, 0)  # (4, N, C)
    g = ct4[0]
    for k, shift in enumerate((1, tw, tw + 1)):
        g = g + jnp.roll(ct4[k + 1], shift, 0)
    return (g,)


_footprint_table.defvjp(_footprint_table_fwd, _footprint_table_bwd)


# tri-state cache for the on-TPU convert-pair fold probe: None = not yet
# probed; True = the pair folds (bitwise no-op, hint safe); False = it does
# NOT fold (the hint would genuinely quantize texels to bf16 — disabled)
_FUSE_HINT_OK = None


def _probe_fuse_hint() -> bool:
    """One-time on-device check that XLA folds the f32→bf16→f32 convert pair
    around the bilinear footprint table (see ``bilinear_sample``).

    Renders a small textured probe with the hint forced ON vs OFF — forward
    sample AND texture gradient — and requires bitwise equality. The hint is
    load-bearing for performance only; if an XLA/jax upgrade stops folding
    the pair, this auto-disables it (loud warning) instead of silently
    quantizing every texel, which the CPU-pinned CI could never catch
    (reference texel-exactness contract: readme.md "Texel coordinates";
    reference: C++/DifferentiableRenderer.h:521-560).
    """
    global _FUSE_HINT_OK
    if _FUSE_HINT_OK is None:
        import numpy as np

        rng = np.random.RandomState(7)
        tex = rng.rand(16, 256, 3).astype(np.float32)
        # interior + border + exact-integer coordinates, pixel-shaped like a
        # small framebuffer so the gather/scatter structure matches real use
        p = (rng.rand(8, 128, 2) * np.array([257.0, 17.0]) - 1.0).astype(np.float32)
        w = rng.rand(8, 128, 3).astype(np.float32)

        def run(force, t_in, p_in, w_in):
            def loss(t):
                s = bilinear_sample(t, p_in, _force_fuse_hint=force)
                return jnp.sum(s * w_in), s

            (_, s), g = jax.value_and_grad(loss, has_aux=True)(t_in)
            return s, g

        # the first textured render is usually being TRACED (a jitted loss,
        # a .lower(), ...): jit-inside-trace binds as an outer-trace
        # primitive and returns tracers, so the byte comparison below would
        # throw. AOT lower+compile with ShapeDtypeStructs and execute with
        # NUMPY arguments — a compiled call with concrete args runs
        # immediately, independent of any ambient trace.
        try:
            structs = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in (tex, p, w))

            def aot(force):
                fn = jax.jit(lambda t, pp, ww: run(force, t, pp, ww))
                return fn.lower(*structs).compile()(tex, p, w)

            s_on, g_on = aot(True)
            s_off, g_off = aot(False)
            same = (
                np.asarray(s_on).tobytes() == np.asarray(s_off).tobytes()
                and np.asarray(g_on).tobytes() == np.asarray(g_off).tobytes()
            )
        except Exception as e:  # pragma: no cover - probe must never break renders
            import warnings

            warnings.warn(f"texture fuse-hint probe failed ({e!r}); hint disabled")
            same = False
        if not same:
            import warnings

            warnings.warn(
                "XLA no longer folds the f32->bf16->f32 convert pair around the "
                "bilinear footprint table: the texture fuse hint would quantize "
                "texels and has been DISABLED for this process (expect ~10-15% "
                "slower textured renders; see deodr_tpu/ops/common.py)"
            )
        _FUSE_HINT_OK = bool(same)
    return _FUSE_HINT_OK


@jax.custom_vjp
def _foot_gather_bitcast(foot: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``foot[idx]`` through a u32 bitcast view — bitwise exact.

    Experiment knob for the in-loop gather emitter form (see
    ``bilinear_sample``): the f32→bf16→f32 convert-pair hint flips XLA's
    in-loop footprint gather from ~11.6 to ~2 cycles/row but quantizes
    texels in grad graphs (round-5 probe); a bitcast view perturbs the same
    fusion boundary while being a bit-identical no-op in EVERY graph. The
    backward is the same flat scatter-add XLA's gather transpose emits.
    """
    u = jax.lax.bitcast_convert_type(foot, jnp.uint32)
    return jax.lax.bitcast_convert_type(u[idx], foot.dtype)


def _foot_gather_bitcast_fwd(foot, idx):
    return _foot_gather_bitcast(foot, idx), (idx, foot.shape)


def _foot_gather_bitcast_bwd(res, ct):
    idx, foot_shape = res
    g = jnp.zeros(foot_shape, ct.dtype).at[idx].add(ct)
    return g, None


_foot_gather_bitcast.defvjp(_foot_gather_bitcast_fwd, _foot_gather_bitcast_bwd)


def bilinear_sample(
    texture: jnp.ndarray, p: jnp.ndarray, _force_fuse_hint: "Optional[bool]" = None
) -> jnp.ndarray:
    """Bilinear texture fetch with integer texel centers and border clamp.

    ``p[..., 0]`` indexes columns (u), ``p[..., 1]`` rows (v); the sample at
    (0.0, 0.0) is exactly texture[0, 0] (reference conventions: readme.md
    "Texel coordinates"; reference: C++/DifferentiableRenderer.h:521-560).
    The gradient w.r.t. clamped coordinates is zero outside the texture
    domain, matching the reference adjoint's ``out`` guard (reference:
    C++/DifferentiableRenderer.h:626-630). Unlike the reference adjoint —
    which *overwrites* per-texel gradients across pixels (reference:
    C++/DifferentiableRenderer.h:621-624 uses ``=`` instead of ``+=``) —
    jax.grad of this function correctly accumulates texture gradients.
    """
    th, tw = texture.shape[0], texture.shape[1]
    u = p[..., 0]
    v = p[..., 1]
    fu = jnp.floor(u)
    fv = jnp.floor(v)
    eu = jnp.where(fu < 0, 0.0, jnp.where(fu > tw - 2, 1.0, u - fu))
    ev = jnp.where(fv < 0, 0.0, jnp.where(fv > th - 2, 1.0, v - fv))
    iu = jnp.clip(fu, 0, tw - 2).astype(jnp.int32)
    iv = jnp.clip(fv, 0, th - 2).astype(jnp.int32)
    # TPU gathers cost ~11 cycles per ROW regardless of row width, and only
    # (1, minor)-slice gathers take XLA's fast path (any wider slice shape
    # falls into a ~50x-slower emulation). So: build a "footprint" table
    # whose row i holds all four bilinear taps [tex[i] | tex[i+1] |
    # tex[i+tw] | tex[i+tw+1]] with three cheap dense rolls, and fetch the
    # whole 2x2 footprint with ONE row gather per pixel — 4x fewer gather
    # rows than per-tap gathers, and the transpose is an equally-flat 4x
    # smaller scatter-add followed by the table's matmul un-build.
    c = texture.shape[2]
    tf = texture.reshape(-1, c)
    foot = _footprint_table(tf, tw)  # (th·tw, 4C)
    import os

    use_hint = _force_fuse_hint
    if use_hint is None:
        use_hint = (
            foot.dtype == jnp.float32
            and jax.default_backend() == "tpu"
            and not os.environ.get("DEODR_NO_TEX_FUSE_HINT")
            # one-time bitwise fold probe (concrete, runs at trace time):
            # auto-disables the hint if XLA ever stops folding the pair
            and _probe_fuse_hint()
        )
    if use_hint:
        # f32→bf16→f32 convert pair around the table: when XLA:TPU folds it
        # (bitwise no-op) the pair still flips the in-loop footprint gather
        # from its ~11.6 cycles/row slow form to the ~2 cycles/row fast form
        # (duck 10.6 → 9.5 ms/iter). Round 5's probe found the fold is
        # GRAPH-DEPENDENT in exactly the way that matters: on the current
        # XLA it folds in forward-only renders (duck image bitwise equal)
        # but NOT inside value_and_grad graphs — the fitting loss and every
        # gradient were computed from bf16-quantized texels (duck loss off
        # by 4.4, shade grad by 0.83). _probe_fuse_hint therefore probes a
        # GRADIENT graph and auto-disables the hint (the current state).
        # Exact alternatives were measured and rejected: two half-width
        # tables 16.3 ms, per-tap gathers 23.4 ms vs 10.6 plain / 9.5 hint.
        # If a future XLA folds the pair in grad graphs again, the probe
        # re-enables the win automatically. DEODR_NO_TEX_FUSE_HINT=1 forces
        # it off.
        foot = foot.astype(jnp.bfloat16)
    idx = iv * tw + iu
    gather_mode = os.environ.get("DEODR_TEX_GATHER", "plain")
    if gather_mode == "bitcast" and foot.dtype == jnp.float32:
        taps = _foot_gather_bitcast(foot, idx)
    elif gather_mode == "barrier":
        taps = jax.lax.optimization_barrier(foot)[idx].astype(texture.dtype)
    else:
        taps = foot[idx].astype(texture.dtype)  # (..., 4C)
    t00 = taps[..., 0 * c : 1 * c]
    t10 = taps[..., 1 * c : 2 * c]
    t01 = taps[..., 2 * c : 3 * c]
    t11 = taps[..., 3 * c : 4 * c]
    w_eu = eu[..., None]
    w_ev = ev[..., None]
    return ((1 - w_eu) * t00 + w_eu * t10) * (1 - w_ev) + ((1 - w_eu) * t01 + w_eu * t11) * w_ev


def bilinear_sample_window(tex_win: jnp.ndarray, p: jnp.ndarray, origin, full_hw) -> jnp.ndarray:
    """:func:`bilinear_sample` against a window of the full texture.

    ``tex_win`` is ``texture[origin[0]:origin[0]+wh, origin[1]:origin[1]+ww]``;
    ``p`` stays in full-texture coordinates and clamping is done against the
    full texture's borders (``full_hw``), so results are identical to
    ``bilinear_sample(texture, p)`` provided the window contains all four
    taps of every sample (the caller sizes the window accordingly).
    """
    th, tw = full_hw
    u = p[..., 0]
    v = p[..., 1]
    fu = jnp.floor(u)
    fv = jnp.floor(v)
    eu = jnp.where(fu < 0, 0.0, jnp.where(fu > tw - 2, 1.0, u - fu))
    ev = jnp.where(fv < 0, 0.0, jnp.where(fv > th - 2, 1.0, v - fv))
    iu = jnp.clip(fu, 0, tw - 2).astype(jnp.int32) - origin[1]
    iv = jnp.clip(fv, 0, th - 2).astype(jnp.int32) - origin[0]
    wh, ww = tex_win.shape[0], tex_win.shape[1]
    iu = jnp.clip(iu, 0, ww - 2)
    iv = jnp.clip(iv, 0, wh - 2)
    # flat row gathers: see bilinear_sample
    win_flat = tex_win.reshape(-1, tex_win.shape[2])
    base = iv * ww + iu
    t00 = win_flat[base]
    t10 = win_flat[base + 1]
    t01 = win_flat[base + ww]
    t11 = win_flat[base + ww + 1]
    w_eu = eu[..., None]
    w_ev = ev[..., None]
    return ((1 - w_eu) * t00 + w_eu * t10) * (1 - w_ev) + ((1 - w_eu) * t01 + w_eu * t11) * w_ev


def quad_window_table(texture: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 8×8 texel window table for quad-granular bilinear fetches.

    Row (bv, bu) holds ``texture[2bv : 2bv+8, 2bu : 2bu+8]`` flattened to
    (8·8·C,), zero-padded past the texture borders (padded texels are never
    selected: bilinear taps are clamped to the real texture domain and the
    per-pixel one-hot extraction only addresses tap offsets).

    Why stride 2 / window 8: a window at an even origin ``2⌊iu_min/2⌋``
    covers any set of taps whose span is ≤ 6 texels — which holds for the
    taps of a whole 2×2 *screen-pixel quad* at typical texel densities
    (measured 97.6% of covered quads on the duck scene). Fetching one
    window row per QUAD instead of one footprint row per PIXEL cuts the
    gather/scatter row count 4× — the dominant per-row cost of a textured
    solid pass on TPU (see PERFORMANCE.md). The build is 64 strided slices
    (dense, no gather); its autodiff transpose sums 64 dilated pads.
    """
    th, tw, c = texture.shape
    texp = jnp.pad(texture, ((0, 6), (0, 6), (0, 0)))
    n_bv, n_bu = th // 2, tw // 2
    rows = []
    for dy in range(8):
        for dx in range(8):
            rows.append(
                jax.lax.slice(
                    texp, (dy, dx, 0), (dy + 2 * n_bv - 1, dx + 2 * n_bu - 1, c), (2, 2, 1)
                )
            )
    # (n_bv, n_bu, 64, C) with (dy, dx) major → flatten to (n_bv·n_bu, 192)
    table = jnp.stack(rows, axis=2)
    return table.reshape(n_bv * n_bu, 64 * c)


def bilinear_sample_quads(
    texture: jnp.ndarray,
    uv_q: jnp.ndarray,
    mask_q: jnp.ndarray,
    fallback_capacity: int,
    checks=None,
    table: jnp.ndarray = None,
    use_kernel: bool = False,
    interpret: bool = False,
):
    """Bilinear texture fetch with one window-table row per 2×2 pixel quad.

    ``uv_q``: (Q, 4, 2) pixel uv grouped by screen quad; ``mask_q``: (Q, 4)
    bool, pixels that actually consume their sample (the rest get an
    arbitrary in-window value — callers mask them out). Returns (Q, 4, C).

    Exact per pixel: the taps are the same texel values as
    :func:`bilinear_sample` (read from the window table instead of the
    footprint table) and the result equals its blend up to f32 summation
    order (bit-identical on the XLA path; ≤ 2 ulp on the kernel path,
    whose fused soft-one-hot accumulation sums the 4 weighted taps in a
    fixed tap order — see ops/pallas/quad_blend_kernel.py). Quads whose
    taps span more than 6 texels (uv seams, strong minification) are
    re-fetched pixel-by-pixel through a compacted fallback list of static
    ``fallback_capacity``; quads beyond that capacity keep the (wrong)
    clamped-window sample — a capacity event, surfaced via ``checks`` like
    every other static bin capacity.

    ``use_kernel`` routes the main pass through the Pallas blend kernel
    (the production TPU path); the XLA extraction otherwise.
    """
    th, tw, c = texture.shape
    n_bu = tw // 2
    q = uv_q.shape[0]
    if table is None:
        table = quad_window_table(texture)

    u = uv_q[..., 0]
    v = uv_q[..., 1]
    fu = jnp.floor(u)
    fv = jnp.floor(v)
    # border rules identical to bilinear_sample
    eu = jnp.where(fu < 0, 0.0, jnp.where(fu > tw - 2, 1.0, u - fu))
    ev = jnp.where(fv < 0, 0.0, jnp.where(fv > th - 2, 1.0, v - fv))
    iu = jnp.clip(fu, 0, tw - 2).astype(jnp.int32)  # (Q, 4)
    iv = jnp.clip(fv, 0, th - 2).astype(jnp.int32)

    big_u = jnp.int32(tw - 2)
    big_v = jnp.int32(th - 2)
    iu_eff = jnp.where(mask_q, iu, big_u)
    iv_eff = jnp.where(mask_q, iv, big_v)
    org_u = 2 * (jnp.min(iu_eff, axis=1) // 2)  # (Q,)
    org_v = 2 * (jnp.min(iv_eff, axis=1) // 2)
    du = iu - org_u[:, None]  # (Q, 4), ≥ 0 for masked pixels
    dv = iv - org_v[:, None]
    bad = jnp.any(mask_q & ((du > 6) | (dv > 6)), axis=1)  # (Q,)
    du_c = jnp.clip(du, 0, 6)
    dv_c = jnp.clip(dv, 0, 6)

    rows = (org_v // 2) * n_bu + (org_u // 2)

    def extract(win_q, dv_p, du_p, ev_p, eu_p):
        # Hard one-hot tap extraction: sums of zeros plus the tap value, so
        # results equal direct indexing exactly in any float dtype.
        # Expressed as broadcast-multiply + jnp.sum (NOT einsum): einsum
        # lowers to size-(Q)-batched tiny dot_generals on TPU — both slow
        # (MXU at batch 49k × 8×8 operands) and bf16-rounding at default
        # precision; the mul+reduce form fuses on the VPU and is exact.
        offs = jnp.arange(8, dtype=jnp.int32)
        dt = win_q.dtype
        oh_u0 = (du_p[..., None] == offs).astype(dt)  # (Q, P, 8)
        oh_u1 = (du_p[..., None] + 1 == offs).astype(dt)
        oh_v0 = (dv_p[..., None] == offs).astype(dt)
        oh_v1 = (dv_p[..., None] + 1 == offs).astype(dt)
        winb = win_q[:, None]  # (Q, 1, 8(dy), 8(dx), C)
        wu0 = jnp.sum(oh_u0[:, :, None, :, None] * winb, axis=3)  # (Q, P, 8, C)
        wu1 = jnp.sum(oh_u1[:, :, None, :, None] * winb, axis=3)
        t00 = jnp.sum(oh_v0[..., None] * wu0, axis=2)  # (Q, P, C)
        t10 = jnp.sum(oh_v0[..., None] * wu1, axis=2)
        t01 = jnp.sum(oh_v1[..., None] * wu0, axis=2)
        t11 = jnp.sum(oh_v1[..., None] * wu1, axis=2)
        w_eu = eu_p[..., None]
        w_ev = ev_p[..., None]
        return ((1 - w_eu) * t00 + w_eu * t10) * (1 - w_ev) + (
            (1 - w_eu) * t01 + w_eu * t11
        ) * w_ev

    if use_kernel:
        from deodr_tpu.ops.pallas.quad_blend_kernel import QuadBlendConfig, quad_blend

        bq = 512
        qp = -(-q // bq) * bq
        pad = qp - q
        win_rows = table[rows]  # (Q, 192) — the ONE per-quad row gather
        win_t = jnp.pad(win_rows, ((0, pad), (0, 0))).T  # (192C-wide rows, Qp)

        def t4(a):
            return jnp.pad(a.T.astype(texture.dtype), ((0, 0), (0, pad)))

        coeffs = jnp.concatenate([t4(dv_c), t4(du_c), t4(ev), t4(eu)], axis=0)
        cfg = QuadBlendConfig(nb_colors=c, block_q=bq, n_blocks=qp // bq, interpret=interpret)
        out = quad_blend(cfg, win_t, coeffs)  # (4C, Qp), c-major rows
        samples = out.reshape(c, 4, qp)[:, :, :q].transpose(2, 1, 0)  # (Q, 4, C)
    else:
        win = table[rows].reshape(q, 8, 8, c)  # (Q, dy, dx, C)
        samples = extract(win, dv_c, du_c, ev, eu)  # (Q, 4, C)

    if fallback_capacity <= 0:
        return samples

    if checks is not None:
        checks.append(("quad-fetch fallback compaction", jnp.sum(bad), fallback_capacity))

    # compact the oversize quads and re-fetch their pixels individually:
    # a single pixel's taps span 1 texel, so a per-pixel even origin always
    # fits the window
    from deodr_tpu.ops.tiled import _compact_bins

    cap_b = min(fallback_capacity, q)
    ids_row, valid_row, _ = _compact_bins(bad[None, :], cap_b)
    ids, valid = ids_row[0], valid_row[0]

    iu_f = iu[ids]  # (B, 4) — integer index gathers (no gradient)
    iv_f = iv[ids]
    eu_f = eu[ids]  # differentiable gathers: small, scatter-add transpose
    ev_f = ev[ids]
    org_u_f = 2 * (iu_f // 2)
    org_v_f = 2 * (iv_f // 2)
    rows_f = (org_v_f // 2) * n_bu + (org_u_f // 2)  # (B, 4)
    win_f = table[rows_f.reshape(-1)].reshape(cap_b * 4, 8, 8, c)
    samples_f = extract(
        win_f,  # (B·4, 8, 8, C) with one "pixel" (p=1) per window
        (iv_f - org_v_f).reshape(-1, 1),
        (iu_f - org_u_f).reshape(-1, 1),
        ev_f.reshape(-1, 1),
        eu_f.reshape(-1, 1),
    ).reshape(cap_b, 4, c)
    # zero invalid slots so no gradient leaks through their (quad-0) gathers
    samples_f = samples_f * valid[:, None, None].astype(samples_f.dtype)
    ids_safe = jnp.where(valid, ids, q)  # dummy row for unused slots
    padded = jnp.concatenate([samples, jnp.zeros((1, 4, c), samples.dtype)], axis=0)
    return padded.at[ids_safe].set(samples_f)[:q]


def safe_barycentric_matrices(v_xy: jnp.ndarray):
    """Numerically-stable :func:`barycentric_matrices` that cannot produce
    inf/NaN. Returns ``(inv, valid)``.

    Two failure modes of the cofactor form in fp32, both observed to poison
    whole fitting runs with NaN:

    - the cofactor determinant of [[x],[y],[1]] subtracts O(coord²) products
      that cancel to O(area); for a sliver triangle the true area can sit
      far below the rounding noise (coords ~250 → noise ~7e-3 in fp32), so
      the computed det rounds to exactly 0 and the inverse is inf — which
      NaNs the *forward* z/attribute rows (inf·a − inf·b). Computing from
      edge **differences** (b1 = (e2y·(x−x0) − e2x·(y−y0))/det with
      det = e1×e2) keeps every operand at O(edge length), eliminating the
      large-coordinate cancellation.
    - a singular/near-singular inverse, even when every use is masked,
      poisons reverse-mode (the division's VJP multiplies the zero cotangent
      by 1/det² = inf; 0·inf = NaN). Degenerate triangles are substituted
      by a canonical unit triangle BEFORE any division; ``valid`` is false
      where the area is non-finite or below the fp cancellation noise of
      the cross product (such triangles cover no pixels — callers must
      exclude them from coverage, as the z-buffer setup does).
    """
    use_cofactor = jnp.finfo(v_xy.dtype).bits >= 64
    e1 = v_xy[..., 1, :] - v_xy[..., 0, :]
    e2 = v_xy[..., 2, :] - v_xy[..., 0, :]
    det = e1[..., 0] * e2[..., 1] - e2[..., 0] * e1[..., 1]
    eps = jnp.finfo(v_xy.dtype).eps
    noise = 100.0 * eps * jnp.sqrt(jnp.sum(e1 * e1, axis=-1) * jnp.sum(e2 * e2, axis=-1))
    if use_cofactor:
        # the cofactor det subtracts O(coord²) products, so its noise floor
        # scales with the coordinates, not the edge lengths
        noise = jnp.maximum(noise, 100.0 * eps * jnp.max(jnp.sum(v_xy * v_xy, axis=-1), axis=-1))
    valid = jax.lax.stop_gradient(
        jnp.isfinite(det)
        & (jnp.abs(det) > noise)
        & jnp.all(jnp.isfinite(v_xy), axis=(-2, -1))
    )
    canon = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], v_xy.dtype)
    safe = jnp.where(valid[..., None, None], v_xy, canon)
    if use_cofactor:
        # f64's cancellation noise (~1e-11 at image coordinates) sits far
        # below any sliver that rasterizes; keep the cofactor form so f64
        # results (and the golden fitting trajectories, which heavy-ball
        # amplification makes ulp-sensitive) match the reference exactly
        return barycentric_matrices(safe), valid
    x0, y0 = safe[..., 0, 0], safe[..., 0, 1]
    e1 = safe[..., 1, :] - safe[..., 0, :]
    e2 = safe[..., 2, :] - safe[..., 0, :]
    det = e1[..., 0] * e2[..., 1] - e2[..., 0] * e1[..., 1]
    row1 = jnp.stack([e2[..., 1], -e2[..., 0], e2[..., 0] * y0 - e2[..., 1] * x0], axis=-1) / det[..., None]
    row2 = jnp.stack([-e1[..., 1], e1[..., 0], e1[..., 1] * x0 - e1[..., 0] * y0], axis=-1) / det[..., None]
    one = jnp.zeros_like(row1).at[..., 2].set(1.0)
    row0 = one - row1 - row2
    return jnp.stack([row0, row1, row2], axis=-2), valid


def bilinear_sample_window_mxu(tex_win: jnp.ndarray, p: jnp.ndarray, origin, full_hw) -> jnp.ndarray:
    """:func:`bilinear_sample_window` expressed as soft-one-hot matmuls.

    The 4-tap bilinear fetch is ``sample[p] = Y[p,:] @ T @ X[p,:]^T`` with
    *soft* one-hots ``Y[p, r] = (1-ev)·1[iv=r] + ev·1[iv+1=r]`` (and X
    likewise in u) — one MXU contraction instead of 8 serialized gathers,
    and its autodiff transpose is the exact bilinear scatter-adjoint as a
    matmul (TPU gathers/scatters run ~1 row/cycle; these shapes hit the MXU).
    Numerically identical to the gather form in f32 (precision=HIGHEST).
    """
    th, tw = full_hw
    shape = p.shape[:-1]
    u = p[..., 0].reshape(-1)
    v = p[..., 1].reshape(-1)
    fu = jnp.floor(u)
    fv = jnp.floor(v)
    eu = jnp.where(fu < 0, 0.0, jnp.where(fu > tw - 2, 1.0, u - fu))
    ev = jnp.where(fv < 0, 0.0, jnp.where(fv > th - 2, 1.0, v - fv))
    wh, ww = tex_win.shape[0], tex_win.shape[1]
    iu = jnp.clip(jnp.clip(fu, 0, tw - 2).astype(jnp.int32) - origin[1], 0, ww - 2)
    iv = jnp.clip(jnp.clip(fv, 0, th - 2).astype(jnp.int32) - origin[0], 0, wh - 2)
    cols = jnp.arange(ww, dtype=jnp.int32)
    rows = jnp.arange(wh, dtype=jnp.int32)
    xs = (iu[:, None] == cols) * (1.0 - eu[:, None]) + ((iu + 1)[:, None] == cols) * eu[:, None]
    ys = (iv[:, None] == rows) * (1.0 - ev[:, None]) + ((iv + 1)[:, None] == rows) * ev[:, None]
    hi = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("px,rxc->prc", xs, tex_win, precision=hi)  # (P, wh, C) matmul
    out = jnp.einsum("pr,prc->pc", ys, tmp, precision=hi)
    return out.reshape(shape + (tex_win.shape[2],))


def barycentric_matrices(v_xy: jnp.ndarray) -> jnp.ndarray:
    """inv([[x0,x1,x2],[y0,y1,y2],[1,1,1]]): maps homogeneous pixel coords
    (x, y, 1) to barycentric coordinates (reference:
    C++/DifferentiableRenderer.h:645-662)."""
    ones = jnp.ones_like(v_xy[..., 0])
    m = jnp.stack([v_xy[..., 0], v_xy[..., 1], ones], axis=-2)
    return inv3x3(m)
