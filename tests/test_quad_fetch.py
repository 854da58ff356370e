"""Quad-window bilinear fetch (ops.common.bilinear_sample_quads) must be
bit-identical to the per-pixel bilinear_sample — including border clamps,
uv-seam quads routed through the per-pixel fallback, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deodr_tpu.ops.common import bilinear_sample, bilinear_sample_quads


def _make_case(seed=0, q=64, th=32, tw=48, bad_frac=0.2):
    rng = np.random.default_rng(seed)
    texture = rng.standard_normal((th, tw, 3))
    # good quads: 4 uv points within a ~2-texel spread
    base = rng.uniform(-2.0, max(th, tw) + 2.0, size=(q, 1, 2))  # incl. out-of-range
    uv = base + rng.uniform(0, 2.0, size=(q, 4, 2))
    # a fraction of quads get one far-away pixel (uv seam) → fallback path
    n_bad = int(q * bad_frac)
    uv[:n_bad, 3, :] = rng.uniform(0, min(th, tw) - 2, size=(n_bad, 2)) + 20.0
    mask = rng.uniform(size=(q, 4)) > 0.2
    mask[:, 0] = True  # every quad keeps at least one live pixel
    return jnp.asarray(texture), jnp.asarray(uv), jnp.asarray(mask)


def test_matches_per_pixel_bitexact():
    texture, uv, mask = _make_case()
    out = bilinear_sample_quads(texture, uv, mask, fallback_capacity=64)
    ref = bilinear_sample(texture, uv)
    np.testing.assert_array_equal(
        np.asarray(out)[np.asarray(mask)], np.asarray(ref)[np.asarray(mask)]
    )


def test_matches_in_float32():
    texture, uv, mask = _make_case(seed=3)
    out = bilinear_sample_quads(
        texture.astype(jnp.float32), uv.astype(jnp.float32), mask, fallback_capacity=64
    )
    ref = bilinear_sample(texture.astype(jnp.float32), uv.astype(jnp.float32))
    np.testing.assert_array_equal(
        np.asarray(out)[np.asarray(mask)], np.asarray(ref)[np.asarray(mask)]
    )


def test_gradients_match_per_pixel():
    texture, uv, mask = _make_case(seed=1)
    w = jnp.asarray(np.random.default_rng(2).standard_normal((uv.shape[0], 4, 3)))
    w = w * mask[..., None]

    def loss_quads(texture, uv):
        return jnp.sum(bilinear_sample_quads(texture, uv, mask, fallback_capacity=64) * w)

    def loss_ref(texture, uv):
        return jnp.sum(bilinear_sample(texture, uv) * w)

    gt_q, gu_q = jax.grad(loss_quads, argnums=(0, 1))(texture, uv)
    gt_r, gu_r = jax.grad(loss_ref, argnums=(0, 1))(texture, uv)
    np.testing.assert_allclose(np.asarray(gt_q), np.asarray(gt_r), rtol=1e-12, atol=1e-12)
    mask_np = np.asarray(mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(gu_q) * mask_np, np.asarray(gu_r) * mask_np, rtol=1e-12, atol=1e-12
    )


def test_fallback_capacity_overflow_is_flagged():
    texture, uv, mask = _make_case(seed=4, q=64, bad_frac=0.5)
    checks = []
    out = bilinear_sample_quads(texture, uv, mask, fallback_capacity=4, checks=checks)
    assert np.isfinite(np.asarray(out)).all()
    (name, actual, cap) = checks[0]
    assert "fallback" in name and cap == 4
    assert int(actual) > 4  # the check exposes the overflow


def test_kernel_path_matches_xla_path():
    """The Pallas blend kernel (interpret mode on CPU) must match the XLA
    extraction up to summation order — ≤ 2 ulp, so ~1e-15 here in f64."""
    texture, uv, mask = _make_case(seed=6)
    out_x = bilinear_sample_quads(texture, uv, mask, fallback_capacity=64)
    out_k = bilinear_sample_quads(
        texture, uv, mask, fallback_capacity=64, use_kernel=True, interpret=True
    )
    m = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(out_k)[m], np.asarray(out_x)[m], rtol=1e-14, atol=1e-14
    )


def test_kernel_path_gradients_match():
    texture, uv, mask = _make_case(seed=7)
    w = jnp.asarray(np.random.default_rng(8).standard_normal((uv.shape[0], 4, 3)))
    w = w * mask[..., None]

    def loss(use_kernel):
        def f(texture, uv):
            return jnp.sum(
                bilinear_sample_quads(
                    texture, uv, mask, fallback_capacity=64,
                    use_kernel=use_kernel, interpret=use_kernel,
                )
                * w
            )

        return f

    gt_k, gu_k = jax.grad(loss(True), argnums=(0, 1))(texture, uv)
    gt_x, gu_x = jax.grad(loss(False), argnums=(0, 1))(texture, uv)
    np.testing.assert_allclose(np.asarray(gt_k), np.asarray(gt_x), rtol=1e-13, atol=1e-13)
    m = np.asarray(mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(gu_k) * m, np.asarray(gu_x) * m, rtol=1e-12, atol=1e-12
    )


def test_zero_capacity_skips_fallback():
    texture, uv, mask = _make_case(seed=5, bad_frac=0.0)
    out = bilinear_sample_quads(texture, uv, mask, fallback_capacity=0)
    ref = bilinear_sample(texture, uv)
    np.testing.assert_array_equal(
        np.asarray(out)[np.asarray(mask)], np.asarray(ref)[np.asarray(mask)]
    )
