"""Branch coverage for gather_rows_mm's custom adjoint.

The backward picks one of four implementations by size (small one-hot
einsum, single batched chunked einsum, bounded lax.scan accumulation for
huge slot counts, plain scatter-add for huge tables); all must agree with
the plain-gather autodiff transpose (a scatter-add) exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deodr_tpu.ops.common import gather_rows_mm


def _check(n_rows, n, d, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n_rows, d)), dtype)
    idx = jnp.asarray(rng.integers(0, n_rows, size=(n,)), jnp.int32)
    ct = jnp.asarray(rng.standard_normal((n, d)), dtype)

    def f(x):
        return jnp.sum(gather_rows_mm(x, idx) * ct)

    def f_ref(x):
        return jnp.sum(x[idx] * ct)

    g = jax.jit(jax.grad(f))(x)
    g_ref = jax.jit(jax.grad(f_ref))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_small_onehot_branch():
    # n * n_rows <= 2^22 → single one-hot einsum
    _check(n_rows=200, n=1000, d=7)


def test_chunked_einsum_branch():
    # n_rows <= 4096 and 2^22 < n * n_rows <= 2^28 → batched chunked einsum
    _check(n_rows=2048, n=3000, d=5)


def test_bounded_scan_branch():
    # n_rows <= 4096 and n * n_rows > 2^28 → lax.scan accumulation whose
    # peak memory is O(chunk · n_rows), independent of n
    _check(n_rows=4096, n=70000, d=2)


def test_scatter_fallback_branch():
    # n_rows > 4096 → plain scatter-add
    _check(n_rows=5000, n=2000, d=3)
