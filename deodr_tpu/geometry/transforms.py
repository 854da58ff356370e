"""Differentiable 3D transform helpers (pure jnp, gradients via jax.grad).

The reference ships each of these with a hand-written ``*_backward`` companion
(reference: deodr/tools.py:8-53); here plain jnp suffices — ``jax.grad`` of
``normalize`` / ``qrot`` reproduces those adjoints exactly.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """x / ||x|| along ``axis`` (reference: deodr/tools.py:36-39)."""
    n = jnp.sqrt(jnp.sum(x**2, axis=axis, keepdims=True))
    return x / n


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate points ``v`` (..., 3) by unit quaternion(s) ``q`` (..., 4).

    Quaternion layout is (x, y, z, w), matching scipy and the reference
    (reference: deodr/tools.py:8-21).
    """
    q = jnp.asarray(q)
    v = jnp.asarray(v)
    if q.ndim == 2:
        uv = jnp.cross(q[:, None, :3], v[None, :, :])
        uuv = jnp.cross(q[:, None, :3], uv)
        return v + 2 * (q[:, None, 3:4] * uv + uuv)
    uv = jnp.cross(q[:3], v)
    uuv = jnp.cross(q[:3], uv)
    return v + 2 * (q[3] * uv + uuv)


def cross2(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """2D cross product u_x v_y - u_y v_x over the last axis."""
    return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]


def jacobian_finite_differences(func, x, epsilon: float = 1e-6):
    """Central-difference Jacobian of ``func`` at ``x`` (flattened in/out).

    Gradient-check utility with the same contract as the reference's
    (reference: deodr/tools.py:56-73). For jit-able functions prefer
    ``jax.test_util.check_grads``; this helper also works through
    non-JAX (numpy / stateful) pipelines like the OO fitting classes.
    """
    import numpy as np

    x = np.asarray(x, np.float64)
    f0 = np.asarray(func(x)).ravel()
    jac = np.zeros((f0.size, x.size))
    flat = x.ravel()
    for i in range(flat.size):
        xp = flat.copy()
        xm = flat.copy()
        xp[i] += epsilon
        xm[i] -= epsilon
        fp = np.asarray(func(xp.reshape(x.shape))).ravel()
        fm = np.asarray(func(xm.reshape(x.shape))).ravel()
        jac[:, i] = (fp - fm) / (2 * epsilon)
    return jac


def check_jacobian_finite_differences(jac, func, x, epsilon: float = 1e-6, tol: float = 1e-4) -> float:
    """Assert ``jac`` matches the central-difference Jacobian of ``func`` at
    ``x`` within ``tol`` (max abs error, returned); reference:
    deodr/tools.py:76-93."""
    import numpy as np

    jac_fd = jacobian_finite_differences(func, x, epsilon)
    err = float(np.abs(np.asarray(jac).reshape(jac_fd.shape) - jac_fd).max())
    assert err < tol, f"jacobian mismatch: max abs err {err} >= {tol}"
    return err
