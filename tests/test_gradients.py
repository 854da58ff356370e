"""Finite-difference validation of the rendering gradients.

Mirrors the reference's gradient-checking strategy (reference:
deodr/tools.py:76-93, wired in mesh_fitter.py:563-574) but checks the
renderer itself: the SSD loss between a rendered soup scene and a fixed
observed image must have jax.grad gradients matching central finite
differences w.r.t. vertex positions, colors, uv, shade and texture — in
both antialiase-image and antialiase-error modes. This exercises the full
differentiable path including the edge-overdraw custom VJP.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deodr_tpu.ops.render import render_scene_jit
from examples.triangle_soup_fitting import create_example_scene


def _loss_fn(scene2d, obs, sigma, antialiase_error):
    base = scene2d._buffers(*scene2d._diff_inputs())

    def loss(ij, colors, uv, shade, texture):
        import dataclasses

        buffers = dataclasses.replace(base, ij=ij, colors=colors, uv=uv, shade=shade, texture=texture)
        image, _, err = render_scene_jit(buffers, sigma, antialiase_error=antialiase_error, obs=obs)
        if antialiase_error:
            return jnp.sum(err)
        return jnp.sum((image - obs) ** 2)

    return loss


def _check_param(loss, args, which, rng, n_probe=8, eps=1e-6, tol=5e-4):
    g = jax.grad(loss, argnums=which)(*args)
    g = np.asarray(g)
    x = np.asarray(args[which])
    flat_idx = rng.choice(x.size, size=min(n_probe, x.size), replace=False)
    for fi in flat_idx:
        xp = x.copy()
        xp.flat[fi] += eps
        xm = x.copy()
        xm.flat[fi] -= eps
        args_p = list(args)
        args_p[which] = jnp.asarray(xp)
        args_m = list(args)
        args_m[which] = jnp.asarray(xm)
        fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
        an = g.flat[fi]
        assert abs(fd - an) <= tol * max(1.0, abs(fd), abs(an)), (
            f"param {which} flat index {fi}: analytic {an} vs FD {fd}"
        )


@pytest.mark.parametrize("antialiase_error", [False, True])
def test_soup_gradients_match_finite_differences(antialiase_error):
    np.random.seed(11)
    scene = create_example_scene(n_tri=6, width=48, height=48)
    obs = np.asarray(scene.render(sigma=1)[0])
    # perturb so the loss is non-zero and probes cross occlusion boundaries
    np.random.seed(3)
    scene.ij = scene.ij + np.random.randn(*scene.ij.shape) * 2.0

    loss = _loss_fn(scene, jnp.asarray(obs), 1.0, antialiase_error)
    args = tuple(scene._diff_inputs())
    rng = np.random.RandomState(0)
    for which in range(5):
        _check_param(loss, args, which, rng)


def test_solid_gradients_interior():
    """sigma=0: gradients w.r.t. colors/ij of the visible surface only."""
    np.random.seed(7)
    scene = create_example_scene(n_tri=5, width=40, height=40)
    obs = np.asarray(scene.render(sigma=0)[0])
    np.random.seed(5)
    scene.colors = scene.colors + np.random.randn(*scene.colors.shape) * 0.1
    scene.shade = scene.shade + np.abs(np.random.randn(*scene.shade.shape)) * 0.1

    loss = _loss_fn(scene, jnp.asarray(obs), 0.0, False)
    args = tuple(scene._diff_inputs())
    rng = np.random.RandomState(1)
    for which in [1, 3, 4]:  # colors, shade, texture
        _check_param(loss, args, which, rng)
