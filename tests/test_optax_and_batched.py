"""optax-based fitting and batched (vmapped) rendering."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


def test_optax_fitting_converges():
    from examples.optax_fitting import run

    energies = run(max_iter=30)
    assert energies[-1] < energies[0] * 0.85


def test_vmapped_batch_rendering():
    """A batch of scenes renders under vmap (production batching): same
    topology, batched vertex positions/colors."""
    from deodr_tpu.ops.render import render_scene
    from examples.triangle_soup_fitting import create_example_scene

    np.random.seed(11)
    scene2d = create_example_scene(n_tri=5, width=48, height=48, textured_ratio=0.0)
    base = scene2d._buffers(*scene2d._diff_inputs())
    base = dataclasses.replace(base, texture=None)

    batch = 4
    rng = np.random.RandomState(0)
    ij_batch = jnp.asarray(np.asarray(base.ij)[None] + rng.randn(batch, *base.ij.shape) * 2.0)

    def render_one(ij):
        img, _, _ = render_scene(dataclasses.replace(base, ij=ij), 1.0)
        return img

    images = jax.jit(jax.vmap(render_one))(ij_batch)
    assert images.shape == (batch, 48, 48, 3)
    assert bool(jnp.isfinite(images).all())
    # different perturbations → different images
    assert float(jnp.abs(images[0] - images[1]).max()) > 1e-3

    def loss(ij_batch):
        return jnp.sum(jax.vmap(render_one)(ij_batch) ** 2)

    g = jax.jit(jax.grad(loss))(ij_batch)
    assert bool(jnp.isfinite(g).all())
