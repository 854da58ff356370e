"""The native C++ rasterizer must agree with the JAX renderer — a
cross-language differential test of the full forward semantics (solid +
edge-overdraw + textures)."""

import numpy as np
import jax

from deodr_tpu.native import render_scene_native
from deodr_tpu.ops.render import render_scene_jit
from examples.triangle_soup_fitting import create_example_scene


def test_native_matches_jax_soup():
    np.random.seed(2)
    scene2d = create_example_scene(clockwise=True)
    base = scene2d._buffers(*scene2d._diff_inputs())
    img_jax, zb_jax, _ = render_scene_jit(base, 1.0)
    img_nat, zb_nat = render_scene_native(base, 1.0)
    np.testing.assert_allclose(np.asarray(img_jax), img_nat, atol=1e-9)
    finite = np.isfinite(np.asarray(zb_jax))
    np.testing.assert_allclose(np.asarray(zb_jax)[finite], zb_nat[finite], atol=1e-12)


def test_native_matches_jax_untextured_ccw():
    np.random.seed(9)
    scene2d = create_example_scene(n_tri=15, width=150, height=110, clockwise=False, textured_ratio=0.0)
    base = scene2d._buffers(*scene2d._diff_inputs())
    img_jax, _, _ = render_scene_jit(base, 1.5)
    img_nat, _ = render_scene_native(base, 1.5)
    np.testing.assert_allclose(np.asarray(img_jax), img_nat, atol=1e-9)
