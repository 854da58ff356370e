"""Differential test of gradients against the reference C adjoint.

The BASELINE.md acceptance criterion is "forward+backward renders allclose
to the DEODR C core ... (images and pixel gradients)". Forward parity is
covered by golden PNGs and the native oracle; this file closes the gradient
half: it runs the reference's own hand-written adjoint ``renderScene_B``
(reference: C++/DifferentiableRenderer.h:2903-3135, compiled in place by
tools/ref_grad_dump.cpp) on the triangle-soup and duck 2.5D scenes and
asserts our ``jax.vjp`` gradients match in float64.

Covers: both AA modes (image / antialiased-error), both windings, the
textured+shaded 3D path (duck), and σ=0 (solid-only gradients).
"""

import dataclasses
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deodr_tpu.ops.render import render_scene
from examples.triangle_soup_fitting import create_example_scene
from tools.ref_grad import reference_available, run_ref_grad

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference C++ header not available"
)


def _jax_vjp(buffers, sigma, image_b=None, obs=None, err_buffer_b=None):
    """Our gradients w.r.t. (ij, colors, uv, shade, texture) via jax.vjp."""
    error_mode = err_buffer_b is not None
    obs_j = None if obs is None else jnp.asarray(obs)

    def fwd(ij, colors, uv, shade, texture):
        buf = dataclasses.replace(
            buffers, ij=ij, colors=colors, uv=uv, shade=shade, texture=texture
        )
        image, _, err = render_scene(
            buf, float(sigma), antialiase_error=error_mode, obs=obs_j
        )
        return err if error_mode else image

    primals = (buffers.ij, buffers.colors, buffers.uv, buffers.shade, buffers.texture)
    out, vjp = jax.vjp(fwd, *primals)
    seed = jnp.asarray(err_buffer_b if error_mode else image_b)
    ij_b, colors_b, uv_b, shade_b, texture_b = vjp(seed)
    return out, dict(
        ij_b=np.asarray(ij_b),
        colors_b=np.asarray(colors_b),
        uv_b=np.asarray(uv_b),
        shade_b=np.asarray(shade_b),
        texture_b=None if texture_b is None else np.asarray(texture_b),
    )


def _assert_grads_close(ours, ref, has_texture, atol_scale=1.0):
    """Compare every gradient buffer except ``texture_b``: the reference's
    ``bilinear_sample_B`` *overwrites* the four texel taps instead of
    accumulating (``I_B[...] = ...`` at reference
    C++/DifferentiableRenderer.h:621-624), so when several pixels sample the
    same texel the reference keeps only the last pixel's contribution. Our
    texture gradient accumulates (the mathematically correct adjoint,
    validated by finite differences in tests/test_gradients.py); comparing
    it against the reference's buggy buffer would assert the bug."""

    def close(a, b, name):
        scale = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(
            a, b, atol=1e-8 * scale * atol_scale, err_msg=f"{name} mismatch vs reference adjoint"
        )

    close(ours["ij_b"], ref["ij_b"], "ij_b")
    close(ours["colors_b"], ref["colors_b"], "colors_b")
    close(ours["shade_b"], ref["shade_b"], "shade_b")
    if has_texture:
        uv_b = ours["uv_b"]
        if uv_b.shape[0] == 0:
            uv_b = np.zeros_like(ref["uv_b"])
        close(uv_b, ref["uv_b"], "uv_b")


@pytest.mark.parametrize("clockwise", [False, True])
@pytest.mark.parametrize("error_mode", [False, True])
def test_soup_gradients_vs_reference_adjoint(clockwise, error_mode, tmp_path):
    """Triangle-soup 2D scene (mixed textured/untextured, all edges AA'd):
    gradients for ij/colors/uv/shade/texture vs renderScene_B, both windings
    and both antialiasing modes (reference: examples/triangle_soup_fitting.py).

    In error mode the reference's *untextured* edge adjoint has a bug: the
    image-mode adjoint folds each scanline's attribute-offset cotangent back
    into the affine map (``mul_matrixNx3_vect_B(sizeA, A0y_B, xy1_to_A_B, t)``
    at reference C++/DifferentiableRenderer.h:1747) but the error-mode
    adjoint accumulates ``A0y_B`` and never consumes it
    (h:2480-2618 — the y/constant rows of ``xy1_to_A_B`` stay zero), so the
    reference's ij/colors gradients are wrong for untextured triangles that
    have silhouette bands. For those rows this test asserts our gradients
    against central finite differences of the (bit-identical) forward
    instead; textured-triangle rows are still pinned to the reference
    (its textured error adjoint h:2199-2368 does not have the bug)."""
    np.random.seed(50)
    scene2d = create_example_scene(clockwise=clockwise)
    b = scene2d._buffers(*scene2d._diff_inputs())
    sigma = 1.0
    h, w, c = b.height, b.width, b.colors.shape[1]
    rng = np.random.RandomState(7)
    if error_mode:
        obs = rng.rand(h, w, c)
        err_b = rng.rand(h, w)
        ref = run_ref_grad(b, sigma, obs=obs, err_buffer_b=err_b, stem=str(tmp_path / "soup"))
        out, ours = _jax_vjp(b, sigma, obs=obs, err_buffer_b=err_b)
        np.testing.assert_allclose(np.asarray(out), ref["err_buffer"], atol=1e-9)

        textured = np.asarray(b.textured)
        faces = np.asarray(b.faces)
        tex_rows = np.unique(faces[textured].reshape(-1))
        for name in ("ij_b", "colors_b"):
            np.testing.assert_allclose(
                ours[name][tex_rows], ref[name][tex_rows], atol=1e-8,
                err_msg=f"{name} (textured rows) mismatch vs reference adjoint",
            )
        np.testing.assert_allclose(ours["uv_b"], ref["uv_b"], atol=1e-8)
        np.testing.assert_allclose(ours["shade_b"], ref["shade_b"], atol=1e-8)

        # untextured rows: reference drops terms (see docstring); check ours
        # against FD where the disagreement is largest
        d = np.abs(ours["ij_b"] - ref["ij_b"])
        idx = np.unravel_index(np.argmax(d), d.shape)
        assert d[idx] > 1e-3, "expected the reference error-adjoint bug to show"
        obs_j = jnp.asarray(obs)

        def loss_at(ij):
            buf = dataclasses.replace(b, ij=jnp.asarray(ij))
            _, _, err = render_scene(buf, sigma, antialiase_error=True, obs=obs_j)
            return float(jnp.sum(jnp.asarray(err_b) * err))

        ij0 = np.asarray(b.ij)
        eps = 1e-5
        p = ij0.copy(); p[idx] += eps
        m = ij0.copy(); m[idx] -= eps
        fd = (loss_at(p) - loss_at(m)) / (2 * eps)
        assert abs(ours["ij_b"][idx] - fd) < 1e-4 * max(1.0, abs(fd))
    else:
        image_b = rng.rand(h, w, c)
        ref = run_ref_grad(b, sigma, image_b=image_b, stem=str(tmp_path / "soup"))
        out, ours = _jax_vjp(b, sigma, image_b=image_b)
        np.testing.assert_allclose(np.asarray(out), ref["image"], atol=1e-9)
        _assert_grads_close(ours, ref, has_texture=True)


@pytest.mark.parametrize("sigma", [0.0, 1.0])
def test_duck_gradients_vs_reference_adjoint(sigma, tmp_path):
    """The textured+Gouraud 3D path: duck mesh at 320×240, silhouette AA.
    Gradients w.r.t. the full 2.5D surface (ij, uv, shade, texture) vs the
    reference adjoint (reference: C++/DifferentiableRenderer.h:1909-2064)."""
    import deodr_tpu
    from deodr_tpu import ColoredTriMesh, default_camera
    from deodr_tpu.scene import Scene3D

    mesh = ColoredTriMesh.load(os.path.join(deodr_tpu.data_path, "duck.obj"))
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    camera = default_camera(320, 240, 60, np.asarray(mesh.vertices), rot)
    scene = Scene3D(sigma=sigma)
    scene.set_mesh(mesh)
    scene.set_light(np.array([-0.4, -0.4, -0.8]), 0.4)
    scene.set_background_color(np.array([0.2, 0.3, 0.5]))
    b, _ = scene._build_buffers(camera, *scene._diff_inputs(False), sigma > 0, None)

    rng = np.random.RandomState(11)
    image_b = rng.rand(b.height, b.width, b.colors.shape[1])
    ref = run_ref_grad(b, sigma, image_b=image_b, stem=str(tmp_path / "duck"))
    out, ours = _jax_vjp(b, sigma, image_b=image_b)
    np.testing.assert_allclose(np.asarray(out), ref["image"], atol=1e-9)
    _assert_grads_close(ours, ref, has_texture=True)
