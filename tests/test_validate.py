"""Validator parity with the reference's assert-everything layer
(checkSceneValid, C++/DifferentiableRenderer.h:2664-2715, and the Cython
shape/dtype asserts, differentiable_renderer_cython.pyx:74-115): one test
per failure mode, each asserting the offending FIELD is named."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from deodr_tpu.ops.render import SceneBuffers
from deodr_tpu.validate import validate_gradient_preconditions, validate_scene_buffers


def _good(n_tri=4, v=12, h=8, w=16, textured=True):
    rng = np.random.RandomState(0)
    faces = np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3) % v
    return SceneBuffers(
        faces=jnp.asarray(faces),
        faces_uv=jnp.asarray(faces),
        ij=jnp.asarray(rng.rand(v, 2) * [w, h]),
        depths=jnp.asarray(rng.rand(v) + 0.5),
        uv=jnp.asarray(rng.rand(v, 2) * 3),
        shade=jnp.asarray(rng.rand(v)),
        colors=jnp.asarray(rng.rand(v, 3)),
        edgeflags=jnp.ones((n_tri, 3), bool),
        textured=jnp.asarray(np.full(n_tri, textured)),
        shaded=jnp.ones(n_tri, bool),
        texture=jnp.asarray(rng.rand(4, 4, 3)) if textured else None,
        background_image=None,
        background_color=jnp.asarray(rng.rand(3)),
        height=h,
        width=w,
    )


def _expect(field, **replacements):
    b = dataclasses.replace(_good(), **replacements)
    with pytest.raises(ValueError, match=field):
        validate_scene_buffers(b)


def test_valid_scene_passes():
    validate_scene_buffers(_good())
    validate_scene_buffers(_good(textured=False))


def test_bad_faces_shape():
    _expect("faces", faces=jnp.zeros((4, 4), jnp.int32))


def test_bad_faces_dtype():
    _expect("faces", faces=jnp.zeros((4, 3), jnp.float32))


def test_faces_index_out_of_range():
    b = _good()
    bad = np.asarray(b.faces).copy()
    bad[0, 0] = 999
    with pytest.raises(ValueError, match="faces indices out of range"):
        validate_scene_buffers(dataclasses.replace(b, faces=jnp.asarray(bad)))


def test_faces_uv_index_out_of_range():
    b = _good()
    bad = np.asarray(b.faces_uv).copy()
    bad[1, 2] = 500
    with pytest.raises(ValueError, match="faces_uv indices out of range"):
        validate_scene_buffers(dataclasses.replace(b, faces_uv=jnp.asarray(bad)))


def test_depths_wrong_length():
    _expect("depths", depths=jnp.zeros((5,)))


def test_ij_wrong_width():
    _expect("ij", ij=jnp.zeros((12, 3)))


def test_colors_vertex_mismatch():
    _expect("colors", colors=jnp.zeros((3, 3)))


def test_edgeflags_dtype():
    _expect("edgeflags", edgeflags=jnp.zeros((4, 3), jnp.int32))


def test_texture_channel_mismatch():
    _expect("texture", texture=jnp.zeros((4, 4, 1)))


def test_texture_nonfinite():
    b = _good()
    bad = np.asarray(b.texture).copy()
    bad[0, 0, 0] = np.nan
    with pytest.raises(ValueError, match="texture contains non-finite"):
        validate_scene_buffers(dataclasses.replace(b, texture=jnp.asarray(bad)))


def test_textured_without_texture():
    _expect("texture", texture=None)


def test_background_both_or_neither():
    _expect("background", background_color=None)
    _expect(
        "background",
        background_image=jnp.zeros((8, 16, 3)),
    )


def test_background_image_shape():
    _expect(
        "background_image",
        background_color=None,
        background_image=jnp.zeros((4, 16, 3)),
    )


def test_nonpositive_size():
    _expect("height/width", height=0)


def test_gradient_preconditions():
    b = dataclasses.replace(_good(), backface_culling=False)
    with pytest.raises(ValueError, match="backface_culling"):
        validate_gradient_preconditions(b, 1.0)
    b = dataclasses.replace(_good(), perspective_correct=True)
    with pytest.raises(ValueError, match="perspective_correct"):
        validate_gradient_preconditions(b, 1.0)


def test_scene2d_constructor_validates():
    from deodr_tpu.scene import Scene2D

    n_tri, v = 3, 9
    faces = np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3)
    faces_bad = faces.copy()
    faces_bad[0, 0] = 99  # out of the vertex table
    kw = dict(
        faces_uv=faces,
        ij=np.random.rand(v, 2) * 8,
        depths=np.random.rand(v) + 0.5,
        textured=np.zeros(n_tri, bool),
        uv=np.zeros((v, 2)),
        shade=np.zeros(v),
        colors=np.random.rand(v, 3),
        shaded=np.ones(n_tri, bool),
        edgeflags=np.ones((n_tri, 3), bool),
        height=8,
        width=8,
        nb_colors=3,
        texture=np.zeros((0, 0, 3)),
        background_color=np.array([0.1, 0.2, 0.3]),
    )
    Scene2D(faces=faces, **kw)  # valid
    with pytest.raises(ValueError, match="faces indices out of range"):
        Scene2D(faces=faces_bad, **kw)
