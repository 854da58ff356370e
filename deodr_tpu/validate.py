"""Eager scene validation — the reference's assert-everything layer.

The reference validates every scene field twice: shape/dtype asserts in the
Cython binding (reference: deodr/differentiable_renderer_cython.pyx:74-115)
and null/range checks in the C core's ``checkSceneValid`` (reference:
C++/DifferentiableRenderer.h:2664-2715), so a malformed scene fails with a
named message instead of deep inside the rasterizer. Here the equivalent
runs OUTSIDE jit: :func:`validate_scene_buffers` checks shapes, dtypes,
flag consistency and (optionally, one device sync) index ranges, raising
``ValueError`` with the offending field named. Wired into the OO entry
points (Scene2D.render*, Scene3D.render*) via ``validate=True`` kwargs and
usable standalone on any :class:`deodr_tpu.ops.render.SceneBuffers`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp


def _fail(field: str, msg: str):
    raise ValueError(f"invalid scene: {field} {msg}")


def _check_shape(name, arr, shape):
    got = tuple(arr.shape)
    if len(got) != len(shape) or any(s is not None and g != s for g, s in zip(got, shape)):
        want = tuple("?" if s is None else s for s in shape)
        _fail(name, f"has shape {got}, expected {want}")


def _check_float(name, arr):
    if not jnp.issubdtype(arr.dtype, jnp.floating):
        _fail(name, f"has dtype {arr.dtype}, expected floating (reference uses float64)")


def _check_bool(name, arr):
    if arr.dtype != jnp.bool_:
        _fail(name, f"has dtype {arr.dtype}, expected bool")


def validate_scene_buffers(b, check_indices: bool = True) -> None:
    """Validate a SceneBuffers record; raises ValueError naming the field.

    ``check_indices`` additionally verifies index ranges and value sanity
    (faces within the vertex tables, finite texture) — this reads array
    values, costing one host↔device sync; pass False for a shapes-only
    check in hot paths. Mirrors ``checkSceneValid`` + the Cython asserts
    (reference: C++/DifferentiableRenderer.h:2664-2715,
    deodr/differentiable_renderer_cython.pyx:74-115).
    """
    t = b.faces.shape[0] if b.faces.ndim else 0
    _check_shape("faces", b.faces, (None, 3))
    if not jnp.issubdtype(b.faces.dtype, jnp.integer):
        _fail("faces", f"has dtype {b.faces.dtype}, expected integer")
    _check_shape("faces_uv", b.faces_uv, (t, 3))
    if not jnp.issubdtype(b.faces_uv.dtype, jnp.integer):
        _fail("faces_uv", f"has dtype {b.faces_uv.dtype}, expected integer")

    _check_shape("ij", b.ij, (None, 2))
    _check_float("ij", b.ij)
    v = b.ij.shape[0]
    _check_shape("depths", b.depths, (v,))
    _check_float("depths", b.depths)
    _check_shape("shade", b.shade, (v,))
    _check_float("shade", b.shade)
    _check_shape("uv", b.uv, (None, 2))
    _check_float("uv", b.uv)
    _check_shape("colors", b.colors, (v, None))
    _check_float("colors", b.colors)
    nb_colors = b.colors.shape[1]

    _check_shape("edgeflags", b.edgeflags, (t, 3))
    _check_bool("edgeflags", b.edgeflags)
    _check_shape("textured", b.textured, (t,))
    _check_bool("textured", b.textured)
    _check_shape("shaded", b.shaded, (t,))
    _check_bool("shaded", b.shaded)

    if b.height <= 0 or b.width <= 0:
        _fail("height/width", f"must be positive, got ({b.height}, {b.width})")

    if b.texture is not None:
        if b.texture.ndim != 3:
            _fail("texture", f"has ndim {b.texture.ndim}, expected 3 (th, tw, C)")
        if b.texture.shape[2] != nb_colors:
            _fail(
                "texture",
                f"has {b.texture.shape[2]} channels but colors has {nb_colors} "
                "(reference requires equal channel counts)",
            )
        _check_float("texture", b.texture)

    if (b.background_image is None) == (b.background_color is None):
        _fail(
            "background",
            "exactly one of background_image / background_color must be set",
        )
    if b.background_image is not None:
        _check_shape("background_image", b.background_image, (b.height, b.width, nb_colors))
        _check_float("background_image", b.background_image)
    if b.background_color is not None:
        _check_shape("background_color", b.background_color, (nb_colors,))
        _check_float("background_color", b.background_color)

    if check_indices:
        faces = np.asarray(b.faces)
        if t and (faces.min() < 0 or faces.max() >= v):
            _fail("faces", f"indices out of range [0, {v}) (min {faces.min()}, max {faces.max()})")
        faces_uv = np.asarray(b.faces_uv)
        n_uv = b.uv.shape[0]
        if t and bool(np.asarray(b.textured).any()):
            if faces_uv.min() < 0 or faces_uv.max() >= max(n_uv, 1):
                _fail(
                    "faces_uv",
                    f"indices out of range [0, {n_uv}) (min {faces_uv.min()}, max {faces_uv.max()})",
                )
            if b.texture is None:
                _fail("texture", "is None but some triangles are flagged textured")
        if b.texture is not None and not bool(np.isfinite(np.asarray(b.texture)).all()):
            _fail("texture", "contains non-finite values")


def validate_gradient_preconditions(b, sigma: float) -> None:
    """The constraints the reference enforces before its adjoint runs:
    backface culling must be on (reference:
    C++/DifferentiableRenderer.h:2922-2925) and perspective-correct has no
    backward (reference: C++/DifferentiableRenderer.h:810)."""
    if not b.backface_culling:
        raise ValueError(
            "gradient computation requires backface_culling=True "
            "(reference: C++/DifferentiableRenderer.h:2922-2925)"
        )
    if b.perspective_correct:
        raise ValueError(
            "perspective_correct has no backward pass "
            "(reference: C++/DifferentiableRenderer.h:810)"
        )
