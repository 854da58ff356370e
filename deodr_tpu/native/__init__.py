"""Native CPU reference rasterizer (C++, ctypes-bound).

Compiled on demand with the system compiler; serves as a cross-language
oracle for the JAX/Pallas renderers and a dependency-free CPU fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None


def _get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(__file__)
    src = os.path.join(here, "rasterizer.cpp")
    lib_path = os.path.join(here, "librasterizer.so")
    if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, src],
        )
    lib = ctypes.CDLL(lib_path)
    lib.render_scene_native.restype = None
    _LIB = lib
    return lib


def render_scene_native(scene_buffers, sigma: float):
    """Render a SceneBuffers pytree with the native CPU rasterizer.

    Returns (image (H, W, C), z_buffer (H, W)) float64 numpy arrays.
    Forward only (the oracle role); background images are supported.
    NOT supported: antialiase-error mode, and perspective-correct
    attribute interpolation (rasterizer.cpp evaluates affine z/attribute
    planes only, and the flag is not marshaled into the C call — oracle
    comparisons must use perspective_correct=False scenes).
    """
    lib = _get_lib()
    b = scene_buffers
    faces = np.ascontiguousarray(np.asarray(b.faces), np.int32)
    faces_uv = np.ascontiguousarray(np.asarray(b.faces_uv), np.int32)
    ij = np.ascontiguousarray(np.asarray(b.ij), np.float64)
    depths = np.ascontiguousarray(np.asarray(b.depths), np.float64)
    uv = np.ascontiguousarray(np.asarray(b.uv), np.float64)
    shade = np.ascontiguousarray(np.asarray(b.shade), np.float64)
    colors = np.ascontiguousarray(np.asarray(b.colors), np.float64)
    edgeflags = np.ascontiguousarray(np.asarray(b.edgeflags), np.uint8)
    textured = np.ascontiguousarray(np.asarray(b.textured), np.uint8)
    shaded = np.ascontiguousarray(np.asarray(b.shaded), np.uint8)
    has_tex = b.texture is not None
    texture = np.ascontiguousarray(np.asarray(b.texture), np.float64) if has_tex else np.zeros((1, 1, colors.shape[1]))
    bg_color = (
        np.ascontiguousarray(np.asarray(b.background_color), np.float64)
        if b.background_color is not None
        else np.zeros(colors.shape[1])
    )
    bg_image = (
        np.ascontiguousarray(np.asarray(b.background_image), np.float64)
        if b.background_image is not None
        else None
    )
    h, w, c = b.height, b.width, colors.shape[1]
    image = np.zeros((h, w, c), np.float64)
    z_buffer = np.zeros((h, w), np.float64)

    def ptr(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty)) if a is not None else None

    lib.render_scene_native(
        ptr(faces, ctypes.c_int32),
        ptr(faces_uv, ctypes.c_int32),
        ptr(ij, ctypes.c_double),
        ptr(depths, ctypes.c_double),
        ptr(uv, ctypes.c_double),
        ptr(shade, ctypes.c_double),
        ptr(colors, ctypes.c_double),
        ptr(edgeflags, ctypes.c_uint8),
        ptr(textured, ctypes.c_uint8),
        ptr(shaded, ctypes.c_uint8),
        ptr(texture, ctypes.c_double),
        ptr(bg_color, ctypes.c_double),
        ptr(bg_image, ctypes.c_double),
        ctypes.c_int32(faces.shape[0]),
        ctypes.c_int32(depths.shape[0]),
        ctypes.c_int32(uv.shape[0]),
        ctypes.c_int32(c),
        ctypes.c_int32(h),
        ctypes.c_int32(w),
        ctypes.c_int32(texture.shape[0]),
        ctypes.c_int32(texture.shape[1]),
        ctypes.c_uint8(1 if b.clockwise else 0),
        ctypes.c_uint8(1 if b.backface_culling else 0),
        ctypes.c_uint8(1 if b.strict_edge else 0),
        ctypes.c_uint8(1 if b.integer_pixel_centers else 0),
        ctypes.c_double(sigma),
        ptr(image, ctypes.c_double),
        ptr(z_buffer, ctypes.c_double),
    )
    return image, z_buffer
