"""Harness for differential-testing gradients against the reference C core.

Dumps a :class:`deodr_tpu.ops.render.SceneBuffers` to flat files, compiles
and runs ``tools/ref_grad_dump.cpp`` (which includes the reference header
``/root/reference/C++/DifferentiableRenderer.h`` in place), and returns the
reference's forward buffers and adjoint outputs (``ij_b``, ``colors_b``,
``uv_b``, ``shade_b``, ``texture_b`` — reference:
C++/DifferentiableRenderer.h:2903-3135) as numpy arrays.

Used by tests/test_ref_grad_differential.py to close the BASELINE.md
acceptance criterion: forward **and pixel gradients** allclose to the DEODR
C core.
"""

from __future__ import annotations

import getpass
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_REF_INCLUDE = "/root/reference/C++"
_TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))
# per-user cache dir (not a fixed world-writable /tmp path) — parallel pytest
# workers or other users cannot race/overwrite each other's binary
_CACHE_DIR = os.path.join(
    tempfile.gettempdir(), f"deodr_tpu_refgrad_{getpass.getuser()}"
)
_BIN = os.path.join(_CACHE_DIR, "ref_grad_dump_bin")


def reference_available() -> bool:
    return os.path.exists(os.path.join(_REF_INCLUDE, "DifferentiableRenderer.h"))


def ensure_tool() -> str:
    """Compile ref_grad_dump.cpp once (cached on mtime; atomic publish).

    The compile writes to a pid-suffixed temp name and ``os.replace``s it
    into place, so concurrent pytest-xdist workers that both decide to
    (re)build each produce a complete binary and the loser's rename simply
    wins last — no worker ever executes a half-written file.
    """
    src = os.path.join(_TOOLS_DIR, "ref_grad_dump.cpp")
    if not os.path.exists(_BIN) or os.path.getmtime(_BIN) < os.path.getmtime(src):
        os.makedirs(_CACHE_DIR, exist_ok=True)
        tmp_bin = f"{_BIN}.tmp.{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-std=c++14", f"-I{_REF_INCLUDE}", src, "-o", tmp_bin],
            check=True,
            capture_output=True,
        )
        os.replace(tmp_bin, _BIN)
    return _BIN


def dump_buffers(b, stem: str) -> None:
    """Write the flat dump the native tools read (same layout as
    tools/dump_scene.py, plus the .cfg record)."""
    faces = np.asarray(b.faces)
    t = faces.shape[0]
    v = np.asarray(b.ij).shape[0]
    texture = b.texture
    if texture is None:
        texture = np.zeros((1, 1, np.asarray(b.colors).shape[1]))
    texture = np.asarray(texture)
    uv = np.asarray(b.uv)
    if uv.shape[0] == 0:
        uv = np.zeros((1, 2))
    vuv = uv.shape[0]
    c = np.asarray(b.colors).shape[1]
    th, tw = texture.shape[:2]
    np.asarray([t, v, vuv, b.height, b.width, c, th, tw], np.int32).tofile(stem + ".meta")
    faces.astype(np.uint32).tofile(stem + ".faces")
    np.asarray(b.faces_uv).astype(np.uint32).tofile(stem + ".faces_uv")
    np.asarray(b.ij, np.float64).tofile(stem + ".ij")
    np.asarray(b.depths, np.float64).tofile(stem + ".depths")
    uv.astype(np.float64).tofile(stem + ".uv")
    np.asarray(b.shade, np.float64).tofile(stem + ".shade")
    np.asarray(b.colors, np.float64).tofile(stem + ".colors")
    flags = np.concatenate(
        [
            np.asarray(b.edgeflags).reshape(-1).astype(np.uint8),
            np.asarray(b.textured).astype(np.uint8),
            np.asarray(b.shaded).astype(np.uint8),
        ]
    )
    flags.tofile(stem + ".flags")
    texture.astype(np.float64).tofile(stem + ".texture")
    has_bg_image = b.background_image is not None
    if has_bg_image:
        np.asarray(b.background_image, np.float64).tofile(stem + ".bgimg")
    else:
        np.asarray(b.background_color, np.float64).tofile(stem + ".bg")
    np.asarray(
        [
            int(bool(b.clockwise)),
            int(bool(b.strict_edge)),
            int(bool(b.integer_pixel_centers)),
            0,  # antialiase_error patched by run_ref_grad
            int(has_bg_image),
        ],
        np.int32,
    ).tofile(stem + ".cfg")


def run_ref_grad(
    b,
    sigma: float,
    image_b: Optional[np.ndarray] = None,
    obs: Optional[np.ndarray] = None,
    err_buffer_b: Optional[np.ndarray] = None,
    stem: Optional[str] = None,
) -> dict:
    """Run the reference forward+adjoint; returns dict of numpy arrays.

    Image mode: pass ``image_b`` (H, W, C) as the adjoint seed.
    Error mode: pass ``obs`` (H, W, C) and ``err_buffer_b`` (H, W).

    ``stem`` defaults to a fresh per-call temp dir (safe under parallel
    pytest workers); tests typically pass ``tmp_path``-based stems.
    """
    tool = ensure_tool()
    if stem is None:
        stem = os.path.join(tempfile.mkdtemp(prefix="ref_grad_"), "scene")
    dump_buffers(b, stem)
    error_mode = err_buffer_b is not None
    cfg = np.fromfile(stem + ".cfg", np.int32)
    cfg[3] = int(error_mode)
    cfg.tofile(stem + ".cfg")
    h, w = b.height, b.width
    c = np.asarray(b.colors).shape[1]
    if error_mode:
        assert obs is not None
        np.asarray(obs, np.float64).tofile(stem + ".obs")
        np.asarray(err_buffer_b, np.float64).tofile(stem + ".errb")
    else:
        assert image_b is not None
        np.asarray(image_b, np.float64).tofile(stem + ".imageb")
    subprocess.run([tool, stem, repr(float(sigma))], check=True, capture_output=True)

    texture = b.texture
    tex_shape = (1, 1, c) if texture is None else np.asarray(texture).shape
    uv_n = max(1, np.asarray(b.uv).shape[0])
    v = np.asarray(b.ij).shape[0]
    out = {
        "image": np.fromfile(stem + ".out_image", np.float64).reshape(h, w, c),
        "z_buffer": np.fromfile(stem + ".out_zbuffer", np.float64).reshape(h, w),
        "ij_b": np.fromfile(stem + ".out_ijb", np.float64).reshape(v, 2),
        "colors_b": np.fromfile(stem + ".out_colorsb", np.float64).reshape(v, c),
        "uv_b": np.fromfile(stem + ".out_uvb", np.float64).reshape(uv_n, 2),
        "shade_b": np.fromfile(stem + ".out_shadeb", np.float64).reshape(v),
        "texture_b": np.fromfile(stem + ".out_textureb", np.float64).reshape(tex_shape),
    }
    if error_mode:
        out["err_buffer"] = np.fromfile(stem + ".out_err", np.float64).reshape(h, w)
    return out
