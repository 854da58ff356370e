"""Independent-formulation software rasterizer (test oracle only).

Plays the role the reference's OpenGL renderers play for it (reference:
deodr/opengl/moderngl.py:2-5 — a from-different-principles check): every
other oracle in this repo (golden PNGs, the compiled reference core, the
native C++ oracle) shares DEODR's stencil-equation formulation, so a
common-mode derivation bug could slip through all of them. This one shares
NOTHING with that derivation:

* coverage is a direct point-in-halfplane test of each pixel center against
  the three edge functions, oriented by the triangle's own winding sign —
  no vertex y-sorting, no upper/lower sub-triangles, no rational x-range
  arithmetic, no barycentric matrix inversion;
* visibility is a running min-z loop over triangles in ARBITRARY order —
  no back-to-front sort, no painter submission order;
* attributes interpolate by normalized edge-function weights (Cramer-free).

Because the inclusion rules on exact edge/boundary pixels are deliberately
NOT the reference's (`strict_edge` shared-edge handling, tie-breaks),
agreement is statistical: on random scenes ≥ 99.9% of pixels must match
within tolerance (boundary pixels are the budget).

Conventions shared (they are part of the public contract, not the
algorithm): pixel centers at integer coordinates; `ij[:, 0]` = x = column;
winding/backface rule (reference: deodr/differentiable_renderer.py:16-45);
integer-texel-center bilinear sampling with border clamp (readme.md "Texel
coordinates").
"""

import numpy as np


def _bilinear(texture, u, v):
    """Independent bilinear fetch: integer texel centers, border clamp."""
    th, tw = texture.shape[0], texture.shape[1]
    fu, fv = np.floor(u), np.floor(v)
    eu = np.where(fu < 0, 0.0, np.where(fu > tw - 2, 1.0, u - fu))
    ev = np.where(fv < 0, 0.0, np.where(fv > th - 2, 1.0, v - fv))
    iu = np.clip(fu, 0, tw - 2).astype(np.int64)
    iv = np.clip(fv, 0, th - 2).astype(np.int64)
    t00 = texture[iv, iu]
    t10 = texture[iv, iu + 1]
    t01 = texture[iv + 1, iu]
    t11 = texture[iv + 1, iu + 1]
    eu = eu[..., None]
    ev = ev[..., None]
    return ((1 - eu) * t00 + eu * t10) * (1 - ev) + ((1 - eu) * t01 + eu * t11) * ev


def rasterize_sample_test(scene):
    """Rasterize a SceneBuffers-like record at sigma=0 by pure sampling.

    Returns (image (H, W, C), z_buffer (H, W)). Pixels on exact triangle
    boundaries may disagree with the scanline formulation — callers compare
    statistically.
    """
    faces = np.asarray(scene.faces)
    ij = np.asarray(scene.ij, dtype=np.float64)
    depths = np.asarray(scene.depths, dtype=np.float64)
    colors = np.asarray(scene.colors, dtype=np.float64)
    textured = np.asarray(scene.textured)
    shaded = np.asarray(scene.shaded)
    h, w = scene.height, scene.width
    c = colors.shape[1]

    offset = 0.0 if scene.integer_pixel_centers else 0.5
    px = np.arange(w, dtype=np.float64)[None, :] + offset  # x = column
    py = np.arange(h, dtype=np.float64)[None, :].T * np.ones((1, w)) + offset

    if scene.background_image is not None:
        image = np.array(scene.background_image, dtype=np.float64)
    else:
        image = np.broadcast_to(
            np.asarray(scene.background_color, dtype=np.float64), (h, w, c)
        ).copy()
    zbuf = np.full((h, w), np.inf)

    tex = None if scene.texture is None else np.asarray(scene.texture, dtype=np.float64)
    uv = None if scene.uv is None else np.asarray(scene.uv, dtype=np.float64)
    shade = np.asarray(scene.shade, dtype=np.float64)
    faces_uv = np.asarray(scene.faces_uv)

    for t in range(faces.shape[0]):
        v = ij[faces[t]]  # (3, 2) x,y
        z = depths[faces[t]]
        if np.any(z < 0):  # behind-camera cull, whole-triangle
            continue
        # twice the signed area in screen coords (y down)
        area2 = (v[1, 0] - v[0, 0]) * (v[2, 1] - v[0, 1]) - (v[2, 0] - v[0, 0]) * (
            v[1, 1] - v[0, 1]
        )
        drawn_sign = 1.0 if scene.clockwise else -1.0
        if scene.backface_culling and area2 * drawn_sign <= 0:
            continue
        if area2 == 0:
            continue
        if bool(textured[t]) and not bool(shaded[t]):
            continue  # reference skips textured-but-unshaded triangles

        # bounding box of candidate pixels
        x0 = max(0, int(np.floor(v[:, 0].min() - offset)))
        x1 = min(w - 1, int(np.ceil(v[:, 0].max() - offset)))
        y0 = max(0, int(np.floor(v[:, 1].min() - offset)))
        y1 = min(h - 1, int(np.ceil(v[:, 1].max() - offset)))
        if x1 < x0 or y1 < y0:
            continue
        X = px[:1, x0 : x1 + 1]
        Y = py[y0 : y1 + 1, :1]

        # edge functions e_k(p) = (v_{k+1} - v_k) x (p - v_k); inside iff all
        # have the triangle's own orientation sign
        wts = []
        inside = np.ones((y1 - y0 + 1, x1 - x0 + 1), bool)
        for k in range(3):
            a, b = v[(k + 1) % 3], v[k]
            e = (a[0] - b[0]) * (Y - b[1]) - (X - b[0]) * (a[1] - b[1])
            inside &= (e * np.sign(area2)) >= 0
            wts.append(e / area2)  # barycentric weight of the OPPOSITE vertex
        if not inside.any():
            continue
        # wts[k] is the weight of vertex (k+2)%3 (the one opposite edge k)
        bary = np.stack([wts[(j + 1) % 3] for j in range(3)], axis=-1)  # (h', w', 3)

        zpix = bary @ z
        win = inside & (zpix < zbuf[y0 : y1 + 1, x0 : x1 + 1]) & np.isfinite(zpix)
        if not win.any():
            continue
        if bool(textured[t]) and tex is not None:
            uvpix = bary @ uv[faces_uv[t]]  # (h', w', 2)
            lum = bary @ shade[faces[t]]
            val = _bilinear(tex, uvpix[..., 0], uvpix[..., 1]) * lum[..., None]
        else:
            val = bary @ colors[faces[t]]
        sub_img = image[y0 : y1 + 1, x0 : x1 + 1]
        sub_z = zbuf[y0 : y1 + 1, x0 : x1 + 1]
        sub_img[win] = val[win]
        sub_z[win] = zpix[win]

    return image, zbuf
