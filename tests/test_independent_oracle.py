"""Statistical differential test against the independent-formulation
sample-test rasterizer (tests/sample_oracle.py).

Every other oracle in the repo derives from DEODR's stencil-equation
formulation; this one derives from point-in-halfplane sampling. On random
scenes the two must agree on ≥ 99.9% of pixels (boundary pixels, where the
inclusion rules legitimately differ, are the budget) — and the σ>0 edge
pass must only ever touch pixels inside the geometric silhouette bands.
"""

import numpy as np
import jax.numpy as jnp

from deodr_tpu.ops.render import SceneBuffers, render_scene_jit
from sample_oracle import rasterize_sample_test


def _random_scene(seed, h=96, w=128, n_tri=40, textured=False, clockwise=False,
                  background_image=False, integer_pixel_centers=True):
    rng = np.random.RandomState(seed)
    ctr = rng.rand(n_tri, 1, 2) * [w - 8, h - 8] + 4
    tri = ctr + (rng.rand(n_tri, 3, 2) - 0.5) * 30
    u = tri[:, 1] - tri[:, 0]
    v = tri[:, 2] - tri[:, 0]
    cross = u[:, 0] * v[:, 1] - v[:, 0] * u[:, 1]
    # orient every triangle drawable for the requested winding
    flip = (cross > 0) != clockwise
    tri[flip] = tri[flip][:, [0, 2, 1]]
    faces = np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3)
    tex = rng.rand(24, 17, 3) if textured else None
    bg_img = rng.rand(h, w, 3) if background_image else None
    return SceneBuffers(
        faces=jnp.asarray(faces),
        faces_uv=jnp.asarray(faces),
        ij=jnp.asarray(tri.reshape(-1, 2)),
        depths=jnp.asarray(np.repeat(rng.rand(n_tri) * 2 + 0.3, 3)),
        uv=jnp.asarray(rng.rand(3 * n_tri, 2) * [15, 22] + 0.5),
        shade=jnp.asarray(rng.rand(3 * n_tri)),
        colors=jnp.asarray(rng.rand(3 * n_tri, 3)),
        edgeflags=jnp.ones((n_tri, 3), bool),
        textured=jnp.asarray(rng.rand(n_tri) < (0.5 if textured else 0.0)),
        shaded=jnp.ones(n_tri, bool),
        texture=None if tex is None else jnp.asarray(tex),
        background_image=None if bg_img is None else jnp.asarray(bg_img),
        background_color=None if bg_img is not None else jnp.asarray(rng.rand(3)),
        height=h,
        width=w,
        clockwise=clockwise,
        integer_pixel_centers=integer_pixel_centers,
    )


def _agreement(scene):
    img_ref, _ = rasterize_sample_test(scene)
    img, _, _ = render_scene_jit(scene, 0.0)
    img = np.asarray(img)
    bad = np.any(np.abs(img - img_ref) > 1e-6, axis=-1)
    return 1.0 - bad.mean(), bad


def test_sample_oracle_agrees_vertex_colors():
    total_bad, total_px = 0, 0
    for seed in range(6):
        frac, bad = _agreement(_random_scene(seed))
        total_bad += bad.sum()
        total_px += bad.size
        assert frac > 0.995, f"seed {seed}: only {frac:.4%} pixels agree"
    assert 1.0 - total_bad / total_px > 0.999, (
        f"aggregate agreement {1.0 - total_bad / total_px:.5%} below 99.9%"
    )


def test_sample_oracle_agrees_textured():
    total_bad, total_px = 0, 0
    for seed in range(6, 12):
        frac, bad = _agreement(_random_scene(seed, textured=True))
        total_bad += bad.sum()
        total_px += bad.size
        assert frac > 0.995, f"seed {seed}: only {frac:.4%} pixels agree"
    assert 1.0 - total_bad / total_px > 0.999


def test_sample_oracle_agrees_clockwise_and_halfpixel():
    for seed, kw in ((20, dict(clockwise=True)),
                     (21, dict(integer_pixel_centers=False)),
                     (22, dict(background_image=True))):
        frac, _ = _agreement(_random_scene(seed, **kw))
        assert frac > 0.995, f"{kw}: only {frac:.4%} pixels agree"


def _point_segment_dist(p, a, b):
    """Distance from points p (N, 2) to segment [a, b]."""
    ab = b - a
    t = np.clip(((p - a) @ ab) / max(ab @ ab, 1e-30), 0.0, 1.0)
    proj = a + t[:, None] * ab[None, :]
    return np.linalg.norm(p - proj, axis=1)


def test_edge_pass_touches_only_silhouette_bands():
    """Geometric band sanity, independent of the stencil equations: every
    pixel the σ>0 edge pass changes must lie within sigma + 1.5 px of some
    active silhouette edge segment."""
    sigma = 2.0
    scene = _random_scene(31, n_tri=12)
    img0, _, _ = render_scene_jit(scene, 0.0)
    img1, _, _ = render_scene_jit(scene, sigma, aa_edge_capacity=64)
    changed = np.any(np.abs(np.asarray(img1) - np.asarray(img0)) > 1e-9, axis=-1)
    ys, xs = np.nonzero(changed)
    if len(ys) == 0:
        return
    pts = np.stack([xs, ys], axis=1).astype(np.float64)

    ij = np.asarray(scene.ij)
    faces = np.asarray(scene.faces)
    flags = np.asarray(scene.edgeflags)
    depths = np.asarray(scene.depths)
    dmin = np.full(len(pts), np.inf)
    for t in range(faces.shape[0]):
        v = ij[faces[t]]
        z = depths[faces[t]]
        if np.any(z < 0):
            continue
        u = v[1] - v[0]
        w2 = v[2] - v[0]
        if (u[0] * w2[1] - w2[0] * u[1]) >= 0:  # back-facing (ccw scenes)
            continue
        for k, (i0, i1) in enumerate(((1, 0), (2, 1), (0, 2))):
            if not flags[t, k]:
                continue
            dmin = np.minimum(dmin, _point_segment_dist(pts, v[i0], v[i1]))
    assert dmin.max() <= sigma + 1.5, (
        f"edge pass changed a pixel {dmin.max():.2f} px from any silhouette edge"
    )
