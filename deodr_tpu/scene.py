"""Scene2D / Scene3D: user-facing scene classes.

API mirrors the reference (reference: deodr/differentiable_renderer.py:525-1174)
— same constructor signatures, same ``render`` / ``render_backward`` /
``render_compare_and_backward`` entry points, same gradient-buffer attributes
(``ij_b``, ``colors_b``, ...) — but internally everything is one pure JAX
function differentiated with jax.vjp; there is no hand-written adjoint chain
and no ``store_backward`` tape.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Iterable, Optional, Tuple, Union
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from deodr_tpu.camera import Camera
from deodr_tpu.geometry.mesh import ColoredTriMesh
from deodr_tpu.ops.render import SceneBuffers, render_scene, render_scene_jit


# supertile shape (in tiles) used by the planner when it enables two-level
# binning (ops.tiled._bin_to_tiles_hier): supertiles of 8 tile-rows × 4
# tile-cols keep n_super in the tens at 2048² while each covers a big
# enough region that coarse occupancy stays well below the item count
_SUPER_TY = 8
_SUPER_TX = 4

# texture-fetch block-width candidates measured by the planner (narrower
# blocks gate out more background pixels at object boundaries; fatter rows
# amortize the per-row gather cost better) — see TilingConfig.tex_block_w
_TEX_BW_CANDIDATES = (32, 64)


def _jit_scene2d_grads_factory():
    @partial(jax.jit, static_argnames=("sigma", "antialiase_error", "aa_edge_capacity", "tiling"))
    def grads(buffers, sigma, antialiase_error, obs, cotangent, aa_edge_capacity, tiling=None):
        def f(ij, colors, uv, shade, texture):
            b = dataclasses.replace(buffers, ij=ij, colors=colors, uv=uv, shade=shade, texture=texture)
            image, _, err = render_scene(
                b, sigma, antialiase_error=antialiase_error, obs=obs,
                aa_edge_capacity=aa_edge_capacity, tiling=tiling,
            )
            return err if antialiase_error else image
        _, vjp = jax.vjp(f, buffers.ij, buffers.colors, buffers.uv, buffers.shade, buffers.texture)
        return vjp(cotangent)

    return grads


_scene2d_grads = _jit_scene2d_grads_factory()


def _as_f(x):
    return None if x is None else jnp.asarray(x, dtype=jnp.result_type(float))


class Scene2D:
    """A 2.5D scene: projected 2D vertices with depths and per-vertex
    attributes (reference: deodr/differentiable_renderer.py:525-734)."""

    def __init__(
        self,
        faces,
        faces_uv,
        ij,
        depths,
        textured,
        uv,
        shade,
        colors,
        shaded,
        edgeflags,
        height,
        width,
        nb_colors,
        texture,
        background_image=None,
        background_color=None,
        clockwise: bool = False,
        backface_culling: bool = False,
        strict_edge: bool = True,
        perspective_correct: bool = False,
        integer_pixel_centers: bool = True,
    ):
        self.faces = np.asarray(faces)
        self.faces_uv = np.asarray(faces_uv)
        self.ij = np.asarray(ij, dtype=np.float64)
        self.depths = np.asarray(depths, dtype=np.float64).reshape(-1)
        self.textured = np.asarray(textured, dtype=bool).reshape(-1)
        self.uv = np.asarray(uv, dtype=np.float64)
        self.shade = np.asarray(shade, dtype=np.float64).reshape(-1)
        self.colors = np.asarray(colors, dtype=np.float64)
        self.shaded = np.asarray(shaded, dtype=bool).reshape(-1)
        self.edgeflags = np.asarray(edgeflags, dtype=bool)
        self.height = int(height)
        self.width = int(width)
        self.nb_colors = int(nb_colors)
        texture = np.asarray(texture, dtype=np.float64)
        self.texture = texture
        self.background_image = None if background_image is None else np.asarray(background_image, dtype=np.float64)
        self.background_color = None if background_color is None else np.asarray(background_color, dtype=np.float64)
        self.clockwise = bool(clockwise)
        self.backface_culling = bool(backface_culling)
        self.strict_edge = bool(strict_edge)
        self.perspective_correct = bool(perspective_correct)
        self.integer_pixel_centers = bool(integer_pixel_centers)

        # gradient accumulation buffers (reference-compatible)
        self.uv_b = np.zeros(self.uv.shape)
        self.ij_b = np.zeros(self.ij.shape)
        self.shade_b = np.zeros(self.shade.shape)
        self.colors_b = np.zeros(self.colors.shape)
        self.texture_b = np.zeros(self.texture.shape)
        self._store: Optional[Tuple] = None
        # full validation (incl. index ranges) once at construction; the
        # render entry points re-check shapes per call since fields are
        # mutable — mirrors the reference's validate-on-every-render
        # (reference: deodr/differentiable_renderer.py:48-126)
        from deodr_tpu.validate import validate_scene_buffers

        validate_scene_buffers(self._buffers(*self._diff_inputs()), check_indices=True)

    # -- functional core -----------------------------------------------------

    def _buffers(self, ij, colors, uv, shade, texture) -> SceneBuffers:
        has_texture = self.texture.size > 0
        return SceneBuffers(
            faces=jnp.asarray(self.faces.astype(np.int32)),
            faces_uv=jnp.asarray(self.faces_uv.astype(np.int32)),
            ij=ij,
            depths=_as_f(self.depths),
            uv=uv,
            shade=shade,
            colors=colors,
            edgeflags=jnp.asarray(self.edgeflags),
            textured=jnp.asarray(self.textured),
            shaded=jnp.asarray(self.shaded),
            texture=texture if has_texture else None,
            background_image=_as_f(self.background_image),
            background_color=_as_f(self.background_color),
            height=self.height,
            width=self.width,
            clockwise=self.clockwise,
            backface_culling=self.backface_culling,
            strict_edge=self.strict_edge,
            perspective_correct=self.perspective_correct,
            integer_pixel_centers=self.integer_pixel_centers,
        )

    def _diff_inputs(self):
        return (
            _as_f(self.ij),
            _as_f(self.colors),
            _as_f(self.uv),
            _as_f(self.shade),
            _as_f(self.texture),
        )

    def _aa_capacity(self, sigma) -> Optional[int]:
        """Static bound on the number of active AA edge bands: edges can only
        be composited where ``edgeflags`` is set, which is given statically."""
        if sigma <= 0:
            return None
        return int(np.sum(self.edgeflags))

    def _plan_tiling(self, sigma):
        """Tiled-path plan for large direct-2D scenes (round 2 review: the
        Scene2D path previously always paid the brute-force O(H·W·T) render
        in BOTH directions). Small scenes (≤ 256 faces — all the reference's
        2D test scenes) keep the brute path; capacities use power-of-two
        buckets so jit keys stay stable while the scene evolves."""
        if self.faces.shape[0] <= 256:
            return None
        from deodr_tpu.ops.render import default_impl
        from deodr_tpu.ops.tiled import suggest_tiling

        offset = 0.0 if self.integer_pixel_centers else 0.5
        return suggest_tiling(
            self.ij - offset,
            self.faces,
            self.height,
            self.width,
            sigma=float(sigma),
            edgeflags=self.edgeflags if sigma > 0 else None,
            for_pallas=(default_impl() == "pallas"),
        )

    def clear_gradients(self) -> None:
        self.uv_b = np.zeros(self.uv.shape)
        self.ij_b = np.zeros(self.ij.shape)
        self.shade_b = np.zeros(self.shade.shape)
        self.colors_b = np.zeros(self.colors.shape)
        self.texture_b = np.zeros(self.texture.shape)

    def _validated_buffers(self) -> SceneBuffers:
        from deodr_tpu.validate import validate_scene_buffers

        buffers = self._buffers(*self._diff_inputs())
        validate_scene_buffers(buffers, check_indices=False)  # shapes only: no sync
        return buffers

    def render(self, sigma: float = 1):
        """Returns (image, z_buffer)."""
        cap = self._aa_capacity(sigma)
        tiling = self._plan_tiling(sigma)
        buffers = self._validated_buffers()
        image, z_buffer, _ = render_scene_jit(
            buffers, float(sigma), aa_edge_capacity=cap, tiling=tiling, impl=None
        )
        self._store = ("image", float(sigma), cap, buffers, None, tiling)
        return jax.device_get((image, z_buffer))

    def render_error(self, obs, sigma: float = 1):
        """Returns (image, z_buffer, err_buffer) in antialiased-residual mode."""
        obs_j = _as_f(obs)
        cap = self._aa_capacity(sigma)
        tiling = self._plan_tiling(sigma)
        buffers = self._validated_buffers()
        image, z_buffer, err_buffer = render_scene_jit(
            buffers, float(sigma), antialiase_error=True, obs=obs_j, aa_edge_capacity=cap,
            tiling=tiling, impl=None,
        )
        self._store = ("error", float(sigma), cap, buffers, obs_j, tiling)
        return jax.device_get((image, z_buffer, err_buffer))

    def _check_backward_supported(self):
        if self.perspective_correct:
            raise BaseException("perspective_correct not supported yet for gradient back propagation")
        if not self.backface_culling:
            raise BaseException(
                "use backface_culling=True if you use gradient backpropagation"
                " to get valid gradient through edge anti-aliasing."
            )

    def _accumulate_grads(self, grads):
        # one batched device_get: each separate host fetch pays a full
        # device (tunnel) roundtrip
        ij_b, colors_b, uv_b, shade_b, texture_b = jax.device_get(grads)
        self.ij_b += ij_b
        self.colors_b += colors_b
        self.uv_b += uv_b
        self.shade_b += shade_b
        if self.texture.size > 0 and texture_b is not None:
            self.texture_b += texture_b

    def render_backward(self, image_b, make_copies: bool = True) -> None:
        self._check_backward_supported()
        assert self._store is not None and self._store[0] == "image", "call render first"
        _, sigma, cap, buffers, _, tiling = self._store
        grads = _scene2d_grads(buffers, sigma, False, None, _as_f(image_b), cap, tiling)
        self._accumulate_grads(grads)

    def render_error_backward(self, err_buffer_b, make_copies: bool = True) -> None:
        self._check_backward_supported()
        assert self._store is not None and self._store[0] == "error", "call render_error first"
        _, sigma, cap, buffers, obs_j, tiling = self._store
        grads = _scene2d_grads(buffers, sigma, True, obs_j, _as_f(err_buffer_b), cap, tiling)
        self._accumulate_grads(grads)

    def render_compare_and_backward(
        self,
        obs,
        sigma: float = 1,
        antialiase_error: bool = False,
        mask=None,
        clear_gradients: bool = True,
        make_copies: bool = True,
    ):
        """Render, compute the masked SSD loss against ``obs``, backpropagate
        (reference: deodr/differentiable_renderer.py:701-734).

        Returns (image, z_buffer, err_buffer, err).
        """
        if self.perspective_correct:
            raise BaseException("perspective_correct not supported yet for gradient back propagation")
        if mask is None:
            mask = np.ones((np.asarray(obs).shape[0], np.asarray(obs).shape[1]))
        if antialiase_error:
            image, z_buffer, err_buffer = self.render_error(obs, sigma)
        else:
            image, z_buffer = self.render(sigma)
        if clear_gradients:
            self.clear_gradients()
        if antialiase_error:
            err_buffer = err_buffer * mask
            err = float(np.sum(err_buffer))
            self.render_error_backward(mask)
        else:
            diff_image = (image - np.asarray(obs)) * mask[:, :, None]
            err_buffer = diff_image**2
            err = float(np.sum(err_buffer))
            image_b = 2 * diff_image
            self.render_backward(image_b)
        return image, z_buffer, err_buffer, err


class Scene3D:
    """A 3D scene: one mesh, one directional + one ambient light
    (reference: deodr/differentiable_renderer.py:737-1174)."""

    def __init__(
        self,
        sigma: float = 1,
        perspective_correct: bool = False,
        integer_pixel_centers: bool = True,
        impl: Optional[str] = None,
    ):
        # impl: None/"auto" = backend default ("pallas" on TPU, "xla"
        # elsewhere), or force "pallas" / "xla" / "brute" (untiled)
        self.impl = impl
        self.mesh: Optional[ColoredTriMesh] = None
        self.light_directional: Optional[np.ndarray] = None
        self.light_ambient: float = 0
        self.sigma = sigma
        self.perspective_correct = perspective_correct
        self.integer_pixel_centers = integer_pixel_centers
        self.background_image: Optional[np.ndarray] = None
        self.background_color: Optional[np.ndarray] = None
        self._store: Optional[Dict[str, Any]] = None

    def set_light(self, light_directional, light_ambient) -> None:
        self.light_directional = None if light_directional is None else np.asarray(light_directional)
        self.light_ambient = light_ambient

    def set_mesh(self, mesh: ColoredTriMesh) -> None:
        self.mesh = mesh

    def set_background(self, background_image) -> None:
        warnings.warn("deprecated, use set_background_image or set_background_color", UserWarning)
        self.set_background_image(background_image)

    def set_background_image(self, background_image) -> None:
        if self.background_color is not None:
            raise BaseException("you cannot provide both background image and background color")
        background_image = np.asanyarray(background_image)
        assert background_image.ndim == 3
        self.background_image = background_image

    def set_background_color(self, background_color: Union[Iterable[float], np.ndarray]) -> None:
        if self.background_image is not None:
            raise BaseException("you cannot provide both background image and background color")
        background_color = np.asanyarray(background_color, dtype=np.float64)
        assert background_color.ndim == 1
        self.background_color = background_color

    # -- pure rendering path -------------------------------------------------

    def _luminosity(self, vertices, light_directional, light_ambient):
        """max(0, −⟨n, l⟩) + ambient (reference:
        deodr/differentiable_renderer.py:814-822)."""
        adj = self.mesh.adjacencies
        if light_directional is not None:
            normals = adj.compute_vertex_normals(adj.compute_face_normals(vertices))
            directional = jnp.maximum(0.0, -jnp.sum(normals * light_directional, axis=1))
        else:
            directional = jnp.zeros(vertices.shape[0], dtype=vertices.dtype)
        return directional + light_ambient

    def compute_vertices_luminosity(self):
        assert self.mesh is not None
        ld = None if self.light_directional is None else _as_f(self.light_directional)
        return self._luminosity(_as_f(self.mesh.vertices), ld, self.light_ambient)

    def _build_buffers(
        self,
        camera: Camera,
        vertices,
        vertices_colors,
        light_directional,
        light_ambient,
        uv,
        texture,
        backface_culling: bool,
        depth_only_scale: Optional[float] = None,
        camera_arrays=None,
    ) -> Tuple[SceneBuffers, jnp.ndarray]:
        mesh = self.mesh
        if camera_arrays is not None:
            # traced camera pose: the cached render fns take
            # extrinsic/intrinsic/distortion as ARGUMENTS, so a new camera
            # pose re-uses the compiled render instead of recompiling it
            # (reference keeps project_points pose-parametric too:
            # deodr/differentiable_renderer.py:341-389)
            from deodr_tpu.camera import project_points_arrays

            ext, intr, dist = camera_arrays
            points_2d, depths = project_points_arrays(ext, intr, dist, vertices)
        else:
            points_2d, depths = camera.project_points(vertices)
        if self.sigma > 0:
            edgeflags = jax.lax.stop_gradient(mesh.edge_on_silhouette(points_2d))
        else:
            edgeflags = jnp.zeros((mesh.nb_faces, 3), dtype=bool)
        faces = jnp.asarray(mesh.faces)
        nbv = mesh.nb_vertices
        dtype = points_2d.dtype

        if depth_only_scale is not None:
            colors = depths[:, None] * depth_only_scale
            buffers = SceneBuffers(
                faces=faces,
                faces_uv=faces,
                ij=points_2d,
                depths=depths,
                uv=jnp.zeros((nbv, 2), dtype),
                shade=jnp.zeros((nbv,), dtype),
                colors=colors,
                edgeflags=edgeflags,
                textured=jnp.zeros((mesh.nb_faces,), bool),
                shaded=jnp.zeros((mesh.nb_faces,), bool),
                texture=None,
                background_image=_as_f(self.background_image),
                background_color=_as_f(self.background_color),
                height=camera.height,
                width=camera.width,
                clockwise=mesh.clockwise,
                backface_culling=backface_culling,
                strict_edge=True,
                perspective_correct=self.perspective_correct,
                integer_pixel_centers=self.integer_pixel_centers,
            )
            return buffers, depths

        if uv is not None:
            assert texture is not None
            faces_uv = jnp.asarray(mesh.faces_uv)
            textured = jnp.ones((mesh.nb_faces,), bool)
            shaded = jnp.ones((mesh.nb_faces,), bool)
            shade = self._luminosity(vertices, light_directional, light_ambient)
            nb_colors = texture.shape[2]
            colors = jnp.zeros((nbv, nb_colors), dtype)
        else:
            lum = self._luminosity(vertices, light_directional, light_ambient)
            colors = vertices_colors * lum[:, None]
            faces_uv = faces
            uv = jnp.zeros((nbv, 2), dtype)
            textured = jnp.zeros((mesh.nb_faces,), bool)
            shade = jnp.zeros((nbv,), dtype)
            shaded = jnp.zeros((mesh.nb_faces,), bool)
            texture = None

        buffers = SceneBuffers(
            faces=faces,
            faces_uv=faces_uv,
            ij=points_2d,
            depths=depths,
            uv=uv,
            shade=shade,
            colors=colors,
            edgeflags=edgeflags,
            textured=textured,
            shaded=shaded,
            texture=texture,
            background_image=_as_f(self.background_image),
            background_color=_as_f(self.background_color),
            height=camera.height,
            width=camera.width,
            clockwise=mesh.clockwise,
            backface_culling=backface_culling,
            strict_edge=True,
            perspective_correct=self.perspective_correct,
            integer_pixel_centers=self.integer_pixel_centers,
        )
        return buffers, depths

    def _eager_plan(self, camera, backface_culling: bool = True):
        """Eagerly (one cheap projection) pick the static render plan for
        this view: the silhouette-edge capacity (rounded to a power of two
        for jit-key stability) and, for large meshes, a tiling config with
        occupancy-derived bin capacities (counting only triangles the
        renderer will draw — culled faces inflate capacities ~4x and every
        per-tile table cost scales with them)."""
        mesh = self.mesh
        from deodr_tpu.ops.render import default_impl
        from deodr_tpu.ops.tiled import TilingConfig, _edge_band_tile_mask

        height, width = camera.height, camera.width
        sigma = float(self.sigma)
        impl_pref = self.impl if self.impl not in (None, "auto") else default_impl()
        want_tiling = mesh.nb_faces > 256 and impl_pref != "brute"
        for_pallas = impl_pref == "pallas"
        tile_w = 128 if for_pallas else 64
        tile_h_candidates = (8, 16, 32, 48, 64)
        offset = 0.0 if self.integer_pixel_centers else 0.5

        # ALL plan statistics are computed in ONE jitted device call that
        # returns a flat scalar vector: every host↔device sync through the
        # tunnel costs ~57 ms regardless of size, so the eager ops /
        # array transfers this used to do dominated the whole render call
        def make_plan_fn():
            def occupancy_counts(x_lo, x_hi, y_lo, y_hi, ok, n_ty, n_tx, th, tw):
                okf = ok.astype(jnp.float32)
                ty0 = jnp.clip(y_lo // th, 0, n_ty - 1).astype(jnp.int32)
                ty1 = jnp.clip(y_hi // th, 0, n_ty - 1).astype(jnp.int32)
                tx0 = jnp.clip(x_lo // tw, 0, n_tx - 1).astype(jnp.int32)
                tx1 = jnp.clip(x_hi // tw, 0, n_tx - 1).astype(jnp.int32)
                delta = jnp.zeros((n_ty + 1, n_tx + 1))
                delta = delta.at[ty0, tx0].add(okf)
                delta = delta.at[ty1 + 1, tx0].add(-okf)
                delta = delta.at[ty0, tx1 + 1].add(-okf)
                delta = delta.at[ty1 + 1, tx1 + 1].add(okf)
                return jnp.cumsum(jnp.cumsum(delta, axis=0), axis=1)[:n_ty, :n_tx]

            def f(vertices, ext, intr, dist):
                from deodr_tpu.camera import project_points_arrays

                points_2d, depths = project_points_arrays(
                    ext, intr, dist, jax.lax.stop_gradient(vertices)
                )
                pts = points_2d - offset
                faces = jnp.asarray(mesh.faces)
                stats = []
                if sigma > 0:
                    flags = mesh.edge_on_silhouette(points_2d)
                    visible = mesh.adjacencies.face_visible(points_2d)
                    flags = flags & visible[:, None]
                    flat = flags.reshape(-1)
                    i0 = faces[:, [1, 2, 0]].reshape(-1)
                    i1 = faces[:, [0, 1, 2]].reshape(-1)
                    span = jnp.abs(pts[i0] - pts[i1]) * flat[:, None]  # (3F, 2)
                    stats += [flags.sum(), span[:, 1].max(), span[:, 0].max()]
                    if mesh.texture is not None and mesh.uv is not None:
                        fuv = jnp.asarray(mesh.faces_uv if getattr(mesh, "faces_uv", None) is not None else mesh.faces)
                        uv = _as_f(mesh.uv)
                        j0 = fuv[:, [1, 2, 0]].reshape(-1)
                        j1 = fuv[:, [0, 1, 2]].reshape(-1)
                        uspan = jnp.abs(uv[j0] - uv[j1]) * flat[:, None]
                        # total segments at uv segment length 12 (the Pallas
                        # textured edge kernel pre-splits long-uv edges so a
                        # small static window bounds every segment's taps)
                        n_seg = jnp.where(flat, jnp.maximum(jnp.ceil(jnp.max(uspan, axis=1) / 12.0), 1.0), 0.0)
                        stats += [uspan[:, 1].max(), uspan[:, 0].max(), n_seg.sum()]
                    else:
                        stats += [jnp.zeros(()), jnp.zeros(()), jnp.zeros(())]
                else:
                    stats += [jnp.zeros(())] * 6
                if want_tiling:
                    tri = pts[faces]
                    # count only triangles the renderer will draw: the same
                    # cull predicate as ops.render._culling (behind-camera
                    # and, when enabled, backfacing triangles never rasterize
                    # and would inflate every per-tile capacity)
                    u_e = tri[:, 1, :] - tri[:, 0, :]
                    w_e = tri[:, 2, :] - tri[:, 0, :]
                    raw = 0.5 * (u_e[:, 0] * w_e[:, 1] - w_e[:, 0] * u_e[:, 1])
                    area = raw if mesh.clockwise else -raw
                    drawn = jnp.all(depths[faces] >= 0, axis=1)
                    if backface_culling:
                        drawn = drawn & (area > 0)
                    x_lo = jnp.clip(jnp.floor(tri[:, :, 0].min(axis=1)), 0, width - 1)
                    x_hi = jnp.clip(jnp.floor(tri[:, :, 0].max(axis=1)), 0, width - 1)
                    y_lo = jnp.clip(jnp.floor(tri[:, :, 1].min(axis=1)), 0, height - 1)
                    y_hi = jnp.clip(jnp.floor(tri[:, :, 1].max(axis=1)), 0, height - 1)
                    stats.append(jnp.median(tri[:, :, 1].max(axis=1) - tri[:, :, 1].min(axis=1)))
                    if sigma > 0:
                        p0 = pts[i0] * flat[:, None]
                        p1 = pts[i1] * flat[:, None]
                    occupied_tiles = []
                    super_occ = []
                    edge_sums = []
                    for th in tile_h_candidates:
                        n_ty = -(-height // th)
                        n_tx = -(-width // tile_w)
                        counts = occupancy_counts(x_lo, x_hi, y_lo, y_hi, drawn, n_ty, n_tx, th, tile_w)
                        stats.append(counts.max())
                        occupied_tiles.append((counts > 0).sum())
                        if sigma > 0:
                            m = _edge_band_tile_mask(
                                p0.astype(jnp.float32), p1.astype(jnp.float32), sigma,
                                flat, n_ty, n_tx, th, tile_w, height, width,
                            )
                            stats.append(m.sum(axis=1).max())
                            edge_sums.append(m.sum())
                        else:
                            stats.append(jnp.zeros(()))
                            edge_sums.append(jnp.zeros(()))
                        # supertile occupancy (two-level binning candidates):
                        # supertiles of SUPER_SHAPE tiles
                        n_sy = -(-n_ty // _SUPER_TY)
                        n_sx = -(-n_tx // _SUPER_TX)
                        super_occ.append(
                            occupancy_counts(
                                x_lo, x_hi, y_lo, y_hi, drawn,
                                n_sy, n_sx, th * _SUPER_TY, tile_w * _SUPER_TX,
                            ).max()
                        )
                    stats.append(drawn.sum())
                    # trailing (index 8 + 2·len(candidates) + k): tiles with a
                    # non-empty triangle bin, per tile-height candidate — sizes
                    # TilingConfig.tex_tile_capacity (tile-compacted texturing)
                    stats += occupied_tiles
                    # then supertile max occupancies, per candidate
                    stats += super_occ
                    # then occupied texture-fetch blocks at (8, bw) for the
                    # narrower block-width candidates (indices 8+4n, 8+4n+1)
                    n_by8 = -(-height // 8)
                    for bw_c in _TEX_BW_CANDIDATES:
                        n_bx = -(-width // bw_c)
                        cb = occupancy_counts(x_lo, x_hi, y_lo, y_hi, drawn, n_by8, n_bx, 8, bw_c)
                        stats.append((cb > 0).sum())
                    # trailing (8 + 4n + len(_TEX_BW_CANDIDATES) + k): TOTAL
                    # edge-band tile visits per tile-height candidate (SAT
                    # mask sum) — the edge pass's per-slot work is
                    # Σ visits × tile area, so these feed the edge-tile-
                    # height cost scoring (max occupancy alone cannot)
                    stats += edge_sums
                    # then per-candidate max bbox tile-ROW span + one
                    # tile-COLUMN span — sizes pair-expansion binning
                    # (ops/tiled.py::_bin_to_tiles_pairs)
                    for th in tile_h_candidates:
                        sy = jnp.floor(y_hi / th) - jnp.floor(y_lo / th) + 1
                        stats.append(jnp.max(jnp.where(drawn, sy, 0.0)))
                    sx = jnp.floor(x_hi / tile_w) - jnp.floor(x_lo / tile_w) + 1
                    stats.append(jnp.max(jnp.where(drawn, sx, 0.0)))
                return jnp.stack([jnp.asarray(s, jnp.float32) for s in stats])

            return jax.jit(f)

        # the plan FN is pose-parametric (extrinsic/intrinsic/distortion are
        # traced arguments): one compile serves every camera pose of the same
        # image size. Only the plan RESULT is pose-dependent.
        plan_key = ("plan", self._camera_static_key(camera), id(self.mesh), self.mesh.nb_vertices,
                    self.mesh.nb_faces, sigma, want_tiling, for_pallas, backface_culling)
        cache = self._cache()
        # unchanged vertices + pose → identical stats: reuse the previous
        # result (the fetch itself costs a full device roundtrip)
        version = getattr(mesh, "_geometry_version", 0)
        pose_bytes = self._camera_key(camera)
        cached = cache.get(("plan_result",) + plan_key)
        if cached is not None and cached[0] == (version, pose_bytes):
            stats = cached[1]
        else:
            plan_fn = cache.get(plan_key)
            if plan_fn is None:
                plan_fn = make_plan_fn()
                cache[plan_key] = plan_fn
            stats = np.asarray(
                plan_fn(_as_f(mesh.vertices), *self._camera_inputs(camera))
            )  # the ONE sync
            cache[("plan_result",) + plan_key] = ((version, pose_bytes), stats)

        cap = None
        aa_window = None
        aa_tex_window = None
        if sigma > 0:
            count = int(stats[0])
            # multiple-of-64 rounding with margin: pow2 buckets overshoot
            # ~1.6x on average and every per-edge setup cost scales with cap
            bucket = max(64, -(-int(count * 1.25) // 64) * 64)
            cap = min(3 * mesh.nb_faces, bucket)
            if count > 0:
                # static window bounding the largest silhouette band (edge
                # bbox + sigma on each side), bucketed for jit-key stability
                need_h = int(stats[1] + 2 * sigma + 4)
                need_w = int(stats[2] + 2 * sigma + 4)
                wh = min(int(2 ** np.ceil(np.log2(max(need_h, 8)))), height)
                ww = min(int(2 ** np.ceil(np.log2(max(need_w, 128)))), width)
                if wh * ww * 4 <= height * width:
                    aa_window = (wh, ww)
                if mesh.texture is not None and mesh.uv is not None:
                    # same idea in texture space: band uv lies on the segment
                    # [uv0, uv1], so per-edge texture taps fit a small window
                    tn_h = int(stats[3] + 4)
                    tn_w = int(stats[4] + 4)
                    th, tw = mesh.texture.shape[0], mesh.texture.shape[1]
                    twh = min(int(2 ** np.ceil(np.log2(max(tn_h, 8)))), th)
                    tww = min(int(2 ** np.ceil(np.log2(max(tn_w, 128)))), tw)
                    if (twh, tww) != (th, tw):
                        aa_tex_window = (twh, tww)

        tiling = None
        if want_tiling:
            med_h = float(stats[6])
            if med_h <= 12:
                # Pallas: 16-row solid tiles with 8-row EDGE tiles measured
                # fastest on the duck (14.07 vs 14.49 ms for 8/8 and 15.6
                # for 32/8): halving the solid tile count halves every
                # per-tile table/binning cost while bin occupancy only
                # grows ~1.6x; thin AA bands still want short tiles
                tile_h = 16 if for_pallas else 8
            elif med_h <= 32:
                tile_h = 16 if for_pallas else 32
            else:
                # 48 rows: measured fastest for the Pallas kernels on
                # big-triangle scenes (512² microbench, see bench.py) after
                # the round-4 band-clip work shrank per-slot vector costs
                tile_h = 48 if for_pallas else 64
            tile_h = min(tile_h, max(8, height))
            # debug/tuning override (stats exist for every candidate height)
            import os as _os

            _th_env = _os.environ.get("DEODR_TILE_H")
            if _th_env and int(_th_env) in tile_h_candidates:
                tile_h = min(int(_th_env), max(8, height))
            k = tile_h_candidates.index(tile_h)
            n_cand_e = len(tile_h_candidates)
            tri_cap = int(stats[7 + 2 * k])
            # Edge tile height. Textured Pallas scenes keep 8-row edge tiles
            # when the solid pass uses taller ones: the textured edge
            # kernel's per-visit cost is dominated by window sampling, and
            # 16-solid/8-edge measured fastest on the duck (10.6 vs 11.2
            # ms at edge 16). UNTEXTURED Pallas scenes pick the height by a
            # measured-cost model over the per-candidate SAT visit sums:
            # cost(th_e) = Σ visits(th_e) · (F + th_e · tile_w · c) — fixed
            # per-visit scalar work plus tile-area vector work. F and c are
            # calibrated on the 512² microbench edge-pass times (th_e = 8:
            # 0.869 ms, 48: 0.372 ms, per-visit sums 4831/1409): long-edge
            # scenes collapse their visit count with tall tiles (the
            # microbench loses 2.3x of its edge pass at 8-row tiles) while
            # short-band scenes keep short tiles. 64-row edge tiles are
            # excluded: measured slower than 48 despite fewer visits
            # (vreg/VMEM pressure the linear model cannot see).
            edge_tile_h = 8 if (for_pallas and tile_h > 8) else 0
            if (
                for_pallas
                and sigma > 0
                and mesh.texture is None
                and int(stats[0]) > 0
            ):
                base_es = 8 + 4 * n_cand_e + len(_TEX_BW_CANDIDATES)
                F_VISIT, C_PX = 1.63e-4, 1.64e-8  # ms; 512² microbench fit

                def edge_cost(th):
                    s = float(stats[base_es + tile_h_candidates.index(th)])
                    return s * (F_VISIT + th * tile_w * C_PX)

                cand_e = [th for th in tile_h_candidates if th <= 48 and th <= max(8, height)]
                best_e = min(cand_e, key=edge_cost)
                edge_tile_h = 0 if best_e == tile_h else best_e
            _eth_env = _os.environ.get("DEODR_EDGE_TILE_H")
            if _eth_env is not None and (int(_eth_env) == 0 or int(_eth_env) in tile_h_candidates):
                edge_tile_h = 0 if int(_eth_env) in (0, tile_h) else int(_eth_env)
            ek = tile_h_candidates.index(edge_tile_h) if edge_tile_h else k
            edge_cap = int(stats[8 + 2 * ek]) if sigma > 0 else 8

            def bucket(n, margin=1.5):
                import math

                n = max(1, int(math.ceil(n * margin)))
                return max(8, int(2 ** math.ceil(math.log2(n))))

            n_cand = len(tile_h_candidates)
            n_drawn = int(stats[7 + 2 * n_cand])
            n_tiles_sel = (-(-height // tile_h)) * (-(-width // tile_w))
            occ_tiles = int(stats[8 + 2 * n_cand + k])
            super_occ_sel = int(stats[8 + 3 * n_cand + k])
            tex_tile_cap = 0
            tex_block_w = 0
            occ_bw = 0  # stays 0 when no texture path is planned; the
            # hysteresis clause below must then still be well-defined (the
            # cached plan may carry tex capacities from a prior textured mesh)
            quad_fallback_cap = 0
            if for_pallas and mesh.texture is not None:
                # the texture fetch compacts 8-ROW blocks (independent of the
                # solid tile height; see _finish_shading_tile_tex), so size
                # from the 8-row candidate's occupancy — a safe upper bound
                # on the flag-based block count. Multiple-of-8 bucket with
                # margin; capped at the block count (at which point
                # compaction is a no-op but still correct).
                # margin 1.0 is drop-safe: bbox occupancy (measured) always
                # bounds the flag-based occupancy the fetch compaction uses,
                # so the capacity can never overflow for THIS geometry; the
                # 4x hysteresis band absorbs evolution across fit steps.
                # Block width: narrower blocks gate out more background
                # pixels (fewer fetched pixels) at a modest per-row cost —
                # pick the width minimizing total fetched pixels with a mild
                # preference for fatter rows on ties.
                import os as _os

                occ8 = int(stats[8 + 2 * n_cand + tile_h_candidates.index(8)])
                cands = [(tile_w, occ8)]
                for i, bw_c in enumerate(_TEX_BW_CANDIDATES):
                    cands.append((bw_c, int(stats[8 + 4 * n_cand + i])))
                _bw_env = _os.environ.get("DEODR_TEX_BW")
                if _bw_env:
                    tex_bw = int(_bw_env)
                    occ_bw = dict(cands).get(tex_bw, occ8 * (tile_w // tex_bw))
                else:
                    tex_bw, occ_bw = min(cands, key=lambda c: (c[0] * c[1], -c[0]))
                n_blocks_bw = (-(-height // 8)) * (-(-width // tex_bw))
                tex_tile_cap = min(max(8, -(-occ_bw // 8) * 8), n_blocks_bw)
                tex_block_w = 0 if tex_bw == tile_w else tex_bw
                # quad-granular texture fetch (bilinear_sample_quads): kept
                # OPT-IN (DEODR_QUAD_FETCH=1). Measured on the duck it cuts
                # the gather/scatter pair 4.5 → 1.1 ms but loses more than
                # that to window-table build/unbuild layout shuffles
                # (strided slices / dilated pads lower to ~90 µs ops inside
                # the fitting loop) — see PERFORMANCE.md "quad fetch".
                import os as _os

                tex_hw = mesh.texture.shape[:2]
                if (
                    _os.environ.get("DEODR_QUAD_FETCH")
                    and tile_h % 2 == 0
                    and tex_hw[0] % 2 == 0
                    and tex_hw[1] % 2 == 0
                    and min(tex_hw) >= 8
                ):
                    n_quads = tex_tile_cap * (8 // 2) * ((tex_block_w or tile_w) // 2)  # 8-row fetch blocks
                    need = -(-n_quads // 24)
                    quad_fallback_cap = min(n_quads, max(512, -(-need // 256) * 256))
            # large-mesh binning strategy, in preference order:
            # 1. pair-expansion binning when every drawn bbox spans few
            #    tiles (the tiny-triangle regime): slot lists by flat
            #    scatter + pair-routed table adjoints — replaces the
            #    one-hot compactions AND the supertile machinery
            #    (ops/tiled.py::_bin_to_tiles_pairs);
            # 2. two-level supertile binning once the dense (n_tiles × N)
            #    mask would be large and bboxes span too many tiles
            pair_ry = pair_rx = 0
            super_ty = super_tx = super_capacity = 0
            n_bin_items = n_drawn if for_pallas else mesh.nb_faces
            base_sp = 8 + 4 * n_cand + len(_TEX_BW_CANDIDATES) + n_cand
            span_y_sel = int(stats[base_sp + k])
            span_x_sel = int(stats[base_sp + n_cand])
            if (
                for_pallas
                and n_bin_items >= 8192
                and span_y_sel > 0
                and span_y_sel * span_x_sel <= 8
            ):
                pair_ry, pair_rx = span_y_sel, span_x_sel
            elif n_tiles_sel * max(n_bin_items, 1) > (1 << 22):
                super_ty, super_tx = _SUPER_TY, _SUPER_TX
                super_capacity = bucket(max(super_occ_sel, 8))
            tiling = TilingConfig(
                tile_h=tile_h,
                tile_w=tile_w,
                triangle_capacity=bucket(tri_cap),
                edge_capacity=bucket(edge_cap),
                # multiple-of-256 rounding: a pow2 bucket would round a
                # half-culled mesh right back up to the full size
                drawn_capacity=(min(-(-int(n_drawn * 1.2) // 256) * 256, mesh.nb_faces) if for_pallas else 0),
                edge_split=1,
                edge_segment_length=48.0,
                edge_tile_h=edge_tile_h,
                tex_tile_capacity=tex_tile_cap,
                tex_block_w=tex_block_w,
                quad_fallback_capacity=quad_fallback_cap,
                super_ty=super_ty,
                super_tx=super_tx,
                super_capacity=super_capacity,
                pair_ry=pair_ry,
                pair_rx=pair_rx,
            )

        # Pallas textured edge pass: per-segment texture windows + uv-split
        # plan (see deodr_tpu/ops/tiled.py::EdgeTexPlan). Long-uv silhouette
        # edges are pre-split so a small static window bounds every
        # segment's bilinear taps; fall back to the sequential windowed scan
        # when the window stack would not fit comfortably in VMEM.
        aa_tex_plan = None
        if (
            sigma > 0
            and cap is not None
            and int(stats[0]) > 0
            and for_pallas
            and tiling is not None
            and mesh.texture is not None
            and mesh.uv is not None
        ):
            from deodr_tpu.ops.tiled import EdgeTexPlan

            tex_h, tex_w = mesh.texture.shape[0], mesh.texture.shape[1]
            span = float(max(stats[3], stats[4]))
            pow2 = lambda n, lo: max(lo, int(2 ** np.ceil(np.log2(max(int(n), 1)))))
            if span <= 12.0:
                kwh = min(pow2(span + 4, 8), tex_h)
                kww = min(pow2(span + 4, 8), tex_w)
                n_split, seg_cap = 1, 0
                n_windows = cap
            else:
                # 8×8 windows over ~6-texel segments measured faster than
                # 16×16 over 12-texel ones on the duck (14.49 vs 14.65
                # ms/iter): the per-slot soft-one-hot matmuls shrink 4x
                # while the segment count only doubles. stats[5] counted
                # segments at 12-texel granularity — scale by 2.
                kwh, kww = min(8, tex_h), min(8, tex_w)
                n_split = pow2(np.ceil(span / 6.0), 2)
                seg_cap = max(64, -(-int(float(stats[5]) * 2.0 * 1.2) // 64) * 64)
                n_windows = seg_cap
            nb_c = mesh.texture.shape[2] if mesh.texture.ndim == 3 else 1
            vmem_bytes = 2 * n_windows * nb_c * kwh * kww * 4
            if vmem_bytes <= 32 << 20:
                seg_len = 6.0 if seg_cap else 12.0
                aa_tex_plan = EdgeTexPlan(
                    win_h=kwh, win_w=kww, n_split=n_split,
                    seg_capacity=seg_cap, uv_segment_length=seg_len,
                )

        # plan hysteresis: keep the previous plan while it still FITS the
        # fresh requirements and is not >4x overprovisioned — evolving
        # geometry otherwise flips bucketed sizes between adjacent powers
        # of two, recompiling the render on every flip
        last = cache.get(("last_plan",) + plan_key)
        if last is not None:
            l_cap, l_tiling, l_win, l_texwin, l_texplan = last
            if cap is not None and l_cap is not None and sigma > 0 and int(stats[0]) <= l_cap <= 4 * max(cap, 8):
                cap = l_cap
            if (
                tiling is not None
                and l_tiling is not None
                and l_tiling.tile_h == tiling.tile_h
                and l_tiling.tile_w == tiling.tile_w
                and l_tiling.edge_tile_h == tiling.edge_tile_h
                and tri_cap <= l_tiling.triangle_capacity <= 4 * tiling.triangle_capacity
                and edge_cap <= l_tiling.edge_capacity <= 4 * tiling.edge_capacity
                and (
                    (tiling.drawn_capacity == 0 and l_tiling.drawn_capacity == 0)
                    or n_drawn <= l_tiling.drawn_capacity <= 4 * max(tiling.drawn_capacity, 8)
                )
                and (
                    (tiling.tex_tile_capacity == 0 and l_tiling.tex_tile_capacity == 0)
                    or (
                        tiling.tex_tile_capacity > 0
                        and l_tiling.tex_block_w == tiling.tex_block_w
                        and occ_bw <= l_tiling.tex_tile_capacity <= 4 * max(tiling.tex_tile_capacity, 8)
                    )
                )
                and (
                    (tiling.super_capacity == 0 and l_tiling.super_capacity == 0)
                    or (
                        (tiling.super_ty, tiling.super_tx)
                        == (l_tiling.super_ty, l_tiling.super_tx)
                        and super_occ_sel
                        <= l_tiling.super_capacity
                        <= 4 * max(tiling.super_capacity, 8)
                    )
                )
                and (
                    (tiling.pair_ry == 0 and l_tiling.pair_ry == 0)
                    or (
                        tiling.pair_ry > 0
                        and span_y_sel <= l_tiling.pair_ry <= span_y_sel + 2
                        and span_x_sel <= l_tiling.pair_rx <= span_x_sel + 2
                    )
                )
            ):
                tiling = l_tiling
            if (
                aa_window is not None
                and l_win is not None
                and aa_window[0] <= l_win[0] <= 4 * aa_window[0]
                and aa_window[1] <= l_win[1] <= 4 * aa_window[1]
                and l_win[0] <= height
                and l_win[1] <= width
            ):
                aa_window = l_win
            if (
                aa_tex_window is not None
                and l_texwin is not None
                and aa_tex_window[0] <= l_texwin[0] <= 4 * aa_tex_window[0]
                and aa_tex_window[1] <= l_texwin[1] <= 4 * aa_tex_window[1]
            ):
                aa_tex_window = l_texwin
            if (
                aa_tex_plan is not None
                and l_texplan is not None
                and aa_tex_plan.win_h <= l_texplan.win_h <= 4 * aa_tex_plan.win_h
                and aa_tex_plan.win_w <= l_texplan.win_w <= 4 * aa_tex_plan.win_w
                and aa_tex_plan.n_split <= l_texplan.n_split <= 4 * max(aa_tex_plan.n_split, 1)
                and (
                    aa_tex_plan.seg_capacity
                    <= l_texplan.seg_capacity
                    <= 4 * max(aa_tex_plan.seg_capacity, 8)
                    or (aa_tex_plan.seg_capacity == 0 and l_texplan.seg_capacity == 0)
                )
            ):
                aa_tex_plan = l_texplan
        cache[("last_plan",) + plan_key] = (cap, tiling, aa_window, aa_tex_window, aa_tex_plan)
        return cap, tiling, aa_window, aa_tex_window, aa_tex_plan

    def _camera_key(self, camera: Camera):
        """Full pose bytes — used only to key cached plan RESULTS, never
        compiled functions (pose is a traced argument of those)."""
        dist = b"" if camera.distortion is None else camera.distortion.tobytes()
        return (camera.extrinsic.tobytes(), camera.intrinsic.tobytes(), dist, camera.height, camera.width)

    def _camera_static_key(self, camera: Camera):
        """The camera facts that change compiled shapes/structure: image size
        and distortion presence. Pose values are traced arguments."""
        return (camera.height, camera.width, camera.distortion is None)

    def _camera_inputs(self, camera: Camera):
        """Traced camera arrays for the cached render/plan functions."""
        return (
            _as_f(camera.extrinsic),
            _as_f(camera.intrinsic),
            None if camera.distortion is None else _as_f(camera.distortion),
        )

    # compiled fns + plan results; bounded so a long interactive session
    # (or a sweep over many meshes) cannot grow it without limit
    _JIT_CACHE_MAX = 128

    def _cache(self):
        import collections

        cache = self.__dict__.get("_jit_cache")
        if cache is None:
            cache = self.__dict__["_jit_cache"] = collections.OrderedDict()
        return cache

    def _get_cached_fn(self, key, make):
        cache = self._cache()
        fn = cache.get(key)
        if fn is None:
            fn = jax.jit(make())
            cache[key] = fn
            while len(cache) > self._JIT_CACHE_MAX:
                cache.popitem(last=False)
        else:
            cache.move_to_end(key)
        return fn

    def _diff_inputs(self, depth_only: bool):
        mesh = self.mesh
        has_uv = mesh.uv is not None and not depth_only
        return (
            _as_f(mesh.vertices),
            _as_f(mesh.vertices_colors) if mesh.vertices_colors is not None else None,
            _as_f(self.light_directional) if self.light_directional is not None else None,
            jnp.asarray(float(self.light_ambient)),
            _as_f(mesh.uv) if has_uv else None,
            _as_f(mesh.texture) if has_uv else None,
        )

    def _render_config(self, camera, backface_culling, depth_only_scale):
        cap, tiling, aa_window, aa_tex_window, aa_tex_plan = self._eager_plan(camera, backface_culling)
        diff_inputs = self._diff_inputs(depth_only_scale is not None)
        # camera pose arrays are TRACED arguments: the jit key carries only
        # shapes and static plan facts, so a moving camera (viewer orbit,
        # per-view fitting) re-uses one compilation per plan
        inputs = diff_inputs + self._camera_inputs(camera)
        key = (
            self.impl,
            self._camera_static_key(camera),
            id(self.mesh),
            self.mesh.nb_vertices,
            self.mesh.nb_faces,
            float(self.sigma),
            cap,
            tiling,
            aa_window,
            aa_tex_window,
            aa_tex_plan,
            backface_culling,
            depth_only_scale,
            tuple(None if x is None else x.shape for x in diff_inputs),
            None if self.background_image is None else self.background_image.tobytes(),
            None if self.background_color is None else self.background_color.tobytes(),
        )

        def make_forward():
            def f(vertices, colors, light_dir, light_amb, uv, texture, ext, intr, dist):
                buffers, _ = self._build_buffers(
                    camera, vertices, colors, light_dir, light_amb, uv, texture,
                    backface_culling, depth_only_scale, camera_arrays=(ext, intr, dist),
                )
                impl_arg = None if self.impl in (None, "auto", "brute") else self.impl
                image, z_buffer, _ = render_scene(
                    buffers, float(self.sigma), aa_edge_capacity=cap, tiling=tiling, impl=impl_arg,
                    aa_window=aa_window, aa_tex_window=aa_tex_window, aa_tex_plan=aa_tex_plan,
                )
                return image, z_buffer

            return f

        return key, inputs, make_forward

    def render(self, camera: Camera, return_z_buffer: bool = False, backface_culling: bool = True):
        assert self.mesh is not None, "You need to provide a mesh first."
        if (self.background_image is None) == (self.background_color is None):
            raise BaseException("You need to provide either a background image or background color")
        key, inputs, make_forward = self._render_config(camera, backface_culling, None)
        fwd = self._get_cached_fn(("fwd",) + key, make_forward)
        image, z_buffer = fwd(*inputs)
        self._store = {"mode": "render", "key": key, "inputs": inputs, "make": make_forward, "shape": image.shape}
        return jax.device_get((image, z_buffer)) if return_z_buffer else np.asarray(image)

    def render_backward(self, image_b) -> None:
        if self.perspective_correct:
            raise BaseException("perspective_correct not supported yet for gradient back propagation")
        assert self._store is not None and self._store["mode"] in ("render", "render_depth")
        key = self._store["key"]
        inputs = self._store["inputs"]
        make_forward = self._store["make"]

        def make_bwd():
            f = make_forward()

            def g(vertices, colors, light_dir, light_amb, uv, texture, ext, intr, dist, cotangent):
                def image_only(*args):
                    # camera pose is traced but NOT differentiated (the
                    # reference's _b surface has no pose gradients either)
                    return f(*args, ext, intr, dist)[0]

                _, vjp = jax.vjp(image_only, vertices, colors, light_dir, light_amb, uv, texture)
                return vjp(cotangent)

            return g

        bwd = self._get_cached_fn(("bwd",) + key, make_bwd)
        # one batched device_get: each separate host fetch pays a full
        # device (tunnel) roundtrip
        vertices_b, colors_b, light_dir_b, light_amb_b, uv_b, texture_b = jax.device_get(
            bwd(*inputs, _as_f(image_b))
        )
        mesh = self.mesh
        mesh._vertices_b = vertices_b
        mesh.vertices_colors_b = colors_b
        self.light_directional_b = light_dir_b
        self.light_ambient_b = float(light_amb_b)
        if uv_b is not None:
            mesh.uv_b = uv_b
        if texture_b is not None:
            mesh.texture_b = texture_b

    def render_depth(self, camera: Camera, depth_scale: float = 1, backface_culling: bool = True):
        assert self.mesh is not None
        key, inputs, make_forward = self._render_config(camera, backface_culling, float(depth_scale))
        fwd = self._get_cached_fn(("fwd",) + key, make_forward)
        image, _ = fwd(*inputs)
        self._store = {"mode": "render_depth", "key": key, "inputs": inputs, "make": make_forward, "shape": image.shape}
        return np.asarray(image)

    def render_depth_backward(self, depth_b) -> None:
        self.render_backward(depth_b)

    def clear_gradients(self) -> None:
        pass  # gradients are recomputed functionally; nothing persistent to clear

    def render_deferred(
        self,
        camera: Camera,
        depth_scale: float = 1,
        color: bool = True,
        depth: bool = True,
        face_id: bool = True,
        barycentric: bool = True,
        normal: bool = True,
        luminosity: bool = True,
        uv: bool = True,
        xyz: bool = True,
        backface_culling: bool = True,
    ) -> Dict[str, np.ndarray]:
        """G-buffer rendering: explode the mesh into a triangle soup and
        rasterize arbitrary channels in one pass (reference:
        deodr/differentiable_renderer.py:1053-1174). Non-differentiable
        utility path; requires sigma == 0."""
        assert self.mesh is not None, "You need to provide a mesh first"
        if self.sigma > 0:
            raise BaseException(
                "Antialiasing is not supposed to be used when using deferred rendering, please use sigma==0"
            )
        mesh = self.mesh
        vertices = _as_f(mesh.vertices)
        points_2d, depths = camera.project_points(vertices)
        faces = np.asarray(mesh.faces)
        nf = mesh.nb_faces
        soup_nv = 3 * nf
        soup_faces = np.arange(soup_nv, dtype=np.int32).reshape(nf, 3)
        soup_ij = jnp.asarray(points_2d)[jnp.asarray(faces)].reshape(soup_nv, 2)
        soup_depths = jnp.asarray(depths)[jnp.asarray(faces)].reshape(soup_nv)

        channels: Dict[str, jnp.ndarray] = {}
        if depth:
            channels["depth"] = soup_depths[:, None] * depth_scale
        if face_id:
            channels["face_id"] = jnp.tile(jnp.arange(nf, dtype=jnp.result_type(float))[:, None], (1, 3)).reshape(
                soup_nv, 1
            )
        if barycentric:
            channels["barycentric"] = jnp.tile(jnp.eye(3)[None], (nf, 1, 1)).reshape(soup_nv, 3)
        if normal or luminosity:
            mesh_vertex_normals = mesh.adjacencies.compute_vertex_normals(
                mesh.adjacencies.compute_face_normals(vertices)
            )
        if normal:
            channels["normal"] = mesh_vertex_normals[jnp.asarray(faces)].reshape(soup_nv, 3)
        if luminosity:
            lum = self.compute_vertices_luminosity()
            channels["luminosity"] = lum[jnp.asarray(faces)].reshape(soup_nv, 1)
        if xyz:
            channels["xyz"] = vertices[jnp.asarray(faces)].reshape(soup_nv, 3)
        if mesh.uv is None:
            if color and mesh.vertices_colors is not None:
                channels["color"] = _as_f(mesh.vertices_colors)[jnp.asarray(faces)].reshape(soup_nv, -1)
        elif uv:
            channels["uv"] = _as_f(mesh.uv)[jnp.asarray(mesh.faces_uv)].reshape(soup_nv, 2)

        offset = 0
        ranges = {}
        for k, v in channels.items():
            size = v.shape[1]
            ranges[k] = (offset, offset + size)
            offset += size
        colors = jnp.column_stack(list(channels.values()))
        nb_colors = colors.shape[1]

        background_image = jnp.zeros((camera.height, camera.width, nb_colors))
        if "depth" in channels:
            lo, hi = ranges["depth"]
            background_image = background_image.at[:, :, lo:hi].set(jnp.max(soup_depths))

        dtype = colors.dtype
        buffers = SceneBuffers(
            faces=jnp.asarray(soup_faces),
            faces_uv=jnp.asarray(soup_faces),
            ij=soup_ij,
            depths=soup_depths,
            uv=jnp.zeros((soup_nv, 2), dtype),
            shade=jnp.zeros((soup_nv,), dtype),
            colors=colors,
            edgeflags=jnp.zeros((nf, 3), bool),
            textured=jnp.zeros((nf,), bool),
            shaded=jnp.zeros((nf,), bool),
            texture=None,
            background_image=background_image,
            background_color=None,
            height=camera.height,
            width=camera.width,
            clockwise=mesh.clockwise,
            backface_culling=backface_culling,
            strict_edge=True,
            perspective_correct=self.perspective_correct,
            integer_pixel_centers=self.integer_pixel_centers,
        )
        tiling = None
        if nf > 256:
            from deodr_tpu.ops.render import default_impl
            from deodr_tpu.ops.tiled import suggest_tiling

            offset = 0.0 if self.integer_pixel_centers else 0.5
            tiling = suggest_tiling(
                np.asarray(soup_ij) - offset,
                np.asarray(soup_faces),
                camera.height,
                camera.width,
                for_pallas=(default_impl() == "pallas"),
            )
        image, _, _ = render_scene_jit(buffers, 0.0, tiling=tiling, impl=None)
        image = np.asarray(image)
        return {k: image[:, :, ranges[k][0] : ranges[k][1]] for k in channels}
