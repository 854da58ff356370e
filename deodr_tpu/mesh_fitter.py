"""Mesh fitting by analysis-by-synthesis (depth / RGB / multi-view).

API and optimizer semantics mirror the reference fitters exactly — same
heavy-ball update rule, same per-parameter step factors and clamps, same
quaternion-tangent-space gradient trick (reference: deodr/mesh_fitter.py).
The difference is architectural: each fitter builds ONE pure jitted
energy-and-gradient function (rendering included), so a whole optimization
step is a single compiled XLA computation instead of the reference's
Python-chained forward/backward passes.
"""

from __future__ import annotations

import copy
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np
import scipy.spatial.transform
import jax
import jax.numpy as jnp

from deodr_tpu.camera import Camera
from deodr_tpu.geometry.energy import LaplacianRigidEnergy
from deodr_tpu.geometry.mesh import ColoredTriMesh
from deodr_tpu.geometry.transforms import normalize, qrot
from deodr_tpu.ops.render import SceneBuffers, render_scene


def mult_and_clamp(x, a, t):
    return np.minimum(np.maximum(x * a, -t), t)


def _next_pow2_bucket(count: int, lo: int = 8) -> int:
    return int(2 ** np.ceil(np.log2(max(count, lo))))


class _FitterRenderCore:
    """Shared jitted render-energy machinery for the fitters."""

    def __init__(self, mesh: ColoredTriMesh, sigma: float = 1.0):
        self.mesh = mesh
        self.sigma = float(sigma)
        self._jit_cache: Dict = {}
        # every check_every planned steps, the step additionally runs its
        # check_capacity=True (checkify) variant: the bbox-stats plan
        # validation bounds the tri/edge/AA bins, but the checkified render
        # asserts EVERY static capacity from the actual bin counts — the
        # safety net against a capacity class the stats vector cannot see
        # (set 0 to disable)
        self.check_every: int = 25
        self._n_planned_steps: int = 0

    def silhouette_capacity(self, camera: Camera, vertices) -> Optional[int]:
        return self.plan(camera, vertices)[0]

    def plan(self, camera: Camera, vertices):
        """Eager per-step render plan: (aa edge capacity, tiling config).

        One jitted device call returning a flat scalar vector + one sync —
        every host↔device roundtrip costs ~57 ms on a tunneled TPU, so the
        eager silhouette/occupancy ops this used to run dominated each
        fitting step."""
        return self._plan_impl(camera, jnp.asarray(vertices)[None])

    def plan_multi(self, camera: Camera, vertices_stack):
        """One plan covering a whole stack of per-frame geometries (F, V, 3):
        the plan statistics are vmapped over frames and maxed, so a
        multi-frame fitter pays ONE plan sync per step instead of one per
        frame — and every frame shares one compiled step function."""
        return self._plan_impl(camera, jnp.asarray(vertices_stack))

    def _plan_ctx(self, camera: Camera):
        from deodr_tpu.ops.render import default_impl

        want_tiling = self.mesh.nb_faces > 256
        for_pallas = default_impl() == "pallas"
        key = (
            "plan", camera.extrinsic.tobytes(), camera.intrinsic.tobytes(),
            b"" if camera.distortion is None else np.asarray(camera.distortion).tobytes(),
            camera.height, camera.width, want_tiling, for_pallas,
        )
        return want_tiling, for_pallas, (128 if for_pallas else 64), (8, 16, 32, 48, 64), key

    def plan_guess(self, camera: Camera):
        """Last accepted plan for this camera (None before the first step).
        Steps run with the guess and validate it afterwards against plan
        statistics fetched in the SAME host sync as the step results —
        one roundtrip per iteration instead of two."""
        key = self._plan_ctx(camera)[4]
        return self._jit_cache.get(("last_plan",) + key[1:])

    def plan_fits(self, camera: Camera, stats, cap, tiling) -> bool:
        """Was (cap, tiling) sufficient for geometry with these statistics —
        no silhouette edge dropped, no bin overflowed?"""
        want_tiling, _, _, cands, _ = self._plan_ctx(camera)
        if self.sigma > 0 and (cap is None or int(stats[0]) > cap):
            return False
        if want_tiling:
            if tiling is None:
                return False
            k = cands.index(tiling.tile_h)
            if int(stats[2 + 2 * k]) > tiling.triangle_capacity:
                return False
            ek = cands.index(tiling.edge_tile_h) if tiling.edge_tile_h else k
            if self.sigma > 0 and int(stats[3 + 2 * ek]) > tiling.edge_capacity:
                return False
        return True

    def stats_dispatch(self, camera: Camera, verts_batch):
        """Dispatch (WITHOUT syncing) the jitted plan-statistics computation
        over a (F, V, 3) stack of geometries; returns the device array."""
        from deodr_tpu.ops.tiled import _edge_band_tile_mask

        mesh = self.mesh
        sigma = self.sigma
        height, width = camera.height, camera.width
        want_tiling, for_pallas, tile_w, tile_h_candidates, key = self._plan_ctx(camera)

        def make_plan_fn():
            def occupancy(x_lo, x_hi, y_lo, y_hi, n_ty, n_tx, th, tw):
                ty0 = jnp.clip(y_lo // th, 0, n_ty - 1).astype(jnp.int32)
                ty1 = jnp.clip(y_hi // th, 0, n_ty - 1).astype(jnp.int32)
                tx0 = jnp.clip(x_lo // tw, 0, n_tx - 1).astype(jnp.int32)
                tx1 = jnp.clip(x_hi // tw, 0, n_tx - 1).astype(jnp.int32)
                delta = jnp.zeros((n_ty + 1, n_tx + 1))
                delta = delta.at[ty0, tx0].add(1.0)
                delta = delta.at[ty1 + 1, tx0].add(-1.0)
                delta = delta.at[ty0, tx1 + 1].add(-1.0)
                delta = delta.at[ty1 + 1, tx1 + 1].add(1.0)
                return jnp.cumsum(jnp.cumsum(delta, axis=0), axis=1)[:n_ty, :n_tx].max()

            def f(vertices_j):
                pts, _ = camera.project_points(jax.lax.stop_gradient(vertices_j))
                faces = jnp.asarray(mesh.faces)
                stats = []
                if sigma > 0:
                    flags = mesh.edge_on_silhouette(pts)
                    visible = mesh.adjacencies.face_visible(pts)
                    flat = (flags & visible[:, None]).reshape(-1)
                    stats.append(flat.sum())
                else:
                    flat = None
                    stats.append(jnp.zeros(()))
                if want_tiling:
                    tri = pts[faces]
                    x_lo = jnp.clip(jnp.floor(tri[:, :, 0].min(axis=1)), 0, width - 1)
                    x_hi = jnp.clip(jnp.floor(tri[:, :, 0].max(axis=1)), 0, width - 1)
                    y_lo = jnp.clip(jnp.floor(tri[:, :, 1].min(axis=1)), 0, height - 1)
                    y_hi = jnp.clip(jnp.floor(tri[:, :, 1].max(axis=1)), 0, height - 1)
                    stats.append(jnp.median(tri[:, :, 1].max(axis=1) - tri[:, :, 1].min(axis=1)))
                    if sigma > 0:
                        i0 = faces[:, [1, 2, 0]].reshape(-1)
                        i1 = faces[:, [0, 1, 2]].reshape(-1)
                        p0 = pts[i0] * flat[:, None]
                        p1 = pts[i1] * flat[:, None]
                    edge_sums = []
                    for th in tile_h_candidates:
                        n_ty = -(-height // th)
                        n_tx = -(-width // tile_w)
                        stats.append(occupancy(x_lo, x_hi, y_lo, y_hi, n_ty, n_tx, th, tile_w))
                        if sigma > 0:
                            m = _edge_band_tile_mask(
                                p0.astype(jnp.float32), p1.astype(jnp.float32), float(sigma),
                                flat, n_ty, n_tx, th, tile_w, height, width,
                            )
                            stats.append(m.sum(axis=1).max())
                            edge_sums.append(m.sum())
                        else:
                            stats.append(jnp.zeros(()))
                            edge_sums.append(jnp.zeros(()))
                    # trailing (2 + 2n + k): total edge-band tile visits per
                    # candidate — feeds the edge-tile-height cost scoring
                    # (see Scene3D._eager_plan)
                    stats += edge_sums
                return jnp.stack([jnp.asarray(s, jnp.float32) for s in stats])

            return jax.jit(jax.vmap(f))

        plan_fn = self._jit_cache.get(key)
        if plan_fn is None:
            plan_fn = make_plan_fn()
            self._jit_cache[key] = plan_fn
        return plan_fn(verts_batch)

    def _plan_impl(self, camera: Camera, verts_batch):
        stats = np.asarray(jax.device_get(self.stats_dispatch(camera, verts_batch))).max(axis=0)
        return self.plan_from_stats(camera, stats)

    def plan_from_stats(self, camera: Camera, stats):
        """Turn fetched plan statistics into (cap, tiling), apply hysteresis,
        and record the result as the camera's last accepted plan."""
        from deodr_tpu.ops.tiled import TilingConfig

        mesh = self.mesh
        sigma = self.sigma
        height, width = camera.height, camera.width
        want_tiling, for_pallas, tile_w, tile_h_candidates, key = self._plan_ctx(camera)

        cap = None
        need_count = 0
        if sigma > 0:
            need_count = int(stats[0])
            cap = min(3 * mesh.nb_faces, _next_pow2_bucket(need_count))
        tiling = None
        tri_cap = edge_cap = 0
        if want_tiling:
            med_h = float(stats[1])
            if med_h <= 12:
                tile_h = 8
            elif med_h <= 32:
                tile_h = 16 if for_pallas else 32
            else:
                # 48 rows measured fastest for Pallas on big-triangle scenes
                # (see bench.py / Scene3D._eager_plan)
                tile_h = 48 if for_pallas else 64
            tile_h = min(tile_h, max(8, height))
            k = tile_h_candidates.index(tile_h)
            tri_cap = int(stats[2 + 2 * k])
            # untextured Pallas edge pass: edge tile height by the measured
            # visit-cost model (see Scene3D._eager_plan for the calibration)
            edge_tile_h = 0
            if for_pallas and sigma > 0 and int(stats[0]) > 0:
                n_cand = len(tile_h_candidates)
                F_VISIT, C_PX = 1.63e-4, 1.64e-8

                def edge_cost(th):
                    s = float(stats[2 + 2 * n_cand + tile_h_candidates.index(th)])
                    return s * (F_VISIT + th * tile_w * C_PX)

                cand_e = [th for th in tile_h_candidates if th <= 48 and th <= max(8, height)]
                best_e = min(cand_e, key=edge_cost)
                edge_tile_h = 0 if best_e == tile_h else best_e
            ek = tile_h_candidates.index(edge_tile_h) if edge_tile_h else k
            edge_cap = int(stats[3 + 2 * ek]) if sigma > 0 else 8

            def bucket(n, margin=1.5):
                import math

                n = max(1, int(math.ceil(n * margin)))
                return max(8, int(2 ** math.ceil(math.log2(n))))

            # two-level binning guard for large fits: the supertile occupancy
            # is not in the fitter's stats vector, but it is bounded by the
            # sum of its member tiles' occupancies — use that (safe, never
            # drops items) rather than adding another stats round-trip
            super_ty = super_tx = super_capacity = 0
            n_tiles_sel = (-(-height // tile_h)) * (-(-width // tile_w))
            if n_tiles_sel * max(mesh.nb_faces, 1) > (1 << 22):
                from deodr_tpu.scene import _SUPER_TY, _SUPER_TX

                super_ty, super_tx = _SUPER_TY, _SUPER_TX
                super_capacity = bucket(
                    min(mesh.nb_faces, max(tri_cap, 1) * super_ty * super_tx)
                )
            tiling = TilingConfig(
                tile_h=tile_h,
                tile_w=tile_w,
                triangle_capacity=bucket(tri_cap),
                edge_capacity=bucket(edge_cap),
                edge_split=1,
                edge_segment_length=48.0,
                edge_tile_h=edge_tile_h,
                super_ty=super_ty,
                super_tx=super_tx,
                super_capacity=super_capacity,
            )

        # plan hysteresis: geometry evolving across fitting iterations makes
        # the bucketed capacities flip between adjacent powers of two, and
        # every change recompiles the step — keep the previous plan while it
        # still FITS the fresh requirements and is not >4x overprovisioned
        last = self._jit_cache.get(("last_plan",) + key[1:])
        if last is not None:
            last_cap, last_tiling = last
            if cap is not None and last_cap is not None and need_count <= last_cap <= 4 * max(cap, 8):
                cap = last_cap
            if (
                tiling is not None
                and last_tiling is not None
                and last_tiling.tile_h == tiling.tile_h
                and last_tiling.tile_w == tiling.tile_w
                and last_tiling.edge_tile_h == tiling.edge_tile_h
                and tri_cap <= last_tiling.triangle_capacity <= 4 * tiling.triangle_capacity
                and edge_cap <= last_tiling.edge_capacity <= 4 * tiling.edge_capacity
                # explicit super-capacity fit: the tile-sum bound that sized
                # super_capacity above must also hold for the KEPT plan (do
                # not rely on bucket() distributing over the 32x factor)
                and (
                    (tiling.super_capacity == 0 and last_tiling.super_capacity == 0)
                    or (
                        tiling.super_capacity > 0
                        and (tiling.super_ty, tiling.super_tx)
                        == (last_tiling.super_ty, last_tiling.super_tx)
                        and min(
                            mesh.nb_faces,
                            max(tri_cap, 1) * tiling.super_ty * tiling.super_tx,
                        )
                        <= last_tiling.super_capacity
                    )
                )
            ):
                tiling = last_tiling
        self._jit_cache[("last_plan",) + key[1:]] = (cap, tiling)
        return cap, tiling

    def cached(self, key, make):
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(make())
            self._jit_cache[key] = fn
        return fn

    def planned_step(self, camera: Camera, verts_batch, key_prefix, extra_key, make_fn, args, fetch_selector):
        """One fitting step with ONE host sync.

        Dispatches the plan statistics and the step (run with the last
        accepted plan) asynchronously, then fetches the statistics together
        with ``fetch_selector(out)`` in a single ``device_get`` — on a
        tunneled TPU each sync costs ~57 ms, so this halves the per-iteration
        floor versus plan-then-step. If the guessed plan turns out to
        under-provision a bin (rare: geometry changed sharply), the step is
        re-run once with a fresh plan, so results are always exact.

        Returns (out_device, fetched).
        """
        stats_dev = self.stats_dispatch(camera, verts_batch)
        guess = self.plan_guess(camera)
        if guess is None:
            stats = np.asarray(jax.device_get(stats_dev)).max(axis=0)
            guess = self.plan_from_stats(camera, stats)
            stats_dev = None
        cap, tiling = guess

        def build(c, t):
            return self.cached((key_prefix, c, t) + tuple(extra_key), lambda: make_fn(c, t))

        out = build(cap, tiling)(*args)
        if stats_dev is None:
            fetched = jax.device_get(fetch_selector(out))
            stats = None
        else:
            stats, fetched = jax.device_get((stats_dev, fetch_selector(out)))
            stats = np.asarray(stats).max(axis=0)
            self.plan_from_stats(camera, stats)  # hysteresis update for the next step
            if not self.plan_fits(camera, stats, cap, tiling):
                cap, tiling = self.plan_guess(camera)
                out = build(cap, tiling)(*args)
                fetched = jax.device_get(fetch_selector(out))

        # periodic checkified validation: every check_every steps, run the
        # SAME step with checkify assertions on every actual bin count. The
        # bbox-statistics validation above upper-bounds the bins it models;
        # this catches any capacity class it cannot see (and planner bugs).
        # On overflow: warn, drop the cached plan (hysteresis included),
        # replan from fresh statistics, and re-run — never a degraded render.
        self._n_planned_steps += 1
        if self.check_every and self._n_planned_steps % self.check_every == 0:
            from jax.experimental import checkify

            def make_checked():
                fn = make_fn(cap, tiling, check_capacity=True)
                return jax.jit(checkify.checkify(fn))

            # cache key holds only the STRUCTURAL plan parts (tile layout);
            # capacities are dynamic args, so hysteresis flips between
            # bucketed capacities never recompile the validator
            struct = (
                (tiling.tile_h, tiling.tile_w, tiling.edge_tile_h, tiling.super_ty, tiling.super_tx)
                if tiling is not None
                else None
            )
            fn_c = self.cached_raw(
                (key_prefix, "checked", struct, cap is not None) + tuple(extra_key), make_checked
            )
            big = 1 << 30
            caps_vec = jnp.asarray(
                [
                    cap if cap is not None else big,
                    tiling.triangle_capacity if tiling else big,
                    tiling.edge_capacity if tiling else big,
                    (tiling.super_capacity or big) if tiling else big,
                    (tiling.drawn_capacity or big) if tiling else big,
                ],
                jnp.int32,
            )
            err, _ = fn_c(*args, caps_vec)
            msg = err.get()
            if msg is not None:
                import warnings

                warnings.warn(
                    "fitter plan capacity overflowed (%s); replanning" % msg.splitlines()[0]
                )
                key = self._plan_ctx(camera)[4]
                self._jit_cache.pop(("last_plan",) + key[1:], None)
                if stats is None:
                    stats = np.asarray(jax.device_get(self.stats_dispatch(camera, verts_batch))).max(axis=0)
                cap, tiling = self.plan_from_stats(camera, stats)
                out = build(cap, tiling)(*args)
                fetched = jax.device_get(fetch_selector(out))
        return out, fetched

    def cached_raw(self, key, make):
        """Like ``cached`` but stores ``make()`` verbatim (for values that
        are not a single jittable callable, e.g. (optimizer, step_fn))."""
        value = self._jit_cache.get(key)
        if value is None:
            value = make()
            self._jit_cache[key] = value
        return value


class MeshDepthFitter:
    """Fit a deformable mesh to a depth image
    (reference: deodr/mesh_fitter.py:20-184)."""

    def __init__(
        self,
        vertices,
        faces,
        euler_init,
        translation_init,
        cregu: float = 2000,
        inertia: float = 0.96,
        damping: float = 0.05,
    ):
        self.cregu = cregu
        self.inertia = inertia
        self.damping = damping
        self.step_factor_vertices = 0.0005
        self.step_max_vertices = 1
        self.step_factor_quaternion = 0.00006
        self.step_max_quaternion = 0.1
        self.step_factor_translation = 0.00005
        self.step_max_translation = 0.1

        vertices = np.asarray(vertices, dtype=np.float64)
        self.mesh = ColoredTriMesh(np.asarray(faces), vertices=vertices, colors=np.zeros((vertices.shape[0], 0)))
        object_center = vertices.mean(axis=0)
        object_radius = np.max(np.std(vertices, axis=0))
        self.camera_center = object_center + np.array([-0.5, 0, 5]) * object_radius

        self.rigid_energy = LaplacianRigidEnergy(self.mesh, vertices, cregu)
        self.vertices_init = copy.copy(vertices)
        self.core = _FitterRenderCore(self.mesh, sigma=1.0)
        self.set_mesh_transform_init(euler=euler_init, translation=translation_init)
        self.reset()

    def set_mesh_transform_init(self, euler, translation) -> None:
        self.transform_quaternion_init = scipy.spatial.transform.Rotation.from_euler("zyx", euler).as_quat()
        self.transform_translation_init = np.asarray(translation, dtype=np.float64)

    def reset(self) -> None:
        self.vertices = copy.copy(self.vertices_init)
        self.speed_vertices = np.zeros(self.vertices_init.shape)
        self.transform_quaternion = copy.copy(self.transform_quaternion_init)
        self.transform_translation = copy.copy(self.transform_translation_init)
        self.speed_translation = np.zeros(3)
        self.speed_quaternion = np.zeros(4)

    def set_max_depth(self, max_depth: float) -> None:
        self.max_depth = max_depth
        self.background_color = np.array([max_depth], dtype=np.float64)

    def set_depth_scale(self, depth_scale: float) -> None:
        self.depth_scale = depth_scale

    def set_image(self, mesh_image, focal: Optional[float] = None, distortion=None) -> None:
        self.width = mesh_image.shape[1]
        self.height = mesh_image.shape[0]
        assert mesh_image.ndim == 2
        self.mesh_image = np.asarray(mesh_image, dtype=np.float64)
        if focal is None:
            focal = 2 * self.width
        rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
        trans = -rot.T.dot(self.camera_center)
        intrinsic = np.array([[focal, 0, self.width / 2], [0, focal, self.height / 2], [0, 0, 1]])
        extrinsic = np.column_stack((rot, trans))
        self.camera = Camera(
            extrinsic=extrinsic, intrinsic=intrinsic, distortion=distortion, height=self.height, width=self.width
        )
        self.iter = 0

    def _transformed_vertices(self):
        q_n = normalize(jnp.asarray(self.transform_quaternion))
        return qrot(q_n, jnp.asarray(self.vertices)) + jnp.asarray(self.transform_translation)

    def _make_data_energy(self, cap, tiling, check_capacity=False):
        mesh = self.mesh
        camera = self.camera
        sigma = self.core.sigma
        depth_scale = self.depth_scale
        max_depth = self.max_depth
        obs = jnp.asarray(self.mesh_image)
        background_color = jnp.asarray(self.background_color)

        def energy(vertices, quaternion, translation, caps=None):
            q_n = normalize(quaternion)
            vt = qrot(q_n, vertices) + translation
            points_2d, depths = camera.project_points(vt)
            if sigma > 0:
                edgeflags = jax.lax.stop_gradient(mesh.edge_on_silhouette(points_2d))
            else:
                edgeflags = jnp.zeros((mesh.nb_faces, 3), bool)
            nbv = mesh.nb_vertices
            dtype = points_2d.dtype
            buffers = SceneBuffers(
                faces=jnp.asarray(mesh.faces),
                faces_uv=jnp.asarray(mesh.faces),
                ij=points_2d,
                depths=depths,
                uv=jnp.zeros((nbv, 2), dtype),
                shade=jnp.zeros((nbv,), dtype),
                colors=depths[:, None] * depth_scale,
                edgeflags=edgeflags,
                textured=jnp.zeros((mesh.nb_faces,), bool),
                shaded=jnp.zeros((mesh.nb_faces,), bool),
                texture=None,
                background_image=None,
                background_color=background_color,
                height=camera.height,
                width=camera.width,
                clockwise=mesh.clockwise,
                backface_culling=True,
                strict_edge=True,
                perspective_correct=False,
                integer_pixel_centers=True,
            )
            if check_capacity:
                # binning-only capacity validation with DYNAMIC capacities:
                # checkify cannot trace through pallas_call (jax 0.9
                # KeyError), a full checked XLA render costs ~1.5 s/firing,
                # and capacity-keyed jits recompile on every hysteresis
                # flip — this validator compiles once per tile layout and
                # runs in ~ms (see ops.render.validate_capacities)
                from deodr_tpu.ops.render import validate_capacities

                t = tiling
                return validate_capacities(
                    buffers, sigma, caps,
                    t.tile_h if t else camera.height,
                    t.tile_w if t else camera.width,
                    t.edge_tile_h if t else 0,
                    (t.super_ty, t.super_tx) if t else (0, 0),
                )
            image, _, _ = render_scene(
                buffers, sigma, aa_edge_capacity=cap, tiling=tiling, impl=None,
            )
            depth_clipped = jnp.clip(image, 0, max_depth)
            diff_image = jnp.sum((depth_clipped - obs[:, :, None]) ** 2, axis=2)
            return jnp.sum(diff_image), (depth_clipped, diff_image)

        return energy

    def _make_energy(self, cap, tiling, check_capacity=False):
        energy = self._make_data_energy(cap, tiling, check_capacity=check_capacity)
        if check_capacity:
            return energy  # f(vertices, q, t, caps) -> 0 under checkify
        rigid = self.rigid_energy

        def energy_and_grads(vertices, quaternion, translation):
            (e, aux), grads = jax.value_and_grad(energy, argnums=(0, 1, 2), has_aux=True)(
                vertices, quaternion, translation
            )
            # rigid energy inside the same jit: running it eagerly costs
            # several device (tunnel) roundtrips per fitting step
            e_rigid, grad_rigidity, _ = rigid.evaluate(vertices)
            return e, aux, grads, e_rigid, grad_rigidity

        return energy_and_grads

    def step(self) -> Tuple[float, np.ndarray, np.ndarray]:
        self.vertices = self.vertices - np.mean(self.vertices, axis=0)[None, :]
        vt = self._transformed_vertices()
        # plan statistics + step results fetched in ONE host sync (rendered
        # depth / diff images are returned as lazy device arrays — a
        # transfer happens only if the caller reads the pixels)
        out, fetched = self.core.planned_step(
            self.camera,
            vt[None],
            "depth",
            (self.width, self.height),
            self._make_energy,
            (jnp.asarray(self.vertices), jnp.asarray(self.transform_quaternion), jnp.asarray(self.transform_translation)),
            lambda o: (o[0], o[2], o[3], o[4]),
        )
        depth, diff_image = out[1]
        energy_data, grads, e_rigid, grad_rigidity = fetched
        vertices_b, quaternion_b, translation_b = grads
        energy_data = float(energy_data)

        vertices_b = vertices_b - np.mean(vertices_b, axis=0)[None, :]
        energy = energy_data + float(e_rigid)
        print("Energy=%f : EData=%f E_rigid=%f" % (energy, energy_data, float(e_rigid)))

        grad = vertices_b + grad_rigidity

        inertia = self.inertia
        step_vertices = mult_and_clamp(-grad, self.step_factor_vertices, self.step_max_vertices)
        self.speed_vertices = (1 - self.damping) * (self.speed_vertices * inertia + (1 - inertia) * step_vertices)
        self.vertices = self.vertices + self.speed_vertices
        step_quaternion = mult_and_clamp(-quaternion_b, self.step_factor_quaternion, self.step_max_quaternion)
        self.speed_quaternion = (1 - self.damping) * (self.speed_quaternion * inertia + (1 - inertia) * step_quaternion)
        self.transform_quaternion = self.transform_quaternion + self.speed_quaternion
        self.transform_quaternion = self.transform_quaternion / np.linalg.norm(self.transform_quaternion)
        step_translation = mult_and_clamp(-translation_b, self.step_factor_translation, self.step_max_translation)
        self.speed_translation = (1 - self.damping) * (self.speed_translation * inertia + (1 - inertia) * step_translation)
        self.transform_translation = self.transform_translation + self.speed_translation

        self.iter += 1
        return energy, depth[:, :, 0], diff_image


class MeshDepthFitterEnergy(MeshDepthFitter):
    """Depth fitting as a single energy module optimized with L-BFGS.

    Capability-equivalent to the reference's ``MeshDepthFitterEnergy``
    (reference: deodr/pytorch/mesh_fitter_pytorch.py:34-170 — a
    torch.nn.Module whose ``forward`` is the total energy, driven by
    torch.optim.LBFGS). Here the total energy is one pure jitted function of
    the parameter pytree and ``optax.lbfgs`` (zoom linesearch included)
    drives it — the entire L-BFGS step, linesearch evaluations included, is
    one compiled XLA computation.
    """

    def __init__(self, vertices, faces, euler_init, translation_init, cregu: float = 2000, memory_size: int = 10):
        super().__init__(vertices, faces, euler_init, translation_init, cregu=cregu)
        self.memory_size = memory_size
        self._opt = None
        self._opt_state = None
        self._params = None

    def reset(self) -> None:
        super().reset()
        self._opt = None
        self._opt_state = None
        self._params = None

    def _make_total_energy(self, cap, tiling):
        rigid = self.rigid_energy
        inner = self._make_data_energy(cap, tiling)

        def total(params):
            vertices = params["vertices"]
            centered = vertices - jnp.mean(vertices, axis=0)[None, :]
            e_data, _ = inner(centered, params["quaternion"], params["translation"])
            e_rigid, _, _ = rigid.evaluate(vertices)
            return e_data + e_rigid

        return total

    def step(self) -> float:
        vt = self._transformed_vertices()
        cap, tiling = self.core.plan(self.camera, vt)

        if self._params is None:
            self._params = {
                "vertices": jnp.asarray(self.vertices),
                "quaternion": jnp.asarray(self.transform_quaternion),
                "translation": jnp.asarray(self.transform_translation),
            }

        def make():
            import optax

            total = self._make_total_energy(cap, tiling)
            opt = optax.lbfgs(memory_size=self.memory_size)

            @jax.jit
            def lbfgs_step(params, state):
                value, grad = optax.value_and_grad_from_state(total)(params, state=state)
                updates, state = opt.update(grad, state, params, value=value, grad=grad, value_fn=total)
                params = optax.apply_updates(params, updates)
                return params, state, value

            return opt, lbfgs_step

        opt, lbfgs_step = self.core.cached_raw(
            ("depth_lbfgs", cap, tiling, self.width, self.height, self.memory_size), make
        )
        if self._opt_state is None or self._opt is not opt:
            self._opt = opt
            self._opt_state = opt.init(self._params)

        self._params, self._opt_state, value = lbfgs_step(self._params, self._opt_state)
        energy = float(value)

        # reflect optimized parameters back onto the plain-numpy state so
        # plan() and external readers see the current geometry
        params_np = jax.device_get(self._params)
        self.vertices = params_np["vertices"]
        self.transform_quaternion = params_np["quaternion"]
        self.transform_translation = params_np["translation"]

        self.iter += 1
        print("Energy=%f" % energy)
        return energy


class MeshRGBFitterWithPose:
    """Fit a deformable mesh with global color and lights to an RGB image
    (reference: deodr/mesh_fitter.py:187-375)."""

    def __init__(
        self,
        vertices,
        faces,
        euler_init,
        translation_init,
        default_color,
        default_light_directional,
        default_light_ambient,
        cregu: float = 2000,
        inertia: float = 0.96,
        damping: float = 0.05,
        update_lights: bool = True,
        update_color: bool = True,
    ):
        self.cregu = cregu
        self.inertia = inertia
        self.damping = damping
        self.step_factor_vertices = 0.0005
        self.step_max_vertices = 0.5
        self.step_factor_quaternion = 0.00006
        self.step_max_quaternion = 0.05
        self.step_factor_translation = 0.00005
        self.step_max_translation = 0.1

        vertices = np.asarray(vertices, dtype=np.float64)
        self.default_color = np.asarray(default_color, dtype=np.float64)
        self.default_light_directional = np.asarray(default_light_directional, dtype=np.float64)
        self.default_light_ambient = default_light_ambient
        self.update_lights = update_lights
        self.update_color = update_color
        self.mesh = ColoredTriMesh(np.asarray(faces).copy(), vertices=vertices, nb_colors=3)
        object_center = vertices.mean(axis=0) + np.asarray(translation_init)
        object_radius = np.max(np.std(vertices, axis=0))
        self.camera_center = object_center + np.array([0, 0, 9]) * object_radius

        self.rigid_energy = LaplacianRigidEnergy(self.mesh, vertices, cregu)
        self.vertices_init = copy.copy(vertices)
        self.core = _FitterRenderCore(self.mesh, sigma=1.0)
        self.set_mesh_transform_init(euler=euler_init, translation=translation_init)
        self.reset()

    def set_background_color(self, background_color) -> None:
        self.background_color = np.asarray(background_color, dtype=np.float64)

    def set_mesh_transform_init(self, euler, translation) -> None:
        self.transform_quaternion_init = scipy.spatial.transform.Rotation.from_euler("zyx", euler).as_quat()
        self.transform_translation_init = np.asarray(translation, dtype=np.float64)

    def reset(self) -> None:
        self.vertices = copy.copy(self.vertices_init)
        self.speed_vertices = np.zeros(self.vertices.shape)
        self.transform_quaternion = copy.copy(self.transform_quaternion_init)
        self.transform_translation = copy.copy(self.transform_translation_init)
        self.speed_translation = np.zeros(3)
        self.speed_quaternion = np.zeros(4)
        self.mesh_color = copy.copy(self.default_color)
        self.light_directional = copy.copy(self.default_light_directional)
        self.light_ambient = self.default_light_ambient
        self.speed_light_directional = np.zeros(self.light_directional.shape)
        self.speed_light_ambient = 0.0
        self.speed_mesh_color = np.zeros(self.mesh_color.shape)

    def set_image(self, mesh_image, focal: Optional[float] = None, distortion=None) -> None:
        self.width = mesh_image.shape[1]
        self.height = mesh_image.shape[0]
        assert mesh_image.ndim == 3
        self.mesh_image = np.asarray(mesh_image, dtype=np.float64)
        if focal is None:
            focal = 2 * self.width
        rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
        trans = -rot.T.dot(self.camera_center)
        intrinsic = np.array([[focal, 0, self.width / 2], [0, focal, self.height / 2], [0, 0, 1]])
        extrinsic = np.column_stack((rot, trans))
        self.camera = Camera(
            extrinsic=extrinsic, intrinsic=intrinsic, distortion=distortion, width=self.width, height=self.height
        )
        self.iter = 0

    def _make_energy(self, cap, tiling, check_capacity=False):
        mesh = self.mesh
        camera = self.camera
        sigma = self.core.sigma
        obs = jnp.asarray(self.mesh_image)
        background_color = jnp.asarray(self.background_color)
        adj = mesh.adjacencies

        def energy(vertices, quaternion, translation, mesh_color, light_directional, light_ambient, caps=None):
            q_n = normalize(quaternion)
            vt = qrot(q_n, vertices) + translation
            points_2d, depths = camera.project_points(vt)
            if sigma > 0:
                edgeflags = jax.lax.stop_gradient(mesh.edge_on_silhouette(points_2d))
            else:
                edgeflags = jnp.zeros((mesh.nb_faces, 3), bool)
            normals = adj.compute_vertex_normals(adj.compute_face_normals(vt))
            lum = jnp.maximum(0.0, -jnp.sum(normals * light_directional, axis=1)) + light_ambient
            vertices_colors = jnp.tile(mesh_color[None, :], (mesh.nb_vertices, 1))
            colors = vertices_colors * lum[:, None]
            nbv = mesh.nb_vertices
            dtype = points_2d.dtype
            buffers = SceneBuffers(
                faces=jnp.asarray(mesh.faces),
                faces_uv=jnp.asarray(mesh.faces),
                ij=points_2d,
                depths=depths,
                uv=jnp.zeros((nbv, 2), dtype),
                shade=jnp.zeros((nbv,), dtype),
                colors=colors,
                edgeflags=edgeflags,
                textured=jnp.zeros((mesh.nb_faces,), bool),
                shaded=jnp.zeros((mesh.nb_faces,), bool),
                texture=None,
                background_image=None,
                background_color=background_color,
                height=camera.height,
                width=camera.width,
                clockwise=mesh.clockwise,
                backface_culling=True,
                strict_edge=True,
                perspective_correct=False,
                integer_pixel_centers=True,
            )
            if check_capacity:
                # binning-only dynamic-caps validation — see MeshDepthFitter
                from deodr_tpu.ops.render import validate_capacities

                t = tiling
                return validate_capacities(
                    buffers, sigma, caps,
                    t.tile_h if t else camera.height,
                    t.tile_w if t else camera.width,
                    t.edge_tile_h if t else 0,
                    (t.super_ty, t.super_tx) if t else (0, 0),
                )
            image, _, _ = render_scene(
                buffers, sigma, aa_edge_capacity=cap, tiling=tiling, impl=None,
            )
            diff_image = jnp.sum((image - obs) ** 2, axis=2)
            return jnp.sum(diff_image), (image, diff_image)

        if check_capacity:
            return energy  # f(*params, caps) -> 0 under checkify
        rigid = self.rigid_energy

        def energy_and_grads(*params):
            (e, aux), grads = jax.value_and_grad(energy, argnums=tuple(range(6)), has_aux=True)(*params)
            # rigid energy inside the same jit: running it eagerly costs
            # several device (tunnel) roundtrips per fitting step
            e_rigid, grad_rigidity, _ = rigid.evaluate(params[0])
            return e, aux, grads, e_rigid, grad_rigidity

        return energy_and_grads

    def step(self) -> Tuple[float, np.ndarray, np.ndarray]:
        self.vertices = self.vertices - np.mean(self.vertices, axis=0)[None, :]
        q_n = normalize(jnp.asarray(self.transform_quaternion))
        vt = qrot(q_n, jnp.asarray(self.vertices)) + jnp.asarray(self.transform_translation)
        # plan statistics + step results fetched in ONE host sync; rendered
        # images are returned as lazy device arrays (transfer only on pixel
        # access)
        out, fetched = self.core.planned_step(
            self.camera,
            vt[None],
            "rgb",
            (self.width, self.height),
            self._make_energy,
            (
                jnp.asarray(self.vertices),
                jnp.asarray(self.transform_quaternion),
                jnp.asarray(self.transform_translation),
                jnp.asarray(self.mesh_color),
                jnp.asarray(self.light_directional),
                jnp.asarray(float(self.light_ambient)),
            ),
            lambda o: (o[0], o[2], o[3], o[4]),
        )
        image, diff_image = out[1]
        energy_data, grads, e_rigid, grad_rigidity = fetched
        vertices_b, quaternion_b, translation_b, mesh_color_b, light_directional_b, light_ambient_b = grads
        energy_data = float(energy_data)

        energy = energy_data + float(e_rigid)
        print("Energy=%f : EData=%f E_rigid=%f" % (energy, energy_data, float(e_rigid)))

        vertices_b = vertices_b - np.mean(vertices_b, axis=0)[None, :]
        grad = vertices_b + grad_rigidity

        inertia = self.inertia
        step_vertices = mult_and_clamp(-grad, self.step_factor_vertices, self.step_max_vertices)
        self.speed_vertices = (1 - self.damping) * (self.speed_vertices * inertia + (1 - inertia) * step_vertices)
        self.vertices = self.vertices + self.speed_vertices
        step_quaternion = mult_and_clamp(-quaternion_b, self.step_factor_quaternion, self.step_max_quaternion)
        self.speed_quaternion = (1 - self.damping) * (self.speed_quaternion * inertia + (1 - inertia) * step_quaternion)
        self.transform_quaternion = self.transform_quaternion + self.speed_quaternion
        self.transform_quaternion = self.transform_quaternion / np.linalg.norm(self.transform_quaternion)
        step_translation = mult_and_clamp(-translation_b, self.step_factor_translation, self.step_max_translation)
        self.speed_translation = (1 - self.damping) * (self.speed_translation * inertia + (1 - inertia) * step_translation)
        self.transform_translation = self.transform_translation + self.speed_translation

        step_l = -light_directional_b * 0.0001
        self.speed_light_directional = (1 - self.damping) * (self.speed_light_directional * inertia + (1 - inertia) * step_l)
        self.light_directional = self.light_directional + self.speed_light_directional
        step_a = -light_ambient_b * 0.0001
        self.speed_light_ambient = (1 - self.damping) * (self.speed_light_ambient * inertia + (1 - inertia) * step_a)
        self.light_ambient = self.light_ambient + self.speed_light_ambient
        step_c = -mesh_color_b * 0.00001
        self.speed_mesh_color = (1 - self.damping) * (self.speed_mesh_color * inertia + (1 - inertia) * step_c)
        self.mesh_color = self.mesh_color + self.speed_mesh_color

        self.iter += 1
        return energy, image, diff_image


class MeshRGBFitterWithPoseMultiFrame:
    """Fit a deformable mesh to multiple RGB views with per-frame pose and
    shared vertices/color/lights (reference: deodr/mesh_fitter.py:378-632).

    Note: the reference's data term indexes ``image[idframe]`` — a single
    image *row* — when computing the per-frame residual (reference:
    deodr/mesh_fitter.py:539-543), which appears to be a bug; this
    implementation uses the full image residual per frame.
    """

    def __init__(
        self,
        vertices,
        faces,
        euler_init,
        translation_init,
        default_color,
        default_light_directional,
        default_light_ambient,
        cregu: float = 2000,
        cdata: float = 1,
        inertia: float = 0.97,
        damping: float = 0.15,
        update_lights: bool = True,
        update_color: bool = True,
    ):
        self.cregu = cregu
        self.cdata = cdata
        self.inertia = inertia
        self.damping = damping
        self.step_factor_vertices = 0.0005
        self.step_max_vertices = 0.5
        self.step_factor_quaternion = 0.00005
        self.step_max_quaternion = 0.05
        self.step_factor_translation = 0.00004
        self.step_max_translation = 0.1

        vertices = np.asarray(vertices, dtype=np.float64)
        self.default_color = np.asarray(default_color, dtype=np.float64)
        self.default_light_directional = np.asarray(default_light_directional, dtype=np.float64)
        self.default_light_ambient = default_light_ambient
        self.mesh = ColoredTriMesh(np.asarray(faces), vertices, nb_colors=3)
        object_center = vertices.mean(axis=0)
        self.object_radius = np.max(np.std(vertices, axis=0))
        self.camera_center = object_center + np.array([0, 0, 6]) * self.object_radius

        self.rigid_energy = LaplacianRigidEnergy(self.mesh, vertices, cregu)
        self.vertices_init = copy.copy(vertices)
        self.core = _FitterRenderCore(self.mesh, sigma=1.0)
        self.set_mesh_transform_init(euler=euler_init, translation=translation_init)
        self.reset()

    def set_background_color(self, background_color) -> None:
        self.background_color = np.asarray(background_color, dtype=np.float64)

    def set_device_mesh(self, device_mesh) -> None:
        """Run the per-frame energies view-parallel over a
        ``jax.sharding.Mesh`` with a ``("views",)`` axis.

        The frame axis (poses, observed images, per-frame gradients) is
        sharded across the mesh; vertices/color/lights are replicated and
        their gradients all-reduced with ``jax.lax.psum`` (over ICI on real
        hardware). Each device runs the *unbatched* per-frame energy via
        ``lax.map``, so the render kernels execute exactly as in the
        sequential fitter and the energy trajectory matches it to float
        roundoff. Parallelizes the reference's sequential multi-frame loop
        (reference: deodr/mesh_fitter.py:529-549). Requires
        ``nb_frames % mesh size == 0``; pass None to return to the
        sequential path.
        """
        if device_mesh is not None and "views" not in device_mesh.axis_names:
            raise ValueError("device mesh must have a 'views' axis")
        self._device_mesh = device_mesh

    def _make_energy_sharded(self, cap, tiling, device_mesh):
        """Batched view-parallel energy: shard_map over the 'views' axis."""
        from jax.sharding import PartitionSpec as P

        energy_and_grads = self._make_energy(cap, tiling)

        def local_fn(v, color, ld, la, q_all, t_all, obs_all):
            def body(args):
                q, t, obs = args
                e, (img, diff), grads = energy_and_grads(v, q, t, color, ld, la, obs)
                return e, img, diff, grads

            e, img, diff, grads = jax.lax.map(body, (q_all, t_all, obs_all))
            gv, gq, gt, gc, gld, gla = grads
            # shared-parameter gradients: local frame-sum then psum over ICI
            gv = jax.lax.psum(jnp.sum(gv, axis=0), "views")
            gc = jax.lax.psum(jnp.sum(gc, axis=0), "views")
            gld = jax.lax.psum(jnp.sum(gld, axis=0), "views")
            gla = jax.lax.psum(jnp.sum(gla, axis=0), "views")
            e_tot = jax.lax.psum(jnp.sum(e), "views")
            return e_tot, e, img, diff, (gv, gq, gt, gc, gld, gla)

        sm = jax.shard_map(
            local_fn,
            mesh=device_mesh,
            in_specs=(P(), P(), P(), P(), P("views"), P("views"), P("views")),
            out_specs=(
                P(),
                P("views"),
                P("views"),
                P("views"),
                (P(), P("views"), P("views"), P(), P(), P()),
            ),
            # check_vma must stay OFF here on jax 0.9: with the checker ON,
            # this energy's shard_map gradients are MISCOMPILED when (and
            # only when) `jax.config.update("jax_platforms", ...)` has been
            # used to override the platform — the exact combination the test
            # environment needs (a sitecustomize imports jax before conftest
            # can set JAX_PLATFORMS, so conftest must use the config
            # override). Root-caused in round 5 by one-line bisection: env
            # JAX_PLATFORMS=cpu → sharded == sequential exactly (checker ON);
            # adding only jax.config.update("jax_platforms", "cpu") → the
            # 4-view octahedron fit diverges from iteration 1 (1469.50 vs
            # 1512.12) with ONLY the cpu backend ever initialized. Repro:
            # tools/check_vma_repro.py; expiry canary (strict xfail, flips
            # when a jax upgrade fixes the lowering):
            # tests/test_parallel.py::test_check_vma_divergence_canary. The
            # safety net is the mandatory equivalence test below it. The
            # TILE-sharded production path runs with the checker ON
            # (parallel/sharding.py) and its gradients match.
            check_vma=False,
        )
        return jax.jit(sm)

    def set_mesh_transform_init(self, euler, translation) -> None:
        self.transform_quaternion_init = scipy.spatial.transform.Rotation.from_euler("zyx", euler).as_quat()
        self.transform_translation_init = np.asarray(translation, dtype=np.float64)

    def reset(self) -> None:
        self.vertices = copy.copy(self.vertices_init)
        self.speed_vertices = np.zeros(self.vertices.shape)
        self.transform_quaternion = copy.copy(self.transform_quaternion_init)
        self.transform_translation = copy.copy(self.transform_translation_init)
        self.speed_translation = np.zeros(self.transform_translation.shape)
        self.speed_quaternion = np.zeros(self.transform_quaternion.shape)
        self.mesh_color = copy.copy(self.default_color)
        self.light_directional = copy.copy(self.default_light_directional)
        self.light_ambient = self.default_light_ambient
        self.speed_light_directional = np.zeros(self.light_directional.shape)
        self.speed_light_ambient = 0.0
        self.speed_mesh_color = np.zeros(self.mesh_color.shape)

    def set_images(self, mesh_images: List, focal: Optional[float] = None) -> None:
        self.width = mesh_images[0].shape[1]
        self.height = mesh_images[0].shape[0]
        assert mesh_images[0].ndim == 3
        self.mesh_images = [np.asarray(im, dtype=np.float64) for im in mesh_images]
        if focal is None:
            focal = 2 * self.width
        rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
        trans = -rot.T.dot(self.camera_center)
        intrinsic = np.array([[focal, 0, self.width / 2], [0, focal, self.height / 2], [0, 0, 1]])
        extrinsic = np.column_stack((rot, trans))
        self.camera = Camera(
            extrinsic=extrinsic, intrinsic=intrinsic, width=self.width, height=self.height
        )
        self.iter = 0

    def _make_energy(self, cap, tiling):
        mesh = self.mesh
        camera = self.camera
        sigma = self.core.sigma
        background_color = jnp.asarray(self.background_color)
        adj = mesh.adjacencies
        coef_data = self.cdata / self.nb_frames

        # obs is an ARGUMENT (not a closure constant) so one compiled step
        # function serves every frame — frames share the camera, and a
        # per-frame closure would recompile the step per frame
        def energy(vertices, quaternion, translation, mesh_color, light_directional, light_ambient, obs):
            q_n = normalize(quaternion)
            vt = qrot(q_n, vertices) + translation
            points_2d, depths = camera.project_points(vt)
            if sigma > 0:
                edgeflags = jax.lax.stop_gradient(mesh.edge_on_silhouette(points_2d))
            else:
                edgeflags = jnp.zeros((mesh.nb_faces, 3), bool)
            normals = adj.compute_vertex_normals(adj.compute_face_normals(vt))
            lum = jnp.maximum(0.0, -jnp.sum(normals * light_directional, axis=1)) + light_ambient
            vertices_colors = jnp.tile(mesh_color[None, :], (mesh.nb_vertices, 1))
            colors = vertices_colors * lum[:, None]
            nbv = mesh.nb_vertices
            dtype = points_2d.dtype
            buffers = SceneBuffers(
                faces=jnp.asarray(mesh.faces),
                faces_uv=jnp.asarray(mesh.faces),
                ij=points_2d,
                depths=depths,
                uv=jnp.zeros((nbv, 2), dtype),
                shade=jnp.zeros((nbv,), dtype),
                colors=colors,
                edgeflags=edgeflags,
                textured=jnp.zeros((mesh.nb_faces,), bool),
                shaded=jnp.zeros((mesh.nb_faces,), bool),
                texture=None,
                background_image=None,
                background_color=background_color,
                height=camera.height,
                width=camera.width,
                clockwise=mesh.clockwise,
                backface_culling=True,
                strict_edge=True,
                perspective_correct=False,
                integer_pixel_centers=True,
            )
            image, _, _ = render_scene(buffers, sigma, aa_edge_capacity=cap, tiling=tiling, impl=None)
            diff_image = jnp.sum((image - obs) ** 2, axis=2)
            return coef_data * jnp.sum(diff_image), (image, diff_image)

        def energy_and_grads(*params):
            (e, aux), grads = jax.value_and_grad(energy, argnums=tuple(range(6)), has_aux=True)(*params)
            return e, aux, grads

        return energy_and_grads

    def _make_validator(self, tiling):
        """Checkified ~ms binning-only capacity validation over every frame
        (same classes as :func:`deodr_tpu.ops.render.validate_capacities`,
        the counterpart of ``_FitterRenderCore.planned_step``'s check_every
        path). Capacities are DYNAMIC args; only the tile layout is baked
        in, so hysteresis flips between bucketed capacities never
        recompile."""
        from jax.experimental import checkify

        from deodr_tpu.ops.render import validate_capacities

        mesh = self.mesh
        camera = self.camera
        sigma = self.core.sigma
        background_color = jnp.asarray(self.background_color)

        def f(vertices, q_all, t_all, caps):
            def one(args):
                q, t = args
                vt = qrot(normalize(q), vertices) + t
                points_2d, depths = camera.project_points(vt)
                if sigma > 0:
                    edgeflags = jax.lax.stop_gradient(mesh.edge_on_silhouette(points_2d))
                else:
                    edgeflags = jnp.zeros((mesh.nb_faces, 3), bool)
                nbv = mesh.nb_vertices
                dtype = points_2d.dtype
                buffers = SceneBuffers(
                    faces=jnp.asarray(mesh.faces),
                    faces_uv=jnp.asarray(mesh.faces),
                    ij=points_2d,
                    depths=depths,
                    uv=jnp.zeros((nbv, 2), dtype),
                    shade=jnp.zeros((nbv,), dtype),
                    colors=jnp.zeros((nbv, 3), dtype),
                    edgeflags=edgeflags,
                    textured=jnp.zeros((mesh.nb_faces,), bool),
                    shaded=jnp.zeros((mesh.nb_faces,), bool),
                    texture=None,
                    background_image=None,
                    background_color=background_color,
                    height=camera.height,
                    width=camera.width,
                    clockwise=mesh.clockwise,
                    backface_culling=True,
                    strict_edge=True,
                    perspective_correct=False,
                    integer_pixel_centers=True,
                )
                t_ = tiling
                return validate_capacities(
                    buffers, sigma, caps,
                    t_.tile_h if t_ else camera.height,
                    t_.tile_w if t_ else camera.width,
                    t_.edge_tile_h if t_ else 0,
                    (t_.super_ty, t_.super_tx) if t_ else (0, 0),
                )

            return jnp.sum(jax.lax.map(one, (q_all, t_all)))

        return jax.jit(checkify.checkify(f))

    def energy_data(self, vertices):
        self.vertices = vertices
        images, diff_images = [], []
        self._vertices_b = np.zeros(self.vertices.shape)
        self.transform_quaternion_b = np.zeros(self.transform_quaternion.shape)
        self.transform_translation_b = np.zeros(self.transform_translation.shape)
        self.mesh_color_b = np.zeros(self.mesh_color.shape)
        self.light_directional_b = np.zeros(self.light_directional.shape)
        self.light_ambient_b = 0.0

        v_j = jnp.asarray(self.vertices)
        q_all = jnp.asarray(self.transform_quaternion)
        t_all = jnp.asarray(self.transform_translation)
        # plan statistics cover every frame's pose (max over frames), so all
        # frames share a single compiled step function — and they are fetched
        # together with every frame's scalars/gradients in ONE host sync
        vts = jax.vmap(lambda q, t: qrot(normalize(q), v_j) + t)(q_all, t_all)
        stats_dev = self.core.stats_dispatch(self.camera, vts)
        guess = self.core.plan_guess(self.camera)
        if guess is None:
            stats = np.asarray(jax.device_get(stats_dev)).max(axis=0)
            guess = self.core.plan_from_stats(self.camera, stats)
            stats_dev = None
        cap, tiling = guess

        device_mesh = getattr(self, "_device_mesh", None)
        if device_mesh is not None and self.nb_frames % device_mesh.size != 0:
            raise ValueError(
                f"nb_frames={self.nb_frames} must be divisible by the 'views' mesh size {device_mesh.size}"
            )

        def run_frames(cap, tiling):
            """Run every frame's energy+gradients (sharded or sequential).

            Returns ``(e_frames, images, diffs, per_frame, shared)`` where
            ``per_frame = (gq, gt)`` are the per-frame pose gradients
            (length-nb_frames sequences) and ``shared = (gv, gc, gld, gla)``
            are the frame-summed TOTALS of the shared-parameter gradients —
            shared parameters have no per-frame gradient layout at all, so
            consumers take totals explicitly (no zero-stuffed packing).
            """
            if device_mesh is not None:
                fn = self.core.cached(
                    ("multi_sharded", cap, tiling, self.width, self.height, self.nb_frames, device_mesh),
                    lambda: self._make_energy_sharded(cap, tiling, device_mesh),
                )
                obs_all = jnp.asarray(np.stack(self.mesh_images))
                e_tot, e_frames, imgs, diffs, grads = fn(
                    v_j,
                    jnp.asarray(self.mesh_color),
                    jnp.asarray(self.light_directional),
                    jnp.asarray(float(self.light_ambient)),
                    q_all,
                    t_all,
                    obs_all,
                )
                gv, gq, gt, gc, gld, gla = grads
                return e_frames, imgs, diffs, (gq, gt), (gv, gc, gld, gla)
            fn = self.core.cached(
                ("multi", cap, tiling, self.width, self.height), lambda: self._make_energy(cap, tiling)
            )
            outs = [
                fn(
                    v_j,
                    q_all[idframe],
                    t_all[idframe],
                    jnp.asarray(self.mesh_color),
                    jnp.asarray(self.light_directional),
                    jnp.asarray(float(self.light_ambient)),
                    jnp.asarray(self.mesh_images[idframe]),
                )
                for idframe in range(self.nb_frames)
            ]
            e_frames = [o[0] for o in outs]
            imgs = [o[1][0] for o in outs]
            diffs = [o[1][1] for o in outs]
            gq = [o[2][1] for o in outs]
            gt = [o[2][2] for o in outs]
            # shared-parameter totals summed on device: the host fetch below
            # stays a single batched device_get either way
            shared = tuple(
                sum(o[2][k] for o in outs) for k in (0, 3, 4, 5)
            )
            return e_frames, imgs, diffs, (gq, gt), shared

        e_frames, images_d, diffs_d, per_frame, shared = run_frames(cap, tiling)
        e_rigid_j, grad_rigidity_j, _ = self.rigid_energy.evaluate(v_j)
        # the frame images stay on device (returned lazily — converting them
        # costs a transfer only if the caller actually reads the pixels)
        if stats_dev is not None:
            stats, scalars, self._e_rigid, self._grad_rigidity = jax.device_get(
                (stats_dev, (e_frames, per_frame, shared), e_rigid_j, grad_rigidity_j)
            )
            stats = np.asarray(stats).max(axis=0)
            self.core.plan_from_stats(self.camera, stats)
            if not self.core.plan_fits(self.camera, stats, cap, tiling):
                cap, tiling = self.core.plan_guess(self.camera)
                e_frames, images_d, diffs_d, per_frame, shared = run_frames(cap, tiling)
                scalars = jax.device_get((e_frames, per_frame, shared))
        else:
            scalars, self._e_rigid, self._grad_rigidity = jax.device_get(
                ((e_frames, per_frame, shared), e_rigid_j, grad_rigidity_j)
            )

        # periodic checkified validation (every core.check_every calls): the
        # plan_fits bbox statistics above upper-bound the bin classes they
        # model; this runs the ~ms binning-only validator with checkify
        # assertions on the ACTUAL counts, catching planner bugs and
        # unmodeled classes. On overflow: warn, drop the cached plan,
        # replan from fresh statistics, re-run — never a degraded render
        # (mirrors _FitterRenderCore.planned_step's check_every path).
        self._n_energy_calls = getattr(self, "_n_energy_calls", 0) + 1
        check_every = self.core.check_every
        if check_every and self._n_energy_calls % check_every == 0:
            struct = (
                (tiling.tile_h, tiling.tile_w, tiling.edge_tile_h, tiling.super_ty, tiling.super_tx)
                if tiling is not None
                else None
            )
            fn_c = self.core.cached_raw(
                ("multi_checked", struct, cap is not None, self.width, self.height),
                lambda: self._make_validator(tiling),
            )
            big = 1 << 30
            caps_vec = jnp.asarray(
                [
                    cap if cap is not None else big,
                    tiling.triangle_capacity if tiling else big,
                    tiling.edge_capacity if tiling else big,
                    (tiling.super_capacity or big) if tiling else big,
                    (tiling.drawn_capacity or big) if tiling else big,
                ],
                jnp.int32,
            )
            err, _ = fn_c(v_j, q_all, t_all, caps_vec)
            msg = err.get()
            if msg is not None:
                import warnings

                warnings.warn(
                    "multiframe fitter plan capacity overflowed (%s); replanning"
                    % msg.splitlines()[0]
                )
                key = self.core._plan_ctx(self.camera)[4]
                self.core._jit_cache.pop(("last_plan",) + key[1:], None)
                stats = np.asarray(
                    jax.device_get(self.core.stats_dispatch(self.camera, vts))
                ).max(axis=0)
                cap, tiling = self.core.plan_from_stats(self.camera, stats)
                e_frames, images_d, diffs_d, per_frame, shared = run_frames(cap, tiling)
                scalars = jax.device_get((e_frames, per_frame, shared))

        e_frames_h, (gq_h, gt_h), (gv_h, gc_h, gld_h, gla_h) = scalars
        self._vertices_b += np.asarray(gv_h)
        self.mesh_color_b += np.asarray(gc_h)
        self.light_directional_b += np.asarray(gld_h)
        self.light_ambient_b += float(gla_h)
        for idframe in range(self.nb_frames):
            self.transform_quaternion_b[idframe] += gq_h[idframe]
            self.transform_translation_b[idframe] += gt_h[idframe]
            images.append(images_d[idframe])
            diff_images.append(diffs_d[idframe])
        return float(np.sum(np.asarray(e_frames_h))), images, diff_images

    def step(self, check_gradient: bool = False):
        self.vertices = self.vertices - np.mean(self.vertices, axis=0)[None, :]
        self.nb_frames = len(self.mesh_images)
        energy_data, images, diff_images = self.energy_data(self.vertices)
        e_rigid, grad_rigidity = self._e_rigid, self._grad_rigidity  # fetched in the same sync
        energy = energy_data + float(e_rigid)
        print(f"iter {self.iter} Energy={energy} : EData={energy_data} E_rigid={float(e_rigid)}")

        if self.iter < 500:
            self._vertices_b = self._vertices_b - np.mean(self._vertices_b, axis=0)[None, :]
        grad = self._vertices_b + np.asarray(grad_rigidity)

        inertia = self.inertia
        step_vertices = mult_and_clamp(-grad, self.step_factor_vertices, self.step_max_vertices)
        self.speed_vertices = (1 - self.damping) * (self.speed_vertices * inertia + (1 - inertia) * step_vertices)
        self.vertices = self.vertices + self.speed_vertices
        step_quaternion = mult_and_clamp(-self.transform_quaternion_b, self.step_factor_quaternion, self.step_max_quaternion)
        self.speed_quaternion = (1 - self.damping) * (self.speed_quaternion * inertia + (1 - inertia) * step_quaternion)
        self.transform_quaternion = self.transform_quaternion + self.speed_quaternion
        self.transform_quaternion = self.transform_quaternion / np.linalg.norm(self.transform_quaternion)
        step_translation = mult_and_clamp(-self.transform_translation_b, self.step_factor_translation, self.step_max_translation)
        self.speed_translation = (1 - self.damping) * (self.speed_translation * inertia + (1 - inertia) * step_translation)
        self.transform_translation = self.transform_translation + self.speed_translation
        step_l = -self.light_directional_b * 0.0001
        self.speed_light_directional = (1 - self.damping) * (self.speed_light_directional * inertia + (1 - inertia) * step_l)
        self.light_directional = self.light_directional + self.speed_light_directional
        step_a = -self.light_ambient_b * 0.0001
        self.speed_light_ambient = (1 - self.damping) * (self.speed_light_ambient * inertia + (1 - inertia) * step_a)
        self.light_ambient = self.light_ambient + self.speed_light_ambient
        step_c = -self.mesh_color_b * 0.00001
        self.speed_mesh_color = (1 - self.damping) * (self.speed_mesh_color * inertia + (1 - inertia) * step_c)
        self.mesh_color = self.mesh_color + self.speed_mesh_color

        self.iter += 1
        return energy, images, diff_images
