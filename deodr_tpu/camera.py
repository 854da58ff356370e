"""Pinhole camera with OpenCV-convention intrinsics and 5-parameter distortion.

Mirrors the reference camera model exactly (reference:
deodr/differentiable_renderer.py:252-522) but ``project_points`` is pure jnp:
its vertex-position/depth gradients come from jax.grad instead of the
hand-written ``project_points_backward`` (reference:
deodr/differentiable_renderer.py:391-438).
"""

from __future__ import annotations

from typing import Iterable, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

# TPU matmuls round fp32 inputs to bf16 at default precision; vertex
# positions need full fp32 everywhere
_HI = jax.lax.Precision.HIGHEST


def project_points_arrays(extrinsic, intrinsic, distortion, points_3d):
    """Functional camera projection: world → distorted pixel coords + depths.

    Pure jnp on explicit arrays so it composes with vmap (batched cameras for
    multi-view) and shard_map. Math identical to ``Camera.project_points``
    (reference: deodr/differentiable_renderer.py:341-389).

    extrinsic: (3, 4); intrinsic: (3, 3); distortion: None or (5,) array.
    """
    r = extrinsic[:3, :3]
    t = extrinsic[:3, 3]
    p_camera = jnp.matmul(points_3d, r.T, precision=_HI) + t
    depths = p_camera[:, 2]
    projected = p_camera[:, :2] / depths[:, None]
    if distortion is not None:
        k1, k2, p1, p2, k3 = (distortion[i] for i in range(5))
        x = projected[:, 0]
        y = projected[:, 1]
        x2 = x**2
        y2 = y**2
        r2 = x2 + y2
        radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
        tang_x = 2 * p1 * x * y + p2 * (r2 + 2 * x2)
        tang_y = p1 * (r2 + 2 * y2) + 2 * p2 * x * y
        projected = jnp.column_stack((x * radial + tang_x, y * radial + tang_y))
    ij = jnp.matmul(projected, intrinsic[:2, :2].T, precision=_HI) + intrinsic[:2, 2]
    return ij, depths


class Camera:
    """extrinsic: (3,4) [R|t] world→camera; intrinsic: (3,3) upper-triangular;
    distortion: None or (k1, k2, p1, p2, k3) as in OpenCV."""

    def __init__(
        self,
        extrinsic,
        intrinsic,
        height: int,
        width: int,
        distortion: Union[None, Iterable[float], np.ndarray] = None,
        checks: bool = True,
        tol: float = 1e-6,
    ):
        extrinsic = np.asarray(extrinsic, dtype=np.float64)
        intrinsic = np.asarray(intrinsic, dtype=np.float64)
        if checks:
            assert extrinsic.shape == (3, 4)
            assert intrinsic.shape == (3, 3)
            assert np.all(intrinsic[2, :] == [0, 0, 1])
            assert np.linalg.norm(extrinsic[:3, :3].T.dot(extrinsic[:3, :3]) - np.eye(3)) < tol
            if distortion is not None:
                distortion = np.asarray(distortion, dtype=np.float64)
                assert distortion.shape == (5,)
        self.extrinsic = extrinsic
        self.intrinsic = intrinsic
        self.distortion = None if distortion is None else np.asarray(distortion, dtype=np.float64)
        self.height = int(height)
        self.width = int(width)

    @property
    def xfov(self) -> float:
        assert self.intrinsic[0, 2] == self.width / 2
        return float(np.degrees(2 * np.arctan(self.width / (2 * self.intrinsic[0, 0]))))

    @property
    def yfov(self) -> float:
        assert self.intrinsic[1, 2] == self.height / 2
        return float(np.degrees(2 * np.arctan(self.height / (2 * self.intrinsic[1, 1]))))

    def world_to_camera(self, points_3d: jnp.ndarray) -> jnp.ndarray:
        r = jnp.asarray(self.extrinsic[:3, :3])
        t = jnp.asarray(self.extrinsic[:3, 3])
        return jnp.matmul(points_3d, r.T, precision=_HI) + t

    def camera_to_world_mtx_4x4(self) -> np.ndarray:
        return np.vstack(
            (
                np.column_stack((self.extrinsic[:, :3].T, self.get_center())),
                np.array((0, 0, 0, 1)),
            )
        )

    def left_mul_intrinsic(self, projected: jnp.ndarray) -> jnp.ndarray:
        k = jnp.asarray(self.intrinsic)
        return jnp.matmul(projected, k[:2, :2].T, precision=_HI) + k[:2, 2]

    def project_points(self, points_3d: jnp.ndarray, return_depths: bool = True, store_backward=None):
        """world → distorted pixel coordinates (x=column, y=row), and depths.

        The ``store_backward`` argument is accepted for reference-API
        compatibility and ignored — gradients come from jax.grad
        (reference: deodr/differentiable_renderer.py:341-389).
        """
        points_3d = jnp.asarray(points_3d)
        dist = None if self.distortion is None else jnp.asarray(self.distortion, points_3d.dtype)
        ij, depths = project_points_arrays(
            jnp.asarray(self.extrinsic, points_3d.dtype),
            jnp.asarray(self.intrinsic, points_3d.dtype),
            dist,
            points_3d,
        )
        if return_depths:
            return ij, depths
        return ij

    def get_center(self) -> np.ndarray:
        return -self.extrinsic[:3, :3].T.dot(self.extrinsic[:, 3])

    def __repr__(self) -> str:
        return (
            f"<Camera>\nwidth:\n{self.width}\nheight:\n{self.height}\n"
            f"extrinsic:\n{self.extrinsic}\nintrinsic:\n{self.intrinsic}\n"
            f"distortion:\n{self.distortion}\n"
        )


class PerspectiveCamera(Camera):
    """Camera from fov/center/rotation (reference:
    deodr/differentiable_renderer.py:454-499)."""

    def __init__(
        self,
        width: int,
        height: int,
        fov: float,
        camera_center,
        rot: Optional[np.ndarray] = None,
        distortion=None,
    ):
        camera_center = np.asarray(camera_center)
        assert camera_center.shape == (3,)
        if rot is None:
            rot = np.eye(3)
        else:
            rot = np.asarray(rot)
            assert rot.shape == (3, 3)
            assert np.allclose(rot.T.dot(rot), np.eye(3), atol=1e-6)
            assert np.linalg.det(rot) > 0
        focal = 0.5 * width / np.tan(0.5 * fov * np.pi / 180)
        trans = -rot.T.dot(camera_center)
        intrinsic = np.array([[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1]])
        extrinsic = np.column_stack((rot, trans))
        super().__init__(extrinsic=extrinsic, intrinsic=intrinsic, distortion=distortion, width=width, height=height)


def default_camera(width, height, fov, vertices, rot, distortion=None) -> Camera:
    """Auto-frame a camera so the mesh fills most of the image
    (reference: deodr/differentiable_renderer.py:502-522)."""
    vertices = np.asarray(vertices)
    cam_vertices = vertices.dot(np.asarray(rot).T)
    box_min = cam_vertices.min(axis=0)
    box_max = cam_vertices.max(axis=0)
    box_center = 0.5 * (box_max + box_min)
    box_size = box_max - box_min
    tan_half = np.tan(0.5 * fov * np.pi / 180)
    camera_distance_x = 0.5 * box_size[0] / tan_half + 0.5 * box_size[2]
    camera_distance_y = 0.5 * box_size[1] * (width / height) / tan_half + 0.5 * box_size[2]
    camera_distance = max(camera_distance_x, camera_distance_y)
    camera_center = np.asarray(rot).T.dot(box_center + np.array([0, 0, -camera_distance]))
    return PerspectiveCamera(width, height, fov, camera_center, rot, distortion)
