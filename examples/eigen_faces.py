"""Eigen-faces fitting: optimize PCA texture coefficients + a deformable
grid through the renderer's texture gradients.

Capability-equivalent to the reference example (reference:
deodr/examples/eigen_faces.py): a 64x64 grayscale face is rendered through
a deformed triangulated grid; unknowns are the PCA coefficients of the
texture and the grid vertex positions, with gradients flowing through the
bilinear texture sampler (texture_b) and the rasterized vertex positions
(ij_b). The reference downloads the Olivetti faces from sklearn; this
version synthesizes a face-like dataset procedurally (smooth random fields
sharing a common mean structure) so it runs with zero network egress — the
rendering/fitting capability exercised is identical.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from scipy.spatial import Delaunay

from deodr_tpu import Scene2D


def synthetic_face_dataset(n_images: int = 120, size: int = 64, seed: int = 3) -> np.ndarray:
    """Face-like images: a shared oval+eyes+mouth mean plus smooth
    low-frequency per-image variation (stand-in for Olivetti faces)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, size), np.linspace(-1, 1, size), indexing="ij")
    oval = np.exp(-((xx / 0.7) ** 2 + (yy / 0.9) ** 2) ** 2)
    eyes = np.exp(-(((xx - 0.3) / 0.15) ** 2 + ((yy + 0.25) / 0.1) ** 2)) + np.exp(
        -(((xx + 0.3) / 0.15) ** 2 + ((yy + 0.25) / 0.1) ** 2)
    )
    mouth = np.exp(-((xx / 0.3) ** 2 + ((yy - 0.4) / 0.08) ** 2))
    mean_face = 0.7 * oval - 0.3 * eyes - 0.2 * mouth

    # low-frequency basis: outer products of a few smooth 1D modes
    modes = [np.ones(size), np.linspace(-1, 1, size)]
    for k in range(1, 5):
        modes.append(np.cos(np.pi * k * np.linspace(0, 1, size)))
    modes = np.stack(modes)
    images = np.empty((n_images, size, size))
    for i in range(n_images):
        coefs = rng.randn(len(modes), len(modes)) * 0.08
        images[i] = mean_face + modes.T @ coefs @ modes
    return np.clip(images, 0, 1)


class PCA:
    """Plain-numpy PCA with whitening (same role as sklearn's in the
    reference example)."""

    def __init__(self, data: np.ndarray, n_components: int):
        flat = data.reshape(data.shape[0], -1)
        self.mean_ = flat.mean(axis=0)
        centered = flat - self.mean_
        u, s, vt = np.linalg.svd(centered, full_matrices=False)
        self.n_components = min(n_components, vt.shape[0])
        scale = s[: self.n_components] / np.sqrt(max(data.shape[0] - 1, 1))
        self.components_ = vt[: self.n_components] * scale[:, None]  # whitened basis rows

    def reconstruct(self, coefs: np.ndarray) -> np.ndarray:
        return self.mean_ + coefs @ self.components_

    def grad_coefs(self, texture_grad_flat: np.ndarray) -> np.ndarray:
        return self.components_ @ texture_grad_flat


def build_grid_scene(
    texture: np.ndarray, n: int = 5, size: int = 64, seed: int = 0
) -> Tuple[Scene2D, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    points = np.column_stack([t.flatten() for t in np.meshgrid(np.arange(n + 1) / n, np.arange(n + 1) / n)])
    triangles = Delaunay(points).simplices.astype(np.int32)
    on_border = np.any((points == 0) | (points == 1), axis=1)

    rng = np.random.RandomState(seed)
    points_deformed_gt = points + (rng.rand(*points.shape) - 0.5) * 0.5 / n
    points_deformed_gt[on_border] = points[on_border]

    nb_points, nb_triangles = points.shape[0], triangles.shape[0]
    scene = Scene2D(
        faces=triangles,
        faces_uv=triangles,
        ij=points_deformed_gt * size - 0.5,
        depths=np.ones(nb_points),
        textured=np.ones(nb_triangles, dtype=bool),
        uv=points * size + 0.5,
        shade=np.ones(nb_points),
        colors=np.ones((nb_points, 1)),
        shaded=np.ones(nb_triangles, dtype=bool),
        edgeflags=np.zeros((nb_triangles, 3), dtype=bool),
        height=size,
        width=size,
        nb_colors=1,
        texture=texture[:, :, None],
        background_color=np.array([0.0]),
        clockwise=True,
        backface_culling=True,
    )
    return scene, points, points_deformed_gt, triangles, on_border


def run(
    nb_iter: int = 100,
    n_components: int = 40,
    size: int = 64,
    target_index: int = 10,
    display: bool = False,
) -> Dict[str, object]:
    """Fit PCA coefficients + grid deformation to a rendered target face.

    Returns {"energies": [...], "pca_coefs": ..., "points_deformed": ...}.
    """
    dataset = synthetic_face_dataset(size=size)
    pca = PCA(dataset, n_components)
    target_face = dataset[target_index]

    # ground-truth scene renders the target face through the deformed grid
    scene_gt, points, points_deformed_gt, triangles, on_border = build_grid_scene(target_face, size=size)
    image_gt, _ = scene_gt.render(sigma=1)

    scene, _, _, _, _ = build_grid_scene(target_face, size=size)

    pca_coefs = np.zeros(pca.n_components)
    points_deformed = points.copy()
    # step sizes scaled by the basis energy so the coefficient step is
    # invariant to the dataset's variance scale (the reference hard-codes
    # 0.5 for sklearn's whitened Olivetti basis)
    basis_scale = float(np.sum(pca.components_ ** 2) / pca.n_components)
    lambdas = {"points_deformed": 0.0001, "pca_coefs": 0.25 / basis_scale}

    energies: List[float] = []
    for niter in range(nb_iter):
        scene.ij = points_deformed * size - 0.5
        face = pca.reconstruct(pca_coefs).reshape(size, size)
        scene.texture = face[:, :, None]
        image, _, diff_image, err = scene.render_compare_and_backward(obs=image_gt, sigma=1)
        energies.append(float(err))

        coefs_grad = pca.grad_coefs(np.asarray(scene.texture_b).flatten())
        points_grad = np.asarray(scene.ij_b) * size

        pca_coefs = pca_coefs - lambdas["pca_coefs"] * coefs_grad
        points_deformed = points_deformed - lambdas["points_deformed"] * points_grad
        points_deformed[on_border] = points[on_border]

        if display:
            import cv2

            zoom = 6
            row = np.column_stack(
                (np.asarray(image_gt)[:, :, 0], np.asarray(image)[:, :, 0], np.abs(np.asarray(diff_image))[:, :, 0] * 5)
            )
            cv2.imshow("eigen_faces", cv2.resize(np.clip(row, 0, 1), None, fx=zoom, fy=zoom, interpolation=cv2.INTER_NEAREST))
            cv2.waitKey(1)

    return {"energies": energies, "pca_coefs": pca_coefs, "points_deformed": points_deformed}


if __name__ == "__main__":
    result = run(nb_iter=50, display=False)
    es = result["energies"]
    print(f"E0={es[0]:.4f}  E{len(es) - 1}={es[-1]:.4f}")
