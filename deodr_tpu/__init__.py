"""deodr_tpu — a TPU-native differentiable triangle-mesh rasterizer.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
martinResearch/DEODR (Discontinuity-Edge-Overdraw based Differentiable
Renderer): z-buffered triangle rasterization with linearly interpolated
per-vertex attributes or bilinear textures with Gouraud shading, and exact
reverse-mode derivatives *including across occlusion boundaries* via the
discontinuity-edge-overdraw antialiasing method.

Architectural contrast with the reference (see SURVEY.md):

* the reference splits work between a sequential C++ scanline core with
  hand-written adjoints and numpy layers with hand-written ``_backward``
  companions (reference: C++/DifferentiableRenderer.h, deodr/*.py);
* here, everything is a pure, jit-able JAX function. Only the rasterizer's
  *visibility* decisions (z-buffer winner, coverage, silhouette blend
  ordering) are non-differentiable and explicitly stop-gradded — matching
  the reference's adjoint semantics — while every value path (barycentric
  interpolation, edge-overdraw transparency ramps, bilinear texture taps,
  camera distortion, lighting, normals) is differentiated by ``jax.grad``.

The image coordinate conventions, the ``strict_edge`` shared-edge rule, both
pixel-center conventions and the integer-texel-center bilinear sampling match
the reference exactly (reference: readme.md "Conventions").
"""

import os as _os

from deodr_tpu.camera import Camera, PerspectiveCamera, default_camera
from deodr_tpu.geometry.energy import LaplacianRigidEnergy
from deodr_tpu.geometry.mesh import ColoredTriMesh, TriMesh, TriMeshAdjacencies
from deodr_tpu.geometry.subdivision import loop_subdivision
from deodr_tpu.io.obj import read_obj, save_obj
from deodr_tpu.mesh_fitter import (
    MeshDepthFitter,
    MeshDepthFitterEnergy,
    MeshRGBFitterWithPose,
    MeshRGBFitterWithPoseMultiFrame,
)
from deodr_tpu.scene import Scene2D, Scene3D

data_path = _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "data"))

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "PerspectiveCamera",
    "default_camera",
    "LaplacianRigidEnergy",
    "ColoredTriMesh",
    "TriMesh",
    "TriMeshAdjacencies",
    "loop_subdivision",
    "read_obj",
    "save_obj",
    "MeshDepthFitter",
    "MeshDepthFitterEnergy",
    "MeshRGBFitterWithPose",
    "MeshRGBFitterWithPoseMultiFrame",
    "Scene2D",
    "Scene3D",
    "data_path",
]
