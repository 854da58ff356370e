"""Geometry layer: meshes, adjacencies, transforms, regularization energies."""
