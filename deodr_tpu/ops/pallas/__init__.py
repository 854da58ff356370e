"""Pallas TPU kernels for the rasterization hot loops."""
