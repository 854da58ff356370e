"""Rasterization ops: solid z-buffered pass, discontinuity-edge-overdraw AA."""
