"""I/O: OBJ files, MeshLab project export."""
