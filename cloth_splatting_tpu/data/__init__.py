"""Data layer: meshing, scene/transforms IO, trajectory preprocessing, PLY/HDF5."""
