"""Imaging dataflow: windowed-mean pyramid + OME-Zarr sink."""
