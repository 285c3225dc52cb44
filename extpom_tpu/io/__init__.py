"""Zarr/TensorStore datasets: grid, init, clim, sfrc, lbry, restart, output."""
