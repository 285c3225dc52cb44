"""Zarr/TensorStore datasets (grid, init, clim, sfrc, lbry, restart,
output), the async background writer, and the NetCDF-3 interchange
bridge (io.netcdf: reference-format inputs, record-stream outputs)."""
