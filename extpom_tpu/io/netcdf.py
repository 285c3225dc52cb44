"""NetCDF-3 bridge (classic / 64-bit-offset, via scipy.io.netcdf_file).

The reference's entire I/O surface is NetCDF through PnetCDF
(io_pnetcdf.F); this framework's native storage is chunked Zarr
(io/zarrstore.py).  This module is the interchange layer for users whose
tool chains (and existing input files) speak NetCDF:

* :func:`write_output_nc` — one snapshot as a NetCDF file with the
  REFERENCE's variable names, dimension order and scalar diagnostics
  (write_output_pnetcdf, io_pnetcdf.F:57-410): dims ``(time, z, y, x)``,
  fields ``uab/vab/elb`` + ``u/v/w/t/s/rho/km/kh/aam``, grid metrics,
  and the conservation scalars (``vtot/atot/mtot/tavg/savg/eavg/ekin``).
* :func:`zarr_output_to_nc` — convert a written
  ``extpom_tpu.output.v1`` Zarr snapshot dataset to such a file
  (also the module CLI: ``python -m extpom_tpu.io.netcdf SRC DST.nc``).
* :func:`read_grid_nc` — build a :class:`Grid` from a reference-format
  grid file (read_grid_pnetcdf, io_pnetcdf.F:2084-2264; accepts both
  the ROMS-style names it reads — ``lon_rho``/``lat_rho``/``angle`` —
  and this framework's ``east_e``/``north_e``/``rot``).
* :func:`read_initial_ts_nc` — initial T/S from a reference-format
  ``*.init.nc`` (read_initial_ts_pnetcdf, io_pnetcdf.F:2771-2844;
  variables ``T``/``S``, case-insensitive).  Values come back on their
  stored levels — z-level data still goes through
  ``utils/interp.ztosig`` exactly as the reference interpolates after
  reading.
* :class:`NcForcingSource` / :func:`write_forcing_series_nc` — forcing
  record series (the ``.sfrc.nc``/``.lbry.nc`` readers,
  io_pnetcdf.F:2912-3622), provider-protocol compatible.
* :func:`write_restart_nc` / :func:`read_restart_nc` — the reference's
  37-variable restart payload, both directions (io_pnetcdf.F:1661-2083,
  2420-2769).

Array layout: this framework stores horizontal fields as ``(im, jm)`` =
(x, y) and 3-D fields as ``(kb, im, jm)``; NetCDF files written by the
Fortran reference carry ``var(x, y[, z][, time])`` which appears in C
dimension order as ``(time[, z], y, x)`` — every read/write here
transposes the trailing horizontal axes accordingly.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from scipy.io import netcdf_file

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid
from extpom_tpu.core.state import State

# scalar diagnostics: this framework's domain_stats key -> the
# reference's output variable name (write_output_pnetcdf,
# io_pnetcdf.F:72-92; advance.f:669-745)
_STAT_NAMES = {"vtot": "vtot", "atot": "atot", "mtot": "mtot",
               "tsalt": "tsalt", "taver": "tavg", "saver": "savg",
               "eaver": "eavg", "ekin": "ekin"}

_GRID_2D = ("dx", "dy", "east_u", "east_v", "east_e", "east_c",
            "north_u", "north_v", "north_e", "north_c", "rot", "h",
            "fsm", "dum", "dvm")
_FIELDS_2D = ("uab", "vab", "elb")
_FIELDS_3D = ("u", "v", "w", "t", "s", "rho", "km", "kh", "aam")

_UNITS = {"time": "days", "z": "sigma_level", "zz": "sigma_level",
          "dx": "metre", "dy": "metre", "h": "metre", "elb": "metre",
          "uab": "metre/sec", "vab": "metre/sec", "u": "metre/sec",
          "v": "metre/sec", "w": "metre/sec", "t": "K", "s": "PSS",
          "rho": "dimensionless", "km": "m^2/sec", "kh": "m^2/sec",
          "aam": "m^2/sec", "east_e": "degree", "north_e": "degree",
          "rot": "degree"}


def _hx(a: np.ndarray) -> np.ndarray:
    """(.., im, jm) -> (.., jm, im): swap to the file's (y, x) order."""
    return np.swapaxes(np.asarray(a), -1, -2)


def write_output_nc(path: str, grid: Grid, cfg: Config, state: State,
                    time_days: float, stats: Optional[Dict] = None,
                    extra: Optional[Dict] = None,
                    append: bool = False) -> None:
    """One snapshot as a reference-layout NetCDF file
    (write_output_pnetcdf, io_pnetcdf.F:57-410): dimensions
    ``time`` (record), ``z`` (kb), ``y`` (jm), ``x`` (im).

    ``append=True`` reproduces the reference's single-file output
    stream: when ``path`` exists, the snapshot lands at the next record
    index of the SAME file (the ``iout`` record writes,
    io_pnetcdf.F:180-410) — static grid variables are written once, at
    creation."""
    if append and os.path.exists(path):
        _append_output_nc(path, cfg, state, time_days, stats, extra)
        return
    f = netcdf_file(path, "w", version=2)   # 64-bit offset
    try:
        f.title = "extpom_tpu output snapshot"
        f.createDimension("time", None)
        f.createDimension("z", cfg.kb)
        f.createDimension("y", cfg.jm)
        f.createDimension("x", cfg.im)

        def var(name, dims, data):
            a = np.asarray(data)
            v = f.createVariable(name, a.dtype.newbyteorder("="), dims)
            if dims and dims[0] == "time":   # record variable: per-record
                for r in range(a.shape[0]):
                    v[r] = a[r]
            else:
                v[...] = a
            if name in _UNITS:
                v.units = _UNITS[name]
            return v

        var("time", ("time",), np.asarray([time_days], np.float64))
        if stats:
            for key, nc_name in _STAT_NAMES.items():
                if key in stats:
                    var(nc_name, ("time",),
                        np.asarray([stats[key]], np.float64))
        var("z", ("z",), grid.z)
        var("zz", ("z",), grid.zz)
        for name in _GRID_2D:
            var(name, ("y", "x"), _hx(getattr(grid, name)))
        for name in _FIELDS_2D:
            var(name, ("time", "y", "x"),
                _hx(getattr(state, name))[None])
        for name in _FIELDS_3D:
            var(name, ("time", "z", "y", "x"),
                _hx(getattr(state, name))[None])
        if extra:
            for name, arr in extra.items():
                a = np.asarray(arr)
                dims = (("time", "z", "y", "x") if a.ndim == 3
                        else ("time", "y", "x"))
                var(name, dims, _hx(a)[None])
    finally:
        f.close()


def _append_output_nc(path: str, cfg: Config, state: State,
                      time_days: float, stats: Optional[Dict],
                      extra: Optional[Dict]) -> None:
    """Write one more record into an existing output file (see
    :func:`write_output_nc` append mode)."""
    f = netcdf_file(path, "a", version=2)
    try:
        n = f.variables["time"].shape[0]
        f.variables["time"][n] = np.float64(time_days)
        if stats:
            for key, nc_name in _STAT_NAMES.items():
                if key in stats and nc_name in f.variables:
                    f.variables[nc_name][n] = np.float64(stats[key])
        for name in _FIELDS_2D + _FIELDS_3D:
            f.variables[name][n] = _hx(getattr(state, name))
        if extra:
            for name, arr in extra.items():
                if name in f.variables:
                    f.variables[name][n] = _hx(np.asarray(arr))
    finally:
        f.close()


def zarr_output_to_nc(src: str, dst: str) -> None:
    """Convert an ``extpom_tpu.output.v1`` Zarr snapshot dataset (as
    written by io.zarrstore.write_output) to the reference-layout NetCDF
    file of :func:`write_output_nc`."""
    from extpom_tpu.io import zarrstore as zio
    d = zio.read_output(src)
    attrs = d["attrs"]
    kb, im, jm = d["u"].shape

    f = netcdf_file(dst, "w", version=2)
    try:
        f.title = "extpom_tpu output snapshot"
        f.createDimension("time", None)
        f.createDimension("z", kb)
        f.createDimension("y", jm)
        f.createDimension("x", im)

        def var(name, dims, data):
            a = np.asarray(data)
            v = f.createVariable(name, a.dtype.newbyteorder("="), dims)
            if dims and dims[0] == "time":
                for r in range(a.shape[0]):
                    v[r] = a[r]
            else:
                v[...] = a
            if name in _UNITS:
                v.units = _UNITS[name]

        var("time", ("time",),
            np.asarray([attrs.get("time_days", 0.0)], np.float64))
        for key, nc_name in _STAT_NAMES.items():
            if key in attrs.get("stats", {}):
                var(nc_name, ("time",),
                    np.asarray([attrs["stats"][key]], np.float64))
        var("z", ("z",), d["z"])
        var("zz", ("z",), d["zz"])
        for name in _GRID_2D:
            if name in d:
                var(name, ("y", "x"), _hx(d[name]))
        for name in _FIELDS_2D:
            var(name, ("time", "y", "x"), _hx(d[name])[None])
        for name in _FIELDS_3D:
            var(name, ("time", "z", "y", "x"), _hx(d[name])[None])
    finally:
        f.close()


def _nc_vars(path: str) -> Dict[str, np.ndarray]:
    """Read every variable of a NetCDF-3 file into plain arrays (copies —
    the mmap is closed before returning)."""
    f = netcdf_file(path, "r", mmap=False)
    try:
        return {name: np.asarray(v[...])
                for name, v in f.variables.items()}
    finally:
        f.close()


def read_grid_nc(path: str, cfg: Config) -> Grid:
    """Build a Grid from a reference-format NetCDF grid file
    (read_grid_pnetcdf, io_pnetcdf.F:2084-2264).  Reads
    ``z/zz/dx/dy/h/fsm`` plus coordinates/rotation under either the
    reference's input names (``lon_rho``/``lat_rho``/``angle``) or this
    framework's output names (``east_e``/``north_e``/``rot``); masks and
    metrics (dum/dvm/art/aru/arv/cor/cbc) are re-derived exactly as the
    reference derives them after reading."""
    from extpom_tpu.core.grid import make_grid
    v = _nc_vars(path)

    def pick(*names):
        for n in names:
            if n in v:
                return v[n]
        raise KeyError(f"grid file {path} has none of {names}; "
                       f"found {sorted(v)}")

    def pick2(*names):
        return _hx(pick(*names))        # file (y, x) -> (im, jm)

    z = np.asarray(pick("z")).reshape(-1)[:cfg.kb]
    zz = np.asarray(pick("zz")).reshape(-1)[:cfg.kb]
    kw = {}
    try:
        kw = dict(east_e=pick2("east_e", "lon_rho"),
                  north_e=pick2("north_e", "lat_rho"),
                  rot=pick2("rot", "angle"))
    except KeyError:
        pass                            # coordinates are optional
    return make_grid(cfg, z, zz, pick2("dx"), pick2("dy"),
                     pick2("h"), pick2("fsm"), **kw)


def read_initial_ts_nc(path: str):
    """Initial T/S from a reference-format ``*.init.nc``
    (read_initial_ts_pnetcdf, io_pnetcdf.F:2771-2844: variables ``T``
    and ``S``; a trailing record/level layout of ``(z, y, x)`` or
    ``(time, z, y, x)``).  Returns ``(tb, sb, tclim, sclim)`` shaped
    ``(k, im, jm)`` on the file's own levels — z-level data still needs
    ``utils/interp.ztosig``, as in the reference's post-read pipeline.
    ``tclim``/``sclim`` fall back to tb/sb when the file carries no
    ``Tclim``/``Sclim``."""
    v = {k.lower(): a for k, a in _nc_vars(path).items()}

    def field(name):
        a = v.get(name)
        if a is None:
            return None
        a = np.asarray(a)
        if a.ndim == 4:                 # (time, z, y, x): first record
            a = a[0]
        return _hx(a)                   # (z, y, x) -> (z, im, jm)

    tb, sb = field("t"), field("s")
    if tb is None or sb is None:
        raise KeyError(f"{path} lacks T/S variables; found {sorted(v)}")
    tclim = field("tclim")
    sclim = field("sclim")
    return (tb, sb, tb if tclim is None else tclim,
            sb if sclim is None else sclim)


# the reference's 37-variable restart payload (write_restart_pnetcdf,
# io_pnetcdf.F:1661-2083) — names match State fields one for one
_RESTART_2D = ("wubot", "wvbot", "aam2d", "ua", "uab", "va", "vab",
               "el", "elb", "et", "etb", "egb", "utb", "vtb",
               "adx2d", "ady2d", "advua", "advva")
_RESTART_3D = ("u", "ub", "v", "vb", "w", "t", "tb", "s", "sb", "rho",
               "km", "kh", "kq", "l", "q2", "q2b", "aam", "q2l", "q2lb")


def write_restart_nc(path: str, state: State, time_days: float) -> None:
    """Checkpoint in the REFERENCE's restart layout
    (write_restart_pnetcdf, io_pnetcdf.F:1661-2083: scalar ``time`` +
    the 37 restart variables, dims ``(z, y, x)``) so a reference
    installation can resume from this framework's run.  The native Zarr
    restart (io.zarrstore.write_restart) stays the bit-seamless
    checkpoint — this is the interchange export."""
    f = netcdf_file(path, "w", version=2)
    try:
        kb, im, jm = state.u.shape
        f.createDimension("time", None)
        f.createDimension("z", kb)
        f.createDimension("y", jm)
        f.createDimension("x", im)
        v = f.createVariable("time", np.dtype(np.float64), ("time",))
        v[0] = np.float64(time_days)
        for name in _RESTART_2D:
            a = _hx(getattr(state, name))
            f.createVariable(name, a.dtype.newbyteorder("="),
                             ("y", "x"))[...] = a
        for name in _RESTART_3D:
            a = _hx(getattr(state, name))
            f.createVariable(name, a.dtype.newbyteorder("="),
                             ("z", "y", "x"))[...] = a
    finally:
        f.close()


def read_restart_nc(path: str, cfg: Config):
    """Resume from a reference-format restart file
    (read_restart_pnetcdf, io_pnetcdf.F:2420-2769).  Returns
    ``(state, iint, time0)`` with ``iint=0`` and ``time0`` = the file's
    ``time`` — step counting restarts, simulation time continues, the
    reference's own convention (``time0`` in initialize.f).

    Fields of this framework's State that the reference does NOT
    checkpoint are re-seeded exactly as a resumed reference run holds
    them: ``etf`` <- ``et`` (overwritten by the first external loop),
    ``drx2d``/``dry2d`` <- 0 (re-accumulated from the pressure phase
    every step, advance.f:96-141), ``vfluxb``/``vfluxf`` <- 0."""
    import jax.numpy as jnp
    import dataclasses as _dc
    v = _nc_vars(path)
    dt = cfg.jnp_dtype
    fields = {}
    for name in _RESTART_2D + _RESTART_3D:
        if name not in v:
            raise KeyError(f"restart file {path} lacks {name!r}")
        a = _hx(v[name])
        if a.ndim > (2 if name in _RESTART_2D else 3):
            a = a[0]                      # tolerate a record dim
        fields[name] = jnp.asarray(a, dt)
    fields["etf"] = fields["et"]
    for name in ("drx2d", "dry2d"):
        fields[name] = jnp.zeros_like(fields["el"])
    for name in ("vfluxb", "vfluxf"):
        fields[name] = jnp.zeros_like(fields["el"])
    missing = ({f.name for f in _dc.fields(State)} - set(fields))
    assert not missing, f"unseeded State fields: {missing}"
    time0 = float(np.asarray(v["time"]).reshape(-1)[0])
    return State(**fields), 0, time0


class NcForcingSource:
    """Forcing record source over one NetCDF-3 file — the reference's
    surface/lateral series readers (read_wind/read_heat/read_surface/
    read_water/read_boundary_conditions, io_pnetcdf.F:2912-3622) for
    users bringing reference-format ``.sfrc.nc`` / ``.lbry.nc`` files.

    Protocol matches ZarrSource / NativeRecordSource: ``names()`` /
    ``nrec(name)`` / ``read(name, n)`` (record index clamped).  Record
    variables are those with a leading ``time`` dimension; axis order is
    resolved from the variable's DIMENSION NAMES — a record whose
    trailing dims are ``(.., y, x)`` (the Fortran writer's layout) is
    transposed to this framework's ``(.., im, jm)``, per-side boundary
    series (``(time, y)`` / ``(time, z, y)`` etc.) pass through.

    The whole file is loaded at open (scipy, mmap off): simple and safe
    under the provider's prefetch thread.  For series too large for
    host RAM use the native EFR record store (native/recordio) or Zarr.
    """

    def __init__(self, path: str):
        self.path = path
        f = netcdf_file(path, "r", mmap=False)
        try:
            self._data: Dict[str, np.ndarray] = {}
            for name, v in f.variables.items():
                dims = v.dimensions
                if not dims or dims[0] != "time" or name == "time":
                    continue
                a = np.asarray(v[...])
                if len(dims) >= 3 and dims[-2:] == ("y", "x"):
                    a = np.swapaxes(a, -1, -2)
                self._data[name] = a
        finally:
            f.close()

    def names(self):
        return list(self._data)

    def nrec(self, name: str) -> int:
        return self._data[name].shape[0]

    def read(self, name: str, n: int) -> np.ndarray:
        a = self._data[name]
        return a[min(max(n, 0), a.shape[0] - 1)]


def write_forcing_series_nc(path: str, data: Dict[str, np.ndarray],
                            im: int, jm: int, kb: int = 0) -> None:
    """Write a forcing series file consumable by :class:`NcForcingSource`
    (and by reference-style tooling): every array gets a leading
    ``time`` record dim; full fields ``(nrec, im, jm)`` are stored as
    ``(time, y, x)``, per-side series pass through with anonymous
    dims."""
    f = netcdf_file(path, "w", version=2)
    try:
        f.createDimension("time", None)
        f.createDimension("y", jm)
        f.createDimension("x", im)
        if kb:
            f.createDimension("z", kb)
        extra = 0
        for name, arr in data.items():
            a = np.asarray(arr)
            rec = a.shape[1:]
            if rec == (im, jm):
                dims = ("time", "y", "x")
                a = np.swapaxes(a, -1, -2)
            elif kb and rec == (kb, im, jm):
                dims = ("time", "z", "y", "x")
                a = np.swapaxes(a, -1, -2)
            elif len(rec) == 2 and kb and rec[0] == kb:
                n = f"n{extra}"
                f.createDimension(n, rec[1])
                extra += 1
                dims = ("time", "z", n)
            else:
                ds = []
                for s in rec:
                    n = f"n{extra}"
                    f.createDimension(n, s)
                    extra += 1
                    ds.append(n)
                dims = ("time",) + tuple(ds)
            v = f.createVariable(name, a.dtype.newbyteorder("="), dims)
            for r in range(a.shape[0]):
                v[r] = a[r]
    finally:
        f.close()


def main(argv=None) -> int:
    import sys
    import types
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print("usage: python -m extpom_tpu.io.netcdf "
              "<output.zarr-dir> [more.zarr-dirs ...] <out.nc>\n"
              "Multiple snapshot dirs merge into one record stream "
              "(the reference's single output file).")
        return 2
    srcs, dst = argv[:-1], argv[-1]
    zarr_output_to_nc(srcs[0], dst)
    if len(srcs) > 1:
        from extpom_tpu.io import zarrstore as zio
        for src in srcs[1:]:
            d = zio.read_output(src)
            attrs = d["attrs"]
            _append_output_nc(
                dst, None,
                types.SimpleNamespace(**{n: d[n] for n
                                         in _FIELDS_2D + _FIELDS_3D}),
                attrs.get("time_days", 0.0), attrs.get("stats"), None)
    print(f"wrote {dst} ({len(srcs)} records, "
          f"{os.path.getsize(dst)} bytes)")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
