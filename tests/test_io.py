"""Zarr I/O: restart round-trip seamlessness, output snapshots, and the
Zarr-backed forcing source (BASELINE config 4 machinery)."""

import numpy as np
import pytest

from extpom_tpu.io import zarrstore as zio


@pytest.mark.skipif(not zio.HAVE_TS, reason="tensorstore unavailable")
def test_restart_roundtrip_bitwise(tmp_path):
    """Write restart at step 3, resume, and match a straight 6-step run
    bitwise (the reference's restart is seamless for the same reason:
    every time level is saved, io_pnetcdf.F:1674-1678)."""
    from extpom_tpu.cases.seamount import seamount_model

    m1 = seamount_model(im=17, jm=17, kb=7, donate=False, dtype="float64")
    m1.run(n_steps=6)
    el_a = np.asarray(m1.state.el).copy()

    m2 = seamount_model(im=17, jm=17, kb=7, donate=False, dtype="float64")
    m2.run(n_steps=3)
    zio.write_restart(str(tmp_path / "rst"), m2.state, m2.iint)

    m3 = seamount_model(im=17, jm=17, kb=7, donate=False, dtype="float64")
    st, iint, time0 = zio.read_restart(str(tmp_path / "rst"), m3.cfg)
    m3.state, m3.iint, m3.time0 = st, iint, time0
    m3.run(n_steps=3)
    np.testing.assert_array_equal(el_a, np.asarray(m3.state.el))


@pytest.mark.skipif(not zio.HAVE_TS, reason="tensorstore unavailable")
def test_output_snapshot(tmp_path):
    from extpom_tpu.cases.seamount import seamount_model
    from extpom_tpu.diag import stats as diag_stats

    m = seamount_model(im=17, jm=17, kb=7, donate=False, dtype="float64")
    m.run(n_steps=2)
    stats = {k: float(v) for k, v in
             diag_stats.domain_stats(m.grid, m.cfg, m.state).items()}
    zio.write_output(str(tmp_path / "out"), m.grid, m.cfg, m.state,
                     m.time_days, stats)
    snap = zio.read_output(str(tmp_path / "out"))
    np.testing.assert_array_equal(snap["t"], np.asarray(m.state.t))
    np.testing.assert_array_equal(snap["h"], np.asarray(m.grid.h))
    assert snap["attrs"]["stats"]["vtot"] == stats["vtot"]
    assert snap["attrs"]["time_days"] == m.time_days


@pytest.mark.skipif(not zio.HAVE_TS, reason="tensorstore unavailable")
def test_zarr_forcing_source(tmp_path):
    from extpom_tpu.cases.seamount import seamount_case
    from extpom_tpu.core.model import Model
    from extpom_tpu.forcing.provider import ForcingProvider

    cfg, grid, ics = seamount_case(im=17, jm=17, kb=7, dtype="float64")
    m = Model(grid, cfg, tb=ics["tb"], sb=ics["sb"], donate=False)

    nrec = 5
    wu = np.arange(nrec)[:, None, None] * np.ones((nrec, 17, 17))
    zio.write_forcing_series(str(tmp_path / "sfrc"), {"wusurf": wu})
    src = zio.ZarrSource(str(tmp_path / "sfrc"))
    assert src.nrec("wusurf") == nrec

    prov = ForcingProvider(grid, cfg, m.base_forcing, src)
    iint = int(0.0625 * 86400 / cfg.dti)
    fc = prov(m, iint)
    t_days = cfg.dti * iint / 86400.0
    np.testing.assert_allclose(np.asarray(fc.wusurf)[0, 0],
                               t_days / 0.125, rtol=1e-6)
