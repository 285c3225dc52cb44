"""End-to-end seamount integration tests (BASELINE configs 1-2).

The seamount case is POM's canonical validation problem (SURVEY.md §4); with
no reference binary available, the oracles are physics invariants: finite
fields, volume/heat/salt conservation, symmetry about the y mid-plane for a
symmetric setup, and quiescence bounds for the no-flow adjustment problem.
"""

import numpy as np
import pytest

from extpom_tpu.cases.seamount import seamount_model
from extpom_tpu.diag import stats as diag_stats


@pytest.fixture(scope="module")
def model_3d():
    m = seamount_model(im=33, jm=33, kb=11, donate=False, dtype="float64")
    m.run(n_steps=20)
    return m


def test_fields_finite(model_3d):
    st = model_3d.state
    for name in ("el", "ua", "va", "u", "v", "w", "t", "s", "rho",
                 "q2", "q2l", "km", "kh", "aam"):
        a = np.asarray(getattr(st, name))
        assert np.all(np.isfinite(a)), f"{name} not finite"


def test_conservation(model_3d):
    m = model_3d
    s = {k: float(v) for k, v in
         diag_stats.domain_stats(m.grid, m.cfg, m.state).items()}
    # salinity is uniform 35 (anomaly 15): stays to round-off
    assert abs(s["saver"] - 15.0) < 1e-7
    # volume: |eaver| bounded by a few mm over 20 steps
    assert abs(s["eaver"]) < 5e-3
    # heat: initial taver reproduced to a tight tolerance
    m0 = seamount_model(im=33, jm=33, kb=11, donate=False, dtype="float64")
    s0 = {k: float(v) for k, v in
          diag_stats.domain_stats(m0.grid, m0.cfg, m0.state).items()}
    assert abs(s["taver"] - s0["taver"]) < 5e-4


def test_velocity_bounded(model_3d):
    st = model_3d.state
    assert float(np.max(np.abs(np.asarray(st.ua)))) < 1.0
    assert float(np.max(np.abs(np.asarray(st.u)))) < 2.0


def test_symmetry_quiescent():
    """No-flow adjustment: the setup is symmetric in y, so el must stay
    symmetric about the mid-plane and velocities small (the residual flow is
    the sigma-coordinate PG truncation error, which rmean subtraction keeps
    tiny, solver.f:854)."""
    m = seamount_model(im=33, jm=33, kb=11, vel=0.0, donate=False,
                       dtype="float64")
    m.run(n_steps=20)
    el = np.asarray(m.state.el)
    assert np.allclose(el, el[:, ::-1], atol=1e-10)
    u = np.asarray(m.state.u)
    # spurious PG-error currents: small
    assert float(np.max(np.abs(u))) < 1e-2


def test_mode2_barotropic_closed_basin():
    """External-only mode (BASELINE config 1): gravity-wave adjustment of an
    initial elevation bump in a closed basin (land ring).  Volume is exactly
    conserved by the flux-form free-surface update when no boundary is open
    (advance.f:211-229)."""
    from extpom_tpu.core.config import Config
    from extpom_tpu.core.grid import make_grid, sigma_levels
    from extpom_tpu.core.model import Model

    im, jm, kb = 33, 33, 5
    cfg = Config(im=im, jm=jm, kb=kb, mode=2, lramp=False, dte=6.0,
                 isplit=10, dtype="float64")
    z, zz = sigma_levels(kb)
    dx = np.full((im, jm), 5000.0)
    h = np.full((im, jm), 100.0)
    fsm = np.ones((im, jm))
    fsm[0, :] = fsm[-1, :] = fsm[:, 0] = fsm[:, -1] = 0.0
    # f = 0: pure gravity waves keep the mirror symmetries (Coriolis would
    # break them, allowing only the 180-degree rotation symmetry)
    grid = make_grid(cfg, z, zz, dx, dx, h, fsm,
                     cor=np.zeros((im, jm)))

    x = (np.arange(im) - (im - 1) / 2)[:, None]
    y = (np.arange(jm) - (jm - 1) / 2)[None, :]
    elb = 0.1 * np.exp(-(x ** 2 + y ** 2) / 25.0) * fsm
    tb = np.zeros((kb, im, jm))
    sb = np.full((kb, im, jm), 35.0)
    m = Model(grid, cfg, tb=tb, sb=sb, elb=elb, donate=False)

    art = np.asarray(grid.art) * fsm
    vol0 = float(np.sum(np.asarray(m.state.el) * art))
    m.run(n_steps=20)
    el = np.asarray(m.state.el)
    assert np.all(np.isfinite(el))
    vol1 = float(np.sum(el * art))
    area = float(np.sum(art))
    assert abs(vol1 - vol0) / area < 1e-8   # mean level drift < 1e-8 m
    # the bump must have dispersed: center amplitude reduced
    assert abs(el[im // 2, jm // 2]) < 0.07
    # symmetry of the closed-basin solution
    assert np.allclose(el, el[:, ::-1], atol=1e-12)
    assert np.allclose(el, el[::-1, :], atol=1e-12)


def test_restart_seamlessness():
    """Stepping 2N must equal stepping N, snapshotting the full State, and
    stepping N more from the snapshot (restart is bit-seamless because State
    carries all leapfrog levels + closure state, like the reference's
    37-variable restart file, io_pnetcdf.F:1674-1678)."""
    m1 = seamount_model(im=17, jm=17, kb=7, donate=False, dtype="float64")
    m1.run(n_steps=6)
    el_a = np.asarray(m1.state.el).copy()

    m2 = seamount_model(im=17, jm=17, kb=7, donate=False, dtype="float64")
    m2.run(n_steps=3)
    snap = m2.state      # immutable pytree == snapshot
    m3 = seamount_model(im=17, jm=17, kb=7, donate=False, dtype="float64")
    m3.state = snap
    m3.iint = m2.iint
    m3.run(n_steps=3)
    el_b = np.asarray(m3.state.el)
    np.testing.assert_array_equal(el_a, el_b)
