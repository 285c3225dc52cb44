"""Small namelist-visible parity behaviors (VERDICT r1 item 6):
iswtch/prtd2 print switching, wr output behind calc_wr, TWATER cadence,
restore-series provider wiring, and check_velocity location reporting."""

import numpy as np
import pytest

from extpom_tpu.cases.seamount import seamount_model
from extpom_tpu.core.config import Config
from extpom_tpu.diag import stats as diag_stats
from extpom_tpu.forcing.provider import (ForcingProvider, ArraySource,
                                         TWATER, TRST)


def test_iswtch_print_switch():
    """advance.f:65-68: print interval switches from prtd1 to prtd2 at
    iswtch."""
    cfg = Config(im=17, jm=17, kb=5, dte=6.0, isplit=5,
                 prtd1=6.0 / 86400.0 * 5,     # print every step initially
                 prtd2=6.0 / 86400.0 * 5 * 4,  # then every 4 steps
                 swtch=6.0 / 86400.0 * 5 * 4)  # switch at iint=4
    assert cfg.iprint == 1
    assert cfg.iprint2 == 4
    assert cfg.iswtch == 4
    m = seamount_model(im=17, jm=17, kb=5, dtype="float64", donate=False,
                       dte=cfg.dte, isplit=cfg.isplit, prtd1=cfg.prtd1,
                       prtd2=cfg.prtd2, swtch=cfg.swtch)
    printed = []
    m.run(n_steps=8, on_print=lambda mm, s: printed.append(mm.iint))
    # every step until iswtch, then only multiples of iprint2 (+ final)
    assert printed == [1, 2, 3, 4, 8]


def test_check_velocity_location():
    cfg = Config(im=8, jm=8, kb=5)
    va = np.zeros((8, 8))
    va[5, 3] = -7.5
    vamax, (i, j) = diag_stats.check_velocity(cfg, va)
    assert float(vamax) == 7.5 and (int(i), int(j)) == (5, 3)


def test_compute_wr_finite_and_output():
    m = seamount_model(im=17, jm=17, kb=7, dtype="float64", donate=False,
                       calc_wr=True)
    m.run(n_steps=3)
    wr = np.asarray(m.compute_wr())
    assert wr.shape == (7, 17, 17)
    assert np.all(np.isfinite(wr))
    assert float(np.abs(wr).max()) > 0.0  # actually computed


def test_compute_wr_matches_oracle():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "reference"))
    import pom_ref
    m = seamount_model(im=17, jm=17, kb=7, dtype="float64", donate=False)
    m.run(n_steps=3)
    got = np.asarray(m.compute_wr())
    g, st, cfg = m.grid, m.state, m.cfg
    want = pom_ref.realvertvl_ref(
        np.asarray(st.w), np.asarray(st.u), np.asarray(st.v),
        np.asarray(g.h) + np.asarray(st.et), np.asarray(st.et),
        np.asarray(st.etf), np.asarray(st.etb), np.asarray(g.dx),
        np.asarray(g.dy), np.asarray(g.zz), np.asarray(g.fsm),
        cfg.dti2, cfg.kbm1)
    np.testing.assert_allclose(got, want, atol=1e-12)


def _provider_with(m, data, **kw):
    return ForcingProvider(m.grid, m.cfg, m.base_forcing,
                           ArraySource(data), prefetch=False, **kw)


def test_water_cadence():
    """wssurf follows the 30-day TWATER cadence (bounds_forcing.f:986-1020),
    not the 0.125-day surface cadence."""
    m = seamount_model(im=9, jm=9, kb=5, dtype="float64", donate=False)
    nrec = 4
    series = np.arange(nrec, dtype=np.float64)[:, None, None] \
        * np.ones((9, 9))
    p = _provider_with(m, {"wssurf": series})
    # t = 15 days = half of the first TWATER interval -> value 0.5
    iint = int(round(15.0 * 86400.0 / m.cfg.dti))
    fc = p(m, iint)
    got = float(np.asarray(fc.wssurf)[4, 4])
    t_days = m.cfg.dti * iint / 86400.0
    want = t_days / TWATER  # linear between records 0 and 1
    assert abs(got - want) < 1e-6


def test_restore_series_provider():
    """trstr/srstr series at the 30-day TRST cadence with linear interp +
    default taurstr = 1/trst (io_pnetcdf.F:3275-3335,
    bounds_forcing.f:1036-1094)."""
    m = seamount_model(im=9, jm=9, kb=5, dtype="float64", donate=False)
    nrec, kb = 3, m.cfg.kb
    tr = np.stack([np.full((kb, 9, 9), float(r)) for r in range(nrec)])
    sr = tr + 100.0
    p = _provider_with(m, {"trstr": tr, "srstr": sr})
    iint = int(round(15.0 * 86400.0 / m.cfg.dti))   # mid first interval
    fc = p(m, iint)
    t_days = m.cfg.dti * iint / 86400.0
    frac = t_days / TRST
    assert abs(float(np.asarray(fc.trstr)[0, 4, 4]) - frac) < 1e-6
    assert abs(float(np.asarray(fc.srstr)[0, 4, 4]) - (100.0 + frac)) < 1e-6
    np.testing.assert_allclose(np.asarray(fc.taurstr), 1.0 / TRST)
