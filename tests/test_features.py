"""Feature-path integration tests: every mode/scheme switch in the
reference namelist (SURVEY §7 feature-parity checklist) runs stably."""

import numpy as np
import pytest

from extpom_tpu.cases.seamount import seamount_model
from extpom_tpu.diag import stats as diag_stats


def _run(n=8, **kw):
    kw.setdefault("im", 33)
    kw.setdefault("jm", 33)
    kw.setdefault("kb", 11)
    kw.setdefault("dtype", "float64")
    m = seamount_model(donate=False, **kw)
    m.run(n_steps=n)
    st = m.state
    for name in ("el", "ua", "u", "t", "s", "q2", "km"):
        assert np.all(np.isfinite(np.asarray(getattr(st, name)))), name
    return m


def _saver(m):
    return float(diag_stats.domain_stats(m.grid, m.cfg, m.state)["saver"])


def test_mpdata_advection():
    """nadv=2: Smolarkiewicz MPDATA with antidiffusive iterations
    (solver.f:577-731); salinity stays uniform and positive-definite."""
    m = _run(nadv=2, nitera=2, sw=0.5)
    assert abs(_saver(m) - 15.0) < 1e-6
    # MPDATA preserves monotonicity: T within initial range
    t = np.asarray(m.state.t)[:m.cfg.kbm1]
    assert t.min() > -5.3 and t.max() < 10.3


def test_mcc_pressure_gradient():
    """npg=2: 4th-order McCalpin pressure gradient (solver.f:943-1159);
    spurious PG-error flow in the no-flow problem must stay comparable to
    the 2nd-order scheme."""
    m4 = _run(npg=2, vel=0.0)
    u4 = float(np.abs(np.asarray(m4.state.u)).max())
    assert u4 < 1e-2


def test_mode4_frozen_ts():
    """mode=4: T/S held fixed while momentum evolves (advance.f:424)."""
    m = _run(mode=4)
    t0 = 5.0 + 15.0 * np.exp(
        np.asarray(m.grid.zz)[:, None, None] * np.asarray(m.grid.h)[None]
        / 1000.0) - m.cfg.tbias
    np.testing.assert_allclose(np.asarray(m.state.t)[:m.cfg.kbm1],
                               t0[:m.cfg.kbm1], atol=1e-12)


def test_shortwave_penetration():
    """nbct=2 with downward shortwave: the Paulson-Simpson profile heats
    the upper layers (solver.f:1600-1615)."""
    import jax.numpy as jnp

    m = seamount_model(im=33, jm=33, kb=11, dtype="float64", nbct=2, ntp=2,
                       vel=0.0, donate=False)
    base = m.base_forcing
    m.forcing_fn = lambda model, iint: base.replace(
        swrad=jnp.full((33, 33), -500.0 / 4.1876e6, jnp.float64))
    t_before = np.asarray(m.state.t)[0].mean()
    m.run(n_steps=8)
    t_after = np.asarray(m.state.t)[0, 1:-1, 1:-1].mean()
    assert t_after > t_before + 1e-5   # surface warmed


def test_interior_restoring():
    """do_restore: T/S nudged toward the restore climatology
    (bounds_forcing.f:1023-1121)."""
    import jax.numpy as jnp

    m = seamount_model(im=17, jm=17, kb=7, dtype="float64", vel=0.0,
                       do_restore=True, donate=False)
    cfg = m.cfg
    base = m.base_forcing
    # restore hard toward t+1 with a fast timescale
    trstr = np.asarray(m.state.t) + 1.0
    m.forcing_fn = lambda model, iint: base.replace(
        trstr=jnp.asarray(trstr), srstr=jnp.asarray(np.asarray(m.state.s)),
        taurstr=jnp.full((cfg.kb, 17, 17), 30.0, jnp.float64))
    t0 = np.asarray(m.state.t)[0, 8, 8]
    m.run(n_steps=8)
    t1 = np.asarray(m.state.t)[0, 8, 8]
    assert t1 > t0 + 0.5   # pulled strongly toward t+1


def test_inertial_ramp():
    """lramp: the baroclinic pressure gradient ramps from ~0 -> 1 over an
    inertial period (advance.f:66-71, solver.f:928-935); in the no-flow
    problem the early spurious PG-error currents must be much weaker than
    unramped.  (Note: with a nonzero inflow the ramp also suppresses the
    Flather boundary velocity, which ACTS like a closed wall and raises
    elevation — so the no-flow case is the clean probe.)"""
    m_r = _run(n=4, lramp=True, vel=0.0)
    m_n = _run(n=4, lramp=False, vel=0.0)
    u_r = float(np.abs(np.asarray(m_r.state.u)).max())
    u_n = float(np.abs(np.asarray(m_n.state.u)).max())
    assert u_r < 0.5 * u_n


def test_ispadv_skipping():
    """ispadv>1: external advection terms updated every ispadv substeps
    (advance.f:235) — still stable, close to ispadv=1."""
    m1 = _run(n=6, ispadv=1)
    m5 = _run(n=6, ispadv=5)
    el1 = np.asarray(m1.state.el)
    el5 = np.asarray(m5.state.el)
    assert float(np.abs(el1 - el5).max()) < 0.05


def test_orlanski_scheme_runs():
    """bc_scheme='orlanski': the full bcondorl family (with the documented
    N/S zero-gradient deviation) stays stable and conservative."""
    m = _run(bc_scheme="orlanski")
    assert abs(_saver(m) - 15.0) < 1e-5
