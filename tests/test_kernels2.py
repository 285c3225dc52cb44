"""Round-2 oracle tests: the remaining solver.f kernels against the
independent loop-based NumPy references (tests/reference/pom_ref.py) on
randomized inputs — advave, advct, advq, advu/advv, advt2+smol_adif,
baropg_mcc, profv, profq, realvertvl."""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "reference"))
import pom_ref  # noqa: E402

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import make_grid, sigma_levels
from extpom_tpu.ops import (advection2d, momentum, tracers, pressure,
                            vertical, continuity)


IM, JM, KB = 14, 12, 8


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    cfg = Config(im=IM, jm=JM, kb=KB, dtype="float64", dte=6.0, isplit=10,
                 nitera=2, sw=0.5)
    z, zz = sigma_levels(KB)
    dx = 5000.0 * (1.0 + 0.1 * rng.random((IM, JM)))
    dy = 5000.0 * (1.0 + 0.1 * rng.random((IM, JM)))
    h = 100.0 + 900.0 * rng.random((IM, JM))
    fsm = np.ones((IM, JM))
    grid = make_grid(cfg, z, zz, dx, dy, h, fsm)

    def rand3(scale=1.0, off=0.0):
        return off + scale * rng.random((KB, IM, JM))

    def rand2(scale=1.0, off=0.0):
        return off + scale * rng.random((IM, JM))

    return cfg, grid, rand3, rand2


def g(grid, name):
    return np.asarray(getattr(grid, name))


def _z(grid):
    return np.asarray(grid.z), np.asarray(grid.zz), \
        np.asarray(grid.dz), np.asarray(grid.dzz)


@pytest.mark.parametrize("mode", [2, 3])
def test_advave(setup, mode):
    cfg, grid, rand3, rand2 = setup
    cfg = cfg.replace(mode=mode)
    d = g(grid, "h") + rand2(0.5)
    ua, va = rand2(0.3), rand2(0.3)
    uab, vab = rand2(0.3), rand2(0.3)
    aam2d = rand2(100.0, 10.0)
    wub, wvb = rand2(1e-4), rand2(1e-4)
    got = advection2d.advave(grid, cfg, d, ua, va, uab, vab, aam2d, wub, wvb)
    want = pom_ref.advave_ref(d, ua, va, uab, vab, aam2d, wub, wvb,
                              g(grid, "cbc"), g(grid, "dx"), g(grid, "dy"),
                              g(grid, "aru"), g(grid, "arv"), mode)
    for name, a, b in zip(("advua", "advva", "wubot", "wvbot"), got, want):
        np.testing.assert_allclose(np.asarray(a)[1:-1, 1:-1],
                                   b[1:-1, 1:-1], atol=1e-8, err_msg=name)


def test_advct(setup):
    cfg, grid, rand3, rand2 = setup
    u, v = rand3(0.3), rand3(0.3)
    ub, vb = rand3(0.3), rand3(0.3)
    aam = rand3(100.0, 10.0)
    dt2 = g(grid, "h") + rand2(0.5)
    got_x, got_y = momentum.advct(grid, cfg, u, v, ub, vb, aam, dt2)
    want_x, want_y = pom_ref.advct_ref(u, v, ub, vb, aam, dt2,
                                       g(grid, "dx"), g(grid, "dy"),
                                       g(grid, "aru"), g(grid, "arv"),
                                       cfg.kbm1)
    np.testing.assert_allclose(np.asarray(got_x)[:cfg.kbm1, 1:-1, 1:-1],
                               want_x[:cfg.kbm1, 1:-1, 1:-1], atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_y)[:cfg.kbm1, 1:-1, 1:-1],
                               want_y[:cfg.kbm1, 1:-1, 1:-1], atol=1e-7)


def test_advq(setup):
    cfg, grid, rand3, rand2 = setup
    qb, q = rand3(1e-4, 1e-6), rand3(1e-4, 1e-6)
    u, v, w = rand3(0.3), rand3(0.3), rand3(0.01)
    aam = rand3(100.0, 10.0)
    dt2 = g(grid, "h") + rand2(0.5)
    etb, etf = rand2(0.1), rand2(0.1)
    got = tracers.advq(grid, cfg, qb, q, u, v, w, aam, dt2, etb, etf)
    want = pom_ref.advq_ref(qb, q, u, v, w, aam, dt2, etb, etf,
                            g(grid, "h"), g(grid, "dum"), g(grid, "dvm"),
                            g(grid, "dx"), g(grid, "dy"), g(grid, "art"),
                            np.asarray(grid.dz), cfg.dti2, cfg.kbm1)
    np.testing.assert_allclose(np.asarray(got)[1:cfg.kbm1, 1:-1, 1:-1],
                               want[1:cfg.kbm1, 1:-1, 1:-1], atol=1e-12)


def test_advu_advv_full_including_edge_scratch(setup):
    """Full-array comparison: the reference's leftover vertical-advection
    values outside the combine region (solver.f:742-751 scratch semantics)
    feed corner stencils downstream and must be reproduced exactly."""
    cfg, grid, rand3, rand2 = setup
    u, ub = rand3(0.3), rand3(0.3)
    v, vb = rand3(0.3), rand3(0.3)
    w = rand3(0.01)
    advx, advy = rand3(10.0), rand3(10.0)
    drhox, drhoy = rand3(1.0), rand3(1.0)
    dt2 = g(grid, "h") + rand2(0.5)
    egf, egb = rand2(0.1), rand2(0.1)
    e_atmos = rand2(0.01)
    etb, etf = rand2(0.1), rand2(0.1)

    got_u = momentum.advu(grid, cfg, u, ub, v, w, advx, drhox, dt2,
                          egf, egb, e_atmos, etb, etf)
    want_u = pom_ref.advu_ref(u, ub, v, w, advx, drhox, dt2, egf, egb,
                              e_atmos, etb, etf, g(grid, "h"), g(grid, "dy"),
                              g(grid, "aru"), g(grid, "cor"),
                              np.asarray(grid.dz), cfg.grav, cfg.dti2,
                              cfg.kbm1)
    np.testing.assert_allclose(np.asarray(got_u), want_u, atol=1e-10)

    got_v = momentum.advv(grid, cfg, v, vb, u, w, advy, drhoy, dt2,
                          egf, egb, e_atmos, etb, etf)
    want_v = pom_ref.advv_ref(v, vb, u, w, advy, drhoy, dt2, egf, egb,
                              e_atmos, etb, etf, g(grid, "h"), g(grid, "dx"),
                              g(grid, "arv"), g(grid, "cor"),
                              np.asarray(grid.dz), cfg.grav, cfg.dti2,
                              cfg.kbm1)
    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=1e-10)


def test_advt2_mpdata(setup):
    cfg, grid, rand3, rand2 = setup
    fb = rand3(10.0, 5.0)
    f = fb + rand3(0.5)
    fclim = rand3(10.0, 5.0)
    u, v, w = rand3(0.3), rand3(0.3), rand3(0.01)
    aam = rand3(100.0, 10.0)
    dt2 = g(grid, "h") + rand2(0.5)
    etb, etf = rand2(0.1), rand2(0.1)
    got = tracers.advt2(grid, cfg, fb, f, fclim, u, v, w, aam, dt2, etb, etf)
    zz_, z_, dz_, dzz_ = None, None, np.asarray(grid.dz), np.asarray(grid.dzz)
    want = pom_ref.advt2_ref(fb, f, fclim, u, v, w, aam, dt2, etb, etf,
                             g(grid, "h"), g(grid, "dum"), g(grid, "dvm"),
                             g(grid, "fsm"), g(grid, "dx"), g(grid, "dy"),
                             g(grid, "art"), g(grid, "aru"), g(grid, "arv"),
                             dz_, dzz_, cfg.dti2, cfg.tprni, cfg.sw,
                             cfg.nitera, cfg.kbm1)
    np.testing.assert_allclose(np.asarray(got)[:cfg.kbm1, 1:-1, 1:-1],
                               want[:cfg.kbm1, 1:-1, 1:-1], atol=1e-10)


def test_advt2_value_min_cutoff(setup):
    """Fields crossing the MPDATA value_min threshold exercise the
    antidiffusion zeroing branches (solver.f:1906-1918)."""
    cfg, grid, rand3, rand2 = setup
    rng = np.random.default_rng(3)
    fb = np.where(rng.random((KB, IM, JM)) < 0.3, 0.0,
                  rng.random((KB, IM, JM)))
    f = fb.copy()
    fclim = np.zeros_like(fb)
    u, v, w = rand3(0.3), rand3(0.3), rand3(0.01)
    aam = rand3(100.0, 10.0)
    dt2 = g(grid, "h") + rand2(0.5)
    etb, etf = rand2(0.1), rand2(0.1)
    got = tracers.advt2(grid, cfg, fb, f, fclim, u, v, w, aam, dt2, etb, etf)
    want = pom_ref.advt2_ref(fb, f, fclim, u, v, w, aam, dt2, etb, etf,
                             g(grid, "h"), g(grid, "dum"), g(grid, "dvm"),
                             g(grid, "fsm"), g(grid, "dx"), g(grid, "dy"),
                             g(grid, "art"), g(grid, "aru"), g(grid, "arv"),
                             np.asarray(grid.dz), np.asarray(grid.dzz),
                             cfg.dti2, cfg.tprni, cfg.sw, cfg.nitera,
                             cfg.kbm1)
    np.testing.assert_allclose(np.asarray(got)[:cfg.kbm1, 1:-1, 1:-1],
                               want[:cfg.kbm1, 1:-1, 1:-1], atol=1e-10)


def test_baropg_mcc(setup):
    cfg, grid, rand3, rand2 = setup
    rho = rand3(0.02)
    rmean = rand3(0.02)
    el = rand2(0.5)
    d = g(grid, "h") + el
    dt2 = g(grid, "h") + rand2(0.5)
    got_x, got_y = pressure.baropg_mcc(grid, cfg, rho, rmean, d, dt2, 0.7)
    want_x, want_y = pom_ref.baropg_mcc_ref(
        rho, rmean, d, dt2, g(grid, "dum"), g(grid, "dvm"),
        g(grid, "dx"), g(grid, "dy"), np.asarray(grid.zz),
        np.asarray(grid.dzz), cfg.grav, 0.7, cfg.kbm1)
    np.testing.assert_allclose(np.asarray(got_x)[:cfg.kbm1, 1:-1, 1:-1],
                               want_x[:cfg.kbm1, 1:-1, 1:-1], atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_y)[:cfg.kbm1, 1:-1, 1:-1],
                               want_y[:cfg.kbm1, 1:-1, 1:-1], atol=1e-8)


def test_profv(setup):
    cfg, grid, rand3, rand2 = setup
    vf = rand3(0.1)
    ub, vb = rand3(0.2), rand3(0.2)
    km = rand3(0.01, 1e-5)
    etf = rand2(0.1)
    wvsurf = rand2(1e-4)
    got_vf, got_wvbot = vertical.profv(grid, cfg, vf, ub, vb, km, etf,
                                       wvsurf)
    want_vf, want_wvbot = pom_ref.profv_ref(
        vf, ub, vb, km, etf, wvsurf, g(grid, "h"), g(grid, "cbc"),
        g(grid, "dvm"), np.asarray(grid.dz), np.asarray(grid.dzz),
        cfg.dti2, cfg.umol, cfg.kb)
    np.testing.assert_allclose(np.asarray(got_vf)[:cfg.kbm1, 1:-1, 1:-1],
                               want_vf[:cfg.kbm1, 1:-1, 1:-1], atol=1e-10)
    np.testing.assert_allclose(np.asarray(got_wvbot)[1:-1, 1:-1],
                               want_wvbot[1:-1, 1:-1], atol=1e-10)


def test_realvertvl(setup):
    cfg, grid, rand3, rand2 = setup
    w = rand3(0.01)
    u, v = rand3(0.3), rand3(0.3)
    et = rand2(0.1)
    dt2 = g(grid, "h") + et
    etf, etb = rand2(0.1), rand2(0.1)
    got = continuity.realvertvl(grid, cfg, w, u, v, dt2, et, etf, etb)
    want = pom_ref.realvertvl_ref(w, u, v, dt2, et, etf, etb,
                                  g(grid, "dx"), g(grid, "dy"),
                                  np.asarray(grid.zz), g(grid, "fsm"),
                                  cfg.dti2, cfg.kbm1)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_profq(setup):
    """MY-2.5 closure vs the loop oracle — every output, full arrays
    (solver.f:1212-1538: the hardest kernel, ~20 constants, three index
    regimes; VERDICT r1 missing item 4)."""
    cfg, grid, rand3, rand2 = setup
    q2f = rand3(1e-4, 1e-6)       # advq output
    q2lf = rand3(1e-5, 1e-7)
    q2 = rand3(1e-4, 1e-6)
    q2b = rand3(1e-4, 1e-6)
    q2lb = rand3(1e-5, 1e-7)
    u, v = rand3(0.3), rand3(0.3)
    t = rand3(15.0)
    s = rand3(3.0, 33.0)
    rho = rand3(0.02)
    km = rand3(0.01, 1e-5)
    kh = rand3(0.01, 1e-5)
    kq = rand3(0.01, 1e-5)
    l = rand3(1.0, 0.1)
    etf = rand2(0.1)
    wusurf, wvsurf = rand2(1e-4), rand2(1e-4)
    wubot, wvbot = rand2(1e-5), rand2(1e-5)

    got = vertical.profq(grid, cfg, q2f, q2lf, q2, q2b, q2lb, u, v, t, s,
                         rho, km, kh, kq, l, etf, wusurf, wvsurf,
                         wubot, wvbot)
    want = pom_ref.profq_ref(q2f, q2lf, q2, q2b, q2lb, u, v, t, s, rho,
                             km, kh, kq, l, etf, wusurf, wvsurf,
                             wubot, wvbot, g(grid, "h"), g(grid, "fsm"),
                             np.asarray(grid.z), np.asarray(grid.zz),
                             np.asarray(grid.dz), np.asarray(grid.dzz),
                             cfg.dti2, cfg.umol, cfg.grav, cfg.kappa,
                             cfg.tbias, cfg.sbias, cfg.rhoref, cfg.small,
                             cfg.kb)
    names = ("q2f", "q2lf", "km", "kh", "kq", "l", "q2b", "q2lb")
    for name, a, b in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-10,
                                   err_msg=name)


def test_bcondorl_ts(setup):
    """bcondorl idx=4 (Orlanski T/S, bounds_forcing.f:489-548) vs the
    loop oracle, including the cl==0 inflow clamp to the boundary
    profile.  The implementation's documented deviation (zero-gradient
    north/south edges + fsm mask ordering, bc/orlanski.py) is applied to
    the oracle's output before comparing."""
    import jax.numpy as jnp
    from types import SimpleNamespace
    from extpom_tpu.bc import orlanski as bco

    cfg, grid, rand3, rand2 = setup
    t, tb = rand3(2.0, 10.0), rand3(2.0, 10.0)
    s, sb = rand3(1.0, 34.0), rand3(1.0, 34.0)
    uf, vf = rand3(2.0, 10.0), rand3(1.0, 34.0)
    # mix signs + exact zeros so both the cl-clamp and inflow branches fire
    ub = rand3(0.4, -0.2)
    ub[:, :, ::3] = 0.0
    tbe = 10.0 + 2.0 * np.random.default_rng(3).random((KB, JM))
    tbw = 10.0 + 2.0 * np.random.default_rng(4).random((KB, JM))
    sbe = 34.0 + np.random.default_rng(5).random((KB, JM))
    sbw = 34.0 + np.random.default_rng(6).random((KB, JM))

    ref_uf, ref_vf = pom_ref.bcondorl_ts_ref(
        uf, vf, t, tb, s, sb, ub, tbe, tbw, sbe, sbw,
        g(grid, "fsm"), cfg.kbm1)
    # apply the implementation's documented N/S zero-gradient deviation
    # (pre-mask values equal the masked ones here since fsm == 1)
    for a in (ref_uf, ref_vf):
        a[:, :, 0] = a[:, :, 1]
        a[:, :, -1] = a[:, :, -2]

    fc = SimpleNamespace(tbe=jnp.asarray(tbe), tbw=jnp.asarray(tbw),
                         sbe=jnp.asarray(sbe), sbw=jnp.asarray(sbw))
    got_uf, got_vf = bco.orl_ts(grid, cfg, jnp.asarray(uf),
                                jnp.asarray(vf), jnp.asarray(t),
                                jnp.asarray(tb), jnp.asarray(s),
                                jnp.asarray(sb), jnp.asarray(ub), fc)
    np.testing.assert_allclose(np.asarray(got_uf)[:cfg.kbm1],
                               ref_uf[:cfg.kbm1], rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(got_vf)[:cfg.kbm1],
                               ref_vf[:cfg.kbm1], rtol=0, atol=1e-13)
