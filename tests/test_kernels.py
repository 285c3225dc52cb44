"""Per-kernel unit tests against the independent NumPy oracle
(tests/reference/pom_ref.py) on randomized inputs."""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "reference"))
import pom_ref  # noqa: E402

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import make_grid, sigma_levels
from extpom_tpu.ops import density, pressure, continuity, vertical, tracers


IM, JM, KB = 14, 12, 8


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    cfg = Config(im=IM, jm=JM, kb=KB, dtype="float64", dte=6.0, isplit=10)
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


def test_dens(setup):
    cfg, grid, rand3, rand2 = setup
    t = rand3(15.0)
    s = rand3(3.0, 33.0) - cfg.sbias
    got = np.asarray(density.dens(grid, cfg, s, t))
    want = pom_ref.dens_ref(s, t, np.asarray(grid.zz), g(grid, "h"),
                            g(grid, "fsm"), cfg.tbias, cfg.sbias,
                            cfg.grav, cfg.rhoref)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_baropg(setup):
    cfg, grid, rand3, rand2 = setup
    rho = rand3(0.02)
    rmean = rand3(0.02)
    dt2 = g(grid, "h") + rand2(0.5)
    got_x, got_y = pressure.baropg(grid, cfg, rho, rmean, dt2, 0.7)
    want_x, want_y = pom_ref.baropg_ref(
        rho, rmean, dt2, g(grid, "dum"), g(grid, "dvm"),
        g(grid, "dx"), g(grid, "dy"), np.asarray(grid.zz),
        cfg.grav, 0.7, cfg.kbm1)
    np.testing.assert_allclose(np.asarray(got_x), want_x, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got_y), want_y, atol=1e-9)


def test_vertvl(setup):
    cfg, grid, rand3, rand2 = setup
    u = rand3(0.2)
    v = rand3(0.2)
    w0 = rand3(0.01)
    dt2 = g(grid, "h") + rand2(0.5)
    etf, etb = rand2(0.1), rand2(0.1)
    vfb, vff = rand2(1e-5), rand2(1e-5)
    got = continuity.vertvl(grid, cfg, w0, u, v, dt2, etf, etb, vfb, vff)
    want = pom_ref.vertvl_ref(w0, u, v, dt2, etf, etb, vfb, vff,
                              g(grid, "dx"), g(grid, "dy"),
                              np.asarray(grid.dz), cfg.dti2, cfg.kbm1)
    # interior only: boundary columns pass through in both
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


@pytest.mark.parametrize("nbc", [1, 2, 3, 4])
def test_proft(setup, nbc):
    cfg, grid, rand3, rand2 = setup
    f = rand3(10.0)
    kh = rand3(0.01, 1e-5)
    etf = rand2(0.1)
    wfsurf = rand2(1e-4)
    fsurf = rand2(10.0)
    swrad = rand2(-100.0)
    got = vertical.proft(grid, cfg, f, wfsurf, fsurf, nbc, kh, etf, swrad)
    want = pom_ref.proft_ref(f, wfsurf, fsurf, nbc, kh, etf, swrad,
                             g(grid, "h"), np.asarray(grid.z),
                             np.asarray(grid.dz), np.asarray(grid.dzz),
                             cfg.dti2, cfg.umol, cfg.ntp, cfg.kb)
    np.testing.assert_allclose(np.asarray(got)[:cfg.kbm1],
                               want[:cfg.kbm1], atol=1e-10)


def test_advt1(setup):
    cfg, grid, rand3, rand2 = setup
    fb = rand3(10.0)
    f = rand3(10.0)
    fclim = rand3(10.0)
    u = rand3(0.2)
    v = rand3(0.2)
    w = rand3(0.01)
    aam = rand3(50.0, 1.0)
    dt2 = g(grid, "h") + rand2(0.5)
    etb, etf = rand2(0.1), rand2(0.1)
    got = tracers.advt1(grid, cfg, fb, f, fclim, u, v, w, aam, dt2, etb, etf)
    want = pom_ref.advt1_ref(fb, f, fclim, u, v, w, aam, dt2, etb, etf,
                             g(grid, "h"), g(grid, "dum"), g(grid, "dvm"),
                             g(grid, "dx"), g(grid, "dy"), g(grid, "art"),
                             np.asarray(grid.dz), cfg.dti2, cfg.tprni,
                             cfg.kbm1)
    got = np.asarray(got)
    np.testing.assert_allclose(got[:cfg.kbm1, 1:-1, 1:-1],
                               want[:cfg.kbm1, 1:-1, 1:-1], atol=1e-10)


def test_profu(setup):
    cfg, grid, rand3, rand2 = setup
    uf = rand3(0.1)
    ub = rand3(0.2)
    vb = rand3(0.2)
    km = rand3(0.01, 1e-5)
    etf = rand2(0.1)
    wusurf = rand2(1e-4)
    got_uf, got_wubot = vertical.profu(grid, cfg, uf, ub, vb, km, etf,
                                       wusurf)
    want_uf, want_wubot = pom_ref.profu_ref(
        uf, ub, vb, km, etf, wusurf, g(grid, "h"), g(grid, "cbc"),
        g(grid, "dum"), np.asarray(grid.dz), np.asarray(grid.dzz),
        cfg.dti2, cfg.umol, cfg.kb)
    np.testing.assert_allclose(np.asarray(got_uf)[:cfg.kbm1, 1:-1, 1:-1],
                               want_uf[:cfg.kbm1, 1:-1, 1:-1], atol=1e-10)
    np.testing.assert_allclose(np.asarray(got_wubot)[1:-1, 1:-1],
                               want_wubot[1:-1, 1:-1], atol=1e-10)
