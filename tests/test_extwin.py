"""Halo-window external-loop oracle: pallas/extwin.py must reproduce the
XLA fori_loop path (same substep source) across chunked window passes."""

import jax
import numpy as np
import pytest

from extpom_tpu.cases.seamount import seamount_model
from extpom_tpu.core import stepper

FIELDS = ("el", "elb", "ua", "uab", "va", "vab", "etf",
          "utb", "vtb", "egb", "u", "v", "t", "s")


def _run(extwin: str, n: int = 2, **kw):
    m = seamount_model(im=64, jm=48, kb=7, donate=False, dtype="float64",
                      isplit=6, pallas_ext="off", pallas_phases="off",
                      pallas_extwin=extwin, extwin_chunk=3, **kw)
    fc = m.forcing_at(1)

    @jax.jit
    def go(st):
        st = stepper.step(m.grid, m.cfg, st, fc, m.rmean, m.tclim, m.sclim,
                          first=True)
        for _ in range(n - 1):
            st = stepper.step(m.grid, m.cfg, st, fc, m.rmean, m.tclim,
                              m.sclim, first=False)
        return st

    return go(m.state)


@pytest.mark.parametrize("kw", [dict(), dict(bc_scheme="orlanski"),
                                dict(ispadv=2)])
def test_extwin_matches_xla(kw):
    ref = _run("off", **kw)
    got = _run("on", **kw)    # interpreted off-TPU
    for name in FIELDS:
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-12, err_msg=name)


def test_extwin_geometry():
    from extpom_tpu.pallas.extwin import chunk_geometry, _N_WIN, _N_OUT
    from extpom_tpu.core.config import Config
    C, H, Bi, ok = chunk_geometry(Config(im=1024, jm=1024, kb=31, isplit=30,
                                         extwin_chunk=10))
    assert ok and 30 % C == 0
    assert H % 8 == 0 and H >= C * 3
    assert Bi % 8 == 0 and Bi >= 8
    assert Bi + 2 * H <= 1024

    # the chosen C must minimize the modeled total HBM traffic over all
    # divisors of isplit (the round-3 walk-down accepted a 2x read
    # amplification at 2048^2 that a smaller C beats)
    for im in (1024, 2048, 4096):
        cfg = Config(im=im, jm=im, kb=31, isplit=30, extwin_chunk=10)
        C, H, Bi, ok = chunk_geometry(cfg)
        assert ok

        def traffic(c):
            h = -(-(c * cfg.ext_halo_sub) // 8) * 8
            w_max = cfg.extwin_budget_mb * 2 ** 20 // (110 * 4 * cfg.jm)
            bi = min((w_max - 2 * h) // 8 * 8, cfg.im // 8 * 8 - 2 * h)
            if bi < 8:
                return float("inf")
            return (30 // c) * (_N_WIN * (bi + 2 * h) / bi + _N_OUT)

        best = min((traffic(c) for c in (1, 2, 3, 5, 6, 10)))
        assert traffic(C) == best, (im, C)
