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
    from extpom_tpu.pallas.extwin import chunk_geometry
    from extpom_tpu.core.config import Config
    C, H, Bi = chunk_geometry(Config(im=1024, jm=1024, kb=31, isplit=30,
                                     extwin_chunk=10))
    assert C == 10 and 30 % C == 0
    assert H % 8 == 0 and H >= C * 3
    assert Bi % 8 == 0 and Bi >= 8
