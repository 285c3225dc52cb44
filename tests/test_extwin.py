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


def test_mesh_windowed_chunk_plan():
    """chunk_plan (mesh/extchunk.py) must select the striped window body
    at local blocks too large for the VMEM chunk kernel — the round-5
    closure of the external mode at the config-5 geometry — with
    sublane-aligned ring-extended extents, and keep the VMEM body where
    it fits."""
    from extpom_tpu.core import hw
    from extpom_tpu.core.config import Config
    from extpom_tpu.mesh.extchunk import chunk_plan
    from extpom_tpu.ops.stencil import DomainCtx

    with hw.assume_tpu():
        # config-5 blessed decomposition: 2x4 over 2048^2x41
        cfg = Config(im=2048, jm=2048, kb=41)
        ctx = DomainCtx(im=2048, jm=2048, axis_x="x", axis_y="y",
                        px=2, py=4)
        C, Hx, Hy, R, L, use_pal, use_win = chunk_plan(
            cfg, ctx, 1024, 512)
        assert use_win and not use_pal
        assert R % 8 == 0 and L % 128 == 0, (R, L)
        assert Hx >= C * cfg.ext_halo_sub and Hy >= C * cfg.ext_halo_sub
        assert cfg.isplit % C == 0

        # 1x1 shardmap at the same tile: ring-free, window body, and the
        # traffic optimum must NOT degenerate to one isplit-long chunk
        # (H would triple and amplification quadruple)
        ctx1 = DomainCtx(im=1024, jm=512, axis_x="x", axis_y="y",
                        px=1, py=1)
        C1, hx1, hy1, R1, L1, p1, w1 = chunk_plan(
            Config(im=1024, jm=512, kb=41), ctx1, 1024, 512)
        assert w1 and not p1
        assert (hx1, hy1) == (0, 0) and (R1, L1) == (1024, 512)
        assert C1 < 30

        # small local blocks keep the VMEM whole-block body
        cfg4 = Config(im=512, jm=512, kb=31)
        ctx4 = DomainCtx(im=512, jm=512, axis_x="x", axis_y="y",
                         px=2, py=2)
        *_, p4, w4 = chunk_plan(cfg4, ctx4, 256, 256)
        assert p4 and not w4
