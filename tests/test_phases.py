"""Fused phase-kernel oracles: the halo-window Pallas internal-mode path
(pallas/phases.py) must reproduce the XLA phase path — same phase source
(core/stepper.py), so equality checks the windowing/halo machinery."""

import jax
import numpy as np
import pytest

from extpom_tpu.cases.seamount import seamount_model
from extpom_tpu.cases.channel import channel_model
from extpom_tpu.core import stepper

FIELDS = ("el", "elb", "ua", "uab", "va", "vab", "etf", "utb", "vtb",
          "egb", "u", "ub", "v", "vb", "w", "t", "tb", "s", "sb", "rho",
          "q2", "q2b", "q2l", "q2lb", "km", "kh", "kq", "l",
          "wubot", "wvbot")


def _run_seamount(phases: str, n: int = 3, **kw):
    m = seamount_model(im=32, jm=48, kb=7, donate=False, dtype="float64",
                       isplit=6, pallas_ext="off", pallas_phases=phases,
                       phase_block=8, phase_halo=8, **kw)
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


def _assert_state_close(got, ref, atol=1e-12):
    for name in FIELDS:
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=atol, err_msg=name)


@pytest.mark.parametrize("kw", [
    dict(),                       # extpom mix (bcond 1,2,4,6 + orl 3,5)
    dict(bc_scheme="orlanski"),
    dict(mode=4),                 # frozen T/S: tracer phase skipped
    dict(nadv=2, nitera=2),       # MPDATA tracer scheme inside the kernel
    dict(npg=2),                  # McCalpin 4th-order PG in the lat phase
])
def test_phases_match_xla_seamount(kw):
    # interpret-mode Pallas steps dominate suite time: only the default
    # variant runs the full n=3 matrix; the config variants cover their
    # branch at n=2 (first + one steady step — the same kernel coverage)
    n = 3 if not kw else 2
    ref = _run_seamount("off", n=n, **kw)
    got = _run_seamount("on", n=n, **kw)    # interpreted off-TPU
    _assert_state_close(got, ref)


def test_phases_match_xla_channel():
    """File-driven BCs (bcond idx 3/4 with boundary series, restoring) —
    exercises the i-side series windows and the restore branch."""
    def run(phases):
        m = channel_model(im=32, jm=24, kb=7,
                          dtype="float64", isplit=6, pallas_ext="off",
                          pallas_phases=phases, phase_block=8,
                          phase_halo=8, do_restore=True)
        fc = m.forcing_at(1)

        @jax.jit
        def go(st):
            st = stepper.step(m.grid, m.cfg, st, fc, m.rmean, m.tclim,
                              m.sclim, first=True)
            for _ in range(2):
                st = stepper.step(m.grid, m.cfg, st, fc, m.rmean,
                                  m.tclim, m.sclim, first=False)
            return st

        return go(m.state)

    ref = run("off")
    got = run("on")
    _assert_state_close(got, ref)


@pytest.mark.parametrize("in2", [True, False])
def test_phases_double_out_windows(in2):
    """Bi >= 24 keeps the 2-slot OUTPUT pipeline (the production 256^2
    configuration) — covered here in interpret mode with a stripe large
    enough for the plan to choose it, with and without the input
    prefetch slots (the in-single/out-double combination is otherwise
    never traced)."""
    from extpom_tpu.pallas.phases import PHASES, phase_plan

    def run(phases):
        m = seamount_model(im=48, jm=48, kb=7, donate=False,
                           dtype="float64", isplit=6, pallas_ext="off",
                           pallas_phases=phases, phase_block=24,
                           phase_halo=8, phase_double_buffer=in2)
        if phases == "on":
            for p in PHASES:
                assert phase_plan(m.cfg, p) == (24, in2, True), p
        fc = m.forcing_at(1)

        @jax.jit
        def go(st):
            st = stepper.step(m.grid, m.cfg, st, fc, m.rmean, m.tclim,
                              m.sclim, first=True)
            st = stepper.step(m.grid, m.cfg, st, fc, m.rmean, m.tclim,
                              m.sclim, first=False)
            return st

        return go(m.state)

    _assert_state_close(run("on"), run("off"))


def test_phase_geometry_model():
    """Per-phase VMEM sizing (round 5, VERDICT r4 #1): each phase's
    stripe is sized for ITS exact operand set, so the heavy TKE phase no
    longer drags the others down to its stripe (or off the fast path
    entirely).  Anchors: the TKE plan must stay within the round-4
    on-chip OOM boundaries (v5e, tools/phasetune.py: 256^2x31 Bi=32
    2-slot-out fits / Bi=40 2-slot-out OOMs; 512^2x31 Bi=16 1-slot-out
    fits / 2-slot OOMs), and — the round-5 headline — EVERY phase must
    dispatch at the config-5 blessed tile (2x4 mesh over 2048^2x41 ->
    local 1024x512x41, ring-extended to 1040x640) where round 4
    returned Bi=0 and silently fell back to the XLA path."""
    from extpom_tpu.core.config import Config
    from extpom_tpu.pallas.phases import (PHASES, feasible_phases,
                                          phase_plan, use_pallas_phases)

    c256 = Config(im=256, jm=256, kb=31)
    plan = phase_plan(c256, "tke")
    # within the anchored OOM boundary: 2-slot-out only below Bi=40
    assert plan.bi >= 32 and not (plan.bi >= 40 and plan.out2)
    c512 = Config(im=512, jm=512, kb=31)
    plan = phase_plan(c512, "tke")
    assert plan.bi >= 16 and not plan.out2
    # lighter phases earn strictly larger stripes (or full
    # double-buffering) than round 4's worst-phase Bi=16 at 512^2
    assert phase_plan(c512, "lat") >= (24, True, True)
    assert phase_plan(c512, "uvw").bi >= 32

    # config-5 blessed tile: all five phases dispatch (round-4 hole)
    cfg5 = Config(im=2048, jm=2048, kb=41)
    assert feasible_phases(cfg5, rows=1040, lanes=640) == list(PHASES)
    # ... and the scoped-demand filter (chip-calibrated kb-scaled
    # temporaries, _PHASE_T31) must keep the tke windows inside the
    # 120 MiB limit at the RING-EXTENDED 2x4 geometry: out2 at Bi=8
    # measured 129 MB scoped demand and OOMed the config-5 AOT compile
    # (round 5) — single-slot output is the fitting plan
    p5 = phase_plan(cfg5, "tke", rows=1040, lanes=640)
    assert p5.bi >= 8 and not p5.out2, p5
    # the chip-validated 1x1 tile plan survives the filter (117.95 MiB
    # measured at the 120 MiB limit)
    c5t = Config(im=1024, jm=512, kb=41)
    assert phase_plan(c5t, "tke", rows=1024, lanes=512) == (16, False,
                                                           False)
    # 1024^2x31 single-device: feasible now (round 4 refused)
    c1k = Config(im=1024, jm=1024, kb=31, pallas_phases="on")
    assert feasible_phases(c1k) == list(PHASES)
    assert use_pallas_phases(c1k)
    # beyond any stripe (2048^2x41 single-device global): the heavy
    # phases fall back individually; uvw still fits
    big = Config(im=2048, jm=2048, kb=41)
    assert phase_plan(big, "tke").bi < 8
    assert phase_plan(big, "uvw").bi >= 8


def test_phase_geometry_gate():
    from extpom_tpu.pallas.phases import use_pallas_phases
    from extpom_tpu.core.config import Config
    # im not a multiple of 8 -> no windowed dispatch even when forced
    assert not use_pallas_phases(Config(im=33, jm=33, kb=7,
                                        pallas_phases="on"))
    # too small for one window
    assert not use_pallas_phases(Config(im=16, jm=33, kb=7,
                                        pallas_phases="on",
                                        phase_block=8, phase_halo=8))
