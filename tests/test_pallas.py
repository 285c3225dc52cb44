"""Pallas kernel oracles: the VMEM-resident external-mode loop must
reproduce the XLA fori_loop path (same substep source, pallas/extloop.py)."""

import dataclasses

import jax
import numpy as np
import pytest

from extpom_tpu.cases.seamount import seamount_model
from extpom_tpu.core import stepper


def _run(pallas_ext: str, n: int = 2, **kw):
    # small isplit: the interpreted kernel unrolls all substeps
    m = seamount_model(im=32, jm=48, kb=7, donate=False, dtype="float64",
                       isplit=6, pallas_ext=pallas_ext, **kw)
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


def test_extloop_matches_xla():
    ref = _run("off")
    got = _run("on")    # interpreted off-TPU
    for name in ("el", "elb", "ua", "uab", "va", "vab", "etf",
                 "utb", "vtb", "egb", "u", "v", "t", "s"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-12, err_msg=name)


def test_extloop_ispadv2_matches_xla():
    """ispadv=2 routes advave through lax.cond inside the rolled kernel
    loop — the branch-scope path the mask cache must NOT serve across
    (stencil.mask_cache_pause; regression for the round-4 leak)."""
    ref = _run("off", ispadv=2)
    got = _run("on", ispadv=2)
    for name in ("el", "ua", "va", "u", "t"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-12, err_msg=name)


def test_fits_vmem_gate():
    from extpom_tpu.pallas.extloop import fits_vmem
    from extpom_tpu.core.config import Config
    v5e = 40 * 2 ** 20    # v5e+ budget (device_vmem_budget on those chips)
    old = 11 * 2 ** 20    # conservative budget for v2-v4 / unknown devices
    assert fits_vmem(Config(im=256, jm=256, kb=31), budget_bytes=v5e)
    assert fits_vmem(Config(im=512, jm=512, kb=31), budget_bytes=v5e)
    assert not fits_vmem(Config(im=1024, jm=1024, kb=31), budget_bytes=v5e)
    assert not fits_vmem(Config(im=512, jm=512, kb=31, dtype="float64"),
                         budget_bytes=v5e)
    assert fits_vmem(Config(im=256, jm=256, kb=31), budget_bytes=old)
    assert not fits_vmem(Config(im=512, jm=512, kb=31), budget_bytes=old)
    # default budget derives from the attached device (CPU here -> old)
    assert not fits_vmem(Config(im=512, jm=512, kb=31))
