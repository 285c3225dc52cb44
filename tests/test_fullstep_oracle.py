"""Full internal-mode oracle (VERDICT r1 item 4): given identical inputs
(state, external-mode carry, lateral terms, forcing), the NumPy
composition of per-kernel oracles + the reference's glue
(pom_ref.mode_internal_ref, advance.f:356-537) must reproduce
stepper.mode_internal for the active bc scheme."""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "reference"))
import pom_ref  # noqa: E402

from extpom_tpu.cases.seamount import seamount_model
from extpom_tpu.core import stepper


def test_mode_internal_matches_oracle():
    m = seamount_model(im=20, jm=18, kb=8, dtype="float64", donate=False)
    for _ in range(3):           # develop a non-trivial flow first
        m.step_once()
    st, grid, cfg = m.state, m.grid, m.cfg
    fc = m.forcing_at(m.iint + 1)

    # prologue + external loop exactly as step() runs them
    aam, advx, advy, drhox, drhoy = stepper.lateral_terms(
        grid, cfg, st, fc, m.rmean)
    (adx2d, ady2d, drx2d, dry2d, aam2d, advua, advva, wubot, wvbot,
     egf, utf, vtf) = stepper.mode_interaction(grid, cfg, st, aam, advx,
                                               advy, drhox, drhoy)
    c = stepper.ExtCarry(el=st.el, elb=st.elb, ua=st.ua, uab=st.uab,
                         va=st.va, vab=st.vab, etf=st.etf, egf=egf,
                         utf=utf, vtf=vtf, advua=advua, advva=advva,
                         wubot=wubot, wvbot=wvbot)
    aux = (adx2d, ady2d, drx2d, dry2d, aam2d)
    for i in range(1, cfg.isplit + 1):
        c = stepper.mode_external_substep(grid, cfg, c, jnp.int32(i), fc,
                                          aux)

    got = stepper.mode_internal(grid, cfg, st, fc, c, aam, advx, advy,
                                drhox, drhoy, m.rmean, m.tclim, m.sclim,
                                first=False)

    A = lambda x: np.asarray(x)
    st_d = {n: A(getattr(st, n)) for n in
            ("u", "ub", "v", "vb", "w", "t", "tb", "s", "sb", "rho",
             "q2", "q2b", "q2l", "q2lb", "km", "kh", "kq", "l",
             "et", "etb", "utb", "vtb", "egb", "vfluxb")}
    st_d["tclim"] = A(m.tclim)
    st_d["sclim"] = A(m.sclim)
    carry_d = {n: A(getattr(c, n)) for n in
               ("etf", "egf", "utf", "vtf", "wubot", "wvbot")}
    aux_d = dict(aam=A(aam), advx=A(advx), advy=A(advy),
                 drhox=A(drhox), drhoy=A(drhoy))
    fc_d = {n: A(getattr(fc, n)) for n in
            ("vflux", "wusurf", "wvsurf", "wtsurf", "wssurf", "swrad",
             "tsurf", "ssurf", "e_atmos", "tbe", "tbw", "tbs", "tbn",
             "sbe", "sbw", "sbs", "sbn")}
    g_d = {n: A(getattr(grid, n)) for n in
           ("h", "dx", "dy", "art", "aru", "arv", "cor", "cbc",
            "dum", "dvm", "fsm", "z", "zz", "dz", "dzz")}

    want = pom_ref.mode_internal_ref(st_d, carry_d, aux_d, fc_d, g_d, cfg)

    for name in ("u", "ub", "v", "vb", "w", "t", "tb", "s", "sb", "rho",
                 "q2", "q2b", "q2l", "q2lb", "km", "kh", "kq", "l",
                 "wubot", "wvbot", "etb", "et", "utb", "vtb"):
        a = A(getattr(got, name))
        b = want[name]
        tol = 1e-10 * max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=tol, err_msg=name)


def test_mode_external_loop_matches_oracle():
    """All isplit external substeps vs the loop oracle
    (pom_ref.mode_external_substep_ref, advance.f:205-353) including the
    etf tail averaging and the accumulator skip on the last substep."""
    m = seamount_model(im=20, jm=18, kb=8, dtype="float64", donate=False,
                       bc_scheme="file", isplit=10)
    for _ in range(3):
        m.step_once()
    st, grid, cfg = m.state, m.grid, m.cfg
    fc = m.forcing_at(m.iint + 1)

    aam, advx, advy, drhox, drhoy = stepper.lateral_terms(
        grid, cfg, st, fc, m.rmean)
    (adx2d, ady2d, drx2d, dry2d, aam2d, advua, advva, wubot, wvbot,
     egf, utf, vtf) = stepper.mode_interaction(grid, cfg, st, aam, advx,
                                               advy, drhox, drhoy)
    c = stepper.ExtCarry(el=st.el, elb=st.elb, ua=st.ua, uab=st.uab,
                         va=st.va, vab=st.vab, etf=st.etf, egf=egf,
                         utf=utf, vtf=vtf, advua=advua, advva=advva,
                         wubot=wubot, wvbot=wvbot)
    aux = (adx2d, ady2d, drx2d, dry2d, aam2d)

    A = lambda x: np.asarray(x)
    c_ref = {n: A(getattr(c, n)) for n in c._fields}
    aux_ref = dict(adx2d=A(adx2d), ady2d=A(ady2d), drx2d=A(drx2d),
                   dry2d=A(dry2d), aam2d=A(aam2d))
    fc_ref = {n: A(getattr(fc, n)) for n in
              ("vflux", "e_atmos", "wusurf", "wvsurf", "elw", "ele",
               "els", "eln", "uabw", "uabe", "vabw", "vabe", "uabs",
               "uabn", "vabs", "vabn")}
    fc_ref["ramp"] = float(fc.ramp)
    g_ref = {n: A(getattr(grid, n)) for n in
             ("h", "dx", "dy", "art", "aru", "arv", "cor", "cbc",
              "fsm", "dum", "dvm")}

    for iext in range(1, cfg.isplit + 1):
        c = stepper.mode_external_substep(grid, cfg, c, jnp.int32(iext),
                                          fc, aux)
        c_ref = pom_ref.mode_external_substep_ref(c_ref, aux_ref, fc_ref,
                                                  g_ref, cfg, iext)

    for name in c._fields:
        a = A(getattr(c, name))
        b = c_ref[name]
        tol = 1e-10 * max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=tol,
                                   err_msg=f"{name}")
