"""Model state and forcing pytrees.

:class:`State` replaces the mutable COMMON-block "god state" of pom.h
(pom.h_dist:216-450).  It carries exactly the prognostic information the
reference persists in its restart file (io_pnetcdf.F:1674-1678) plus the few
derived accumulators the step needs across calls; everything else
(d = h + el, dt = h + et, egf, advx/advy, ...) is recomputed inside the step.

:class:`Forcing` carries the per-step surface/lateral boundary values that
the reference refreshes from files inside the time loop
(bounds_forcing.f:593-1020).  Host-side providers (``extpom_tpu.forcing``)
produce one time-interpolated :class:`Forcing` per internal step so that the
jitted step function stays pure.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class State:
    """Prognostic model state at internal time level n (with n-1 history)."""

    # ---- 2-D fields (im, jm) ----
    el: jnp.ndarray    # surface elevation, external mode, time n
    elb: jnp.ndarray   # ... time n-1
    et: jnp.ndarray    # surface elevation, internal mode, time n
    etb: jnp.ndarray   # ... time n-1
    etf: jnp.ndarray   # ... time n+1 (external-mode average)
    ua: jnp.ndarray    # depth-mean u, time n
    uab: jnp.ndarray   # ... time n-1
    va: jnp.ndarray
    vab: jnp.ndarray
    utb: jnp.ndarray   # dti-averaged ua flux, time n-1
    vtb: jnp.ndarray
    egb: jnp.ndarray   # elevation for internal pressure gradient, time n-1
    adx2d: jnp.ndarray  # vertical integral of advx minus advua
    ady2d: jnp.ndarray
    advua: jnp.ndarray  # external-mode advection+diffusion terms
    advva: jnp.ndarray
    aam2d: jnp.ndarray  # vertical average of aam
    drx2d: jnp.ndarray  # vertical integral of drhox
    dry2d: jnp.ndarray
    wubot: jnp.ndarray  # bottom momentum flux
    wvbot: jnp.ndarray
    vfluxb: jnp.ndarray  # surface volume flux, time n-1
    vfluxf: jnp.ndarray  # ... time n+1

    # ---- 3-D fields (kb, im, jm) ----
    u: jnp.ndarray
    ub: jnp.ndarray
    v: jnp.ndarray
    vb: jnp.ndarray
    w: jnp.ndarray      # sigma-coordinate vertical velocity
    t: jnp.ndarray      # potential temperature (minus tbias)
    tb: jnp.ndarray
    s: jnp.ndarray      # salinity (minus sbias)
    sb: jnp.ndarray
    rho: jnp.ndarray    # (density-1000)/rhoref
    q2: jnp.ndarray     # 2 x TKE
    q2b: jnp.ndarray
    q2l: jnp.ndarray    # q2 * mixing length
    q2lb: jnp.ndarray
    km: jnp.ndarray     # vertical kinematic viscosity
    kh: jnp.ndarray     # vertical diffusivity
    kq: jnp.ndarray     # TKE vertical diffusivity
    l: jnp.ndarray      # turbulence length scale
    aam: jnp.ndarray    # horizontal kinematic viscosity

    @property
    def dtype(self):
        return self.el.dtype

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)

    @staticmethod
    def field_names() -> tuple:
        return tuple(f.name for f in dataclasses.fields(State))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Forcing:
    """Per-step boundary and surface forcing (already time-interpolated)."""

    # surface fluxes (im, jm); sign conventions follow the reference
    wusurf: jnp.ndarray   # <wu(0)> kinematic x-momentum flux (= -tau_x/rho)
    wvsurf: jnp.ndarray
    wtsurf: jnp.ndarray   # temperature flux (negative = warming)
    wssurf: jnp.ndarray   # salinity flux
    swrad: jnp.ndarray    # shortwave radiation (negative into ocean)
    vflux: jnp.ndarray    # surface volume flux (fresh water), -> vfluxf
    e_atmos: jnp.ndarray  # atmospheric pressure (as equivalent elevation)
    tsurf: jnp.ndarray    # prescribed SST (for nbct in (3, 4))
    ssurf: jnp.ndarray    # prescribed SSS (for nbcs == 3)

    # lateral open-boundary values: elevation (1-D per side)
    elw: jnp.ndarray  # (jm,)
    ele: jnp.ndarray  # (jm,)
    els: jnp.ndarray  # (im,)
    eln: jnp.ndarray  # (im,)
    # depth-mean boundary velocities
    uabw: jnp.ndarray  # (jm,)
    uabe: jnp.ndarray  # (jm,)
    vabs: jnp.ndarray  # (im,)
    vabn: jnp.ndarray  # (im,)
    uabs: jnp.ndarray  # (im,)  tangential
    uabn: jnp.ndarray  # (im,)
    vabw: jnp.ndarray  # (jm,)
    vabe: jnp.ndarray  # (jm,)
    # 3-D boundary profiles (kb, side-length)
    tbw: jnp.ndarray  # (kb, jm)
    tbe: jnp.ndarray
    sbw: jnp.ndarray
    sbe: jnp.ndarray
    tbs: jnp.ndarray  # (kb, im)
    tbn: jnp.ndarray
    sbs: jnp.ndarray
    sbn: jnp.ndarray
    ubw: jnp.ndarray  # (kb, jm)
    ube: jnp.ndarray
    vbw: jnp.ndarray
    vbe: jnp.ndarray
    vbs: jnp.ndarray  # (kb, im)
    vbn: jnp.ndarray
    ubs: jnp.ndarray
    ubn: jnp.ndarray

    # interior restoring (kb, im, jm); zeros when cfg.do_restore is False
    trstr: jnp.ndarray
    srstr: jnp.ndarray
    taurstr: jnp.ndarray

    # scalar (traced): inertial ramp factor
    ramp: jnp.ndarray

    def replace(self, **kw) -> "Forcing":
        return dataclasses.replace(self, **kw)


def zero_forcing(grid: Grid, cfg: Config,
                 with_restore: bool = False) -> Forcing:
    dt_ = cfg.jnp_dtype
    im, jm, kb = cfg.im, cfg.jm, cfg.kb
    z2 = lambda: jnp.zeros((im, jm), dt_)
    zw = lambda: jnp.zeros((jm,), dt_)
    zs = lambda: jnp.zeros((im,), dt_)
    zwk = lambda: jnp.zeros((kb, jm), dt_)
    zsk = lambda: jnp.zeros((kb, im), dt_)
    # restoring fields are kept minimal-size when unused (broadcastable)
    r3 = (jnp.zeros((kb, im, jm), dt_) if with_restore
          else jnp.zeros((kb, 1, 1), dt_))
    return Forcing(
        wusurf=z2(), wvsurf=z2(), wtsurf=z2(), wssurf=z2(), swrad=z2(),
        vflux=z2(), e_atmos=z2(), tsurf=z2(), ssurf=z2(),
        elw=zw(), ele=zw(), els=zs(), eln=zs(),
        uabw=zw(), uabe=zw(), vabs=zs(), vabn=zs(),
        uabs=zs(), uabn=zs(), vabw=zw(), vabe=zw(),
        tbw=zwk(), tbe=zwk(), sbw=zwk(), sbe=zwk(),
        tbs=zsk(), tbn=zsk(), sbs=zsk(), sbn=zsk(),
        ubw=zwk(), ube=zwk(), vbw=zwk(), vbe=zwk(),
        vbs=zsk(), vbn=zsk(), ubs=zsk(), ubn=zsk(),
        trstr=r3, srstr=r3, taurstr=r3,
        ramp=jnp.asarray(1.0, dt_),
    )


def zero_state(grid: Grid, cfg: Config) -> State:
    dt_ = cfg.jnp_dtype
    im, jm, kb = cfg.im, cfg.jm, cfg.kb
    z2 = lambda: jnp.zeros((im, jm), dt_)
    z3 = lambda: jnp.zeros((kb, im, jm), dt_)
    fields = {}
    for f in dataclasses.fields(State):
        fields[f.name] = z2() if f.name in _FIELDS_2D else z3()
    return State(**fields)


_FIELDS_2D = frozenset({
    "el", "elb", "et", "etb", "etf", "ua", "uab", "va", "vab",
    "utb", "vtb", "egb", "adx2d", "ady2d", "advua", "advva", "aam2d",
    "drx2d", "dry2d", "wubot", "wvbot", "vfluxb", "vfluxf",
})

FIELDS_2D = _FIELDS_2D
FIELDS_3D = frozenset(State.field_names()) - _FIELDS_2D
