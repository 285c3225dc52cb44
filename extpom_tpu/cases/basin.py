"""Wind-driven basin case: closed rectangular basin on a beta plane.

The classic ocean-gyre problem (Stommel 1948 / Munk 1950): a zonal wind
stress with uniform negative curl over a closed basin spins up an
anticyclonic subtropical gyre whose return flow intensifies against the
WESTERN boundary — the beta effect.  This is the third built-in case
generator (with seamount and channel) and drives the provenance-
independent western-intensification test (tests/test_physics.py).

The wind enters through the surface momentum flux ``wusurf`` with the
reference's sign convention (wusurf = -tau_x / rho: advance.f:280 adds
``+ (wusurf - wubot) * aru`` into a tendency applied with an overall
minus; profu's surface BC matches, solver.f:1730-1737).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid, make_grid, sigma_levels


def basin_case(im: int = 51, jm: int = 51, kb: int = 5,
               length: float = 1.0e6,       # basin side [m]
               depth: float = 500.0,
               f0: float = 5.0e-5, beta: float = 2.0e-11,
               tau0: float = 0.1,           # wind-stress amplitude [N/m^2]
               tbias: float = 10.0, sbias: float = 35.0,
               **cfg_kw) -> Tuple[Config, Grid, dict, np.ndarray]:
    """Build (cfg, grid, ics, wusurf).

    ``wusurf`` is the (im, jm) kinematic surface momentum flux for a
    single-gyre wind tau_x(y) = -tau0 cos(pi y / L): curl(tau) < 0
    everywhere, southward Sverdrup interior, northward western boundary
    current."""
    cfg_kw.setdefault("mode", 2)
    cfg_kw.setdefault("bc_scheme", "orlanski")   # walls: masks rule anyway
    cfg_kw.setdefault("dte", 60.0)
    cfg_kw.setdefault("isplit", 10)
    cfg_kw.setdefault("lramp", False)
    cfg = Config(im=im, jm=jm, kb=kb, **cfg_kw)

    dx0 = length / (im - 2)
    z, zz = sigma_levels(kb)
    fsm = np.ones((im, jm))
    fsm[0, :] = fsm[-1, :] = fsm[:, 0] = fsm[:, -1] = 0.0   # closed ring
    y = (np.arange(jm) - 1.0)[None, :] * dx0                # from s. wall
    cor = f0 + beta * np.broadcast_to(y, (im, jm))
    grid = make_grid(cfg, z, zz, np.full((im, jm), dx0),
                     np.full((im, jm), dx0), np.full((im, jm), depth),
                     fsm, cor=cor)

    rho0 = 1025.0
    wusurf = (tau0 / rho0) * np.cos(np.pi * y / length) \
        * np.ones((im, 1))
    wusurf = wusurf * np.asarray(grid.dum)      # no stress through walls

    tb = np.full((kb, im, jm), tbias)
    sb = np.full((kb, im, jm), sbias)
    ics = dict(tb=tb, sb=sb, tclim=tb, sclim=sb,
               elb=None, uab=None, vab=None)
    return cfg, grid, ics, np.asarray(wusurf)


def basin_model(**kw):
    """Convenience: a ready-to-run wind-driven basin Model."""
    import jax.numpy as jnp
    from extpom_tpu.core.model import Model

    cfg, grid, ics, wusurf = basin_case(**kw)
    m = Model(grid, cfg, tb=ics["tb"], sb=ics["sb"],
              tclim=ics["tclim"], sclim=ics["sclim"], donate=False)
    m.base_forcing = m.base_forcing.replace(
        wusurf=jnp.asarray(wusurf, cfg.jnp_dtype))
    return m
