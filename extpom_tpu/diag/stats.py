"""Global diagnostics and runtime guards.

* :func:`domain_stats` — area/volume/mass/salt totals, T/S/elevation
  averages, kinetic energy (advance.f:644-756).  On global arrays the
  reference's careful interior-vs-physical-edge bookkeeping (only counting
  rank-boundary rows at true domain edges) reduces to fixed slice sums; the
  MPI reduce/bcast pair disappears (sharded ``jnp.sum`` lowers to a psum).
* :func:`check_velocity` — blow-up detector on ``|vaf|`` (advance.f:611-641).
* :func:`cfl_min` — external-mode CFL advisory (parallel_mpi.f:483-514).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid
from extpom_tpu.core.state import State


def domain_stats(grid: Grid, cfg: Config, st: State) -> Dict[str, jnp.ndarray]:
    """Returns dict with vtot, atot, mtot, tsalt, taver, saver, eaver, ekin.

    Edge handling follows advance.f:669-745: sums cover the interior plus
    the four physical edge rows/columns, i.e. everything except the four
    corner points; ekin additionally counts only the east/north edges
    (advance.f:735-739).
    """
    kbm1 = cfg.kbm1
    # restrict to the active region when arrays are padded (mesh.padding)
    ia = cfg.im_act or cfg.im
    ja = cfg.jm_act or cfg.jm
    act = lambda a: a[..., :ia, :ja]
    grid_dx, grid_dy, grid_fsm = act(grid.dx), act(grid.dy), act(grid.fsm)
    darea = grid_dx * grid_dy * grid_fsm

    def edge_sum(a2d):
        # interior + all four physical edges, corners excluded
        return (jnp.sum(a2d[1:-1, 1:-1])
                + jnp.sum(a2d[0, 1:-1]) + jnp.sum(a2d[-1, 1:-1])
                + jnp.sum(a2d[1:-1, 0]) + jnp.sum(a2d[1:-1, -1]))

    atot = edge_sum(darea)
    eavg = edge_sum(act(st.et) * darea)
    eavg = jnp.where(atot != 0, eavg / atot, 0.0)

    dt2 = act(grid.h) + act(st.et)
    dvol = darea[None] * dt2[None] * grid.dz3[:kbm1]     # (kbm1, im, jm)

    def edge_sum3(a3d):
        return (jnp.sum(a3d[:, 1:-1, 1:-1])
                + jnp.sum(a3d[:, 0, 1:-1]) + jnp.sum(a3d[:, -1, 1:-1])
                + jnp.sum(a3d[:, 1:-1, 0]) + jnp.sum(a3d[:, 1:-1, -1]))

    vtot = edge_sum3(dvol)
    dmass = dvol * (act(st.rho)[:kbm1] * cfg.rhoref + 1000.0)
    # mtot sums the interior only (advance.f:700-702)
    mtot = jnp.sum(dmass[:, 1:-1, 1:-1])
    tavg = edge_sum3(act(st.tb)[:kbm1] * dvol)
    stot = edge_sum3(act(st.sb)[:kbm1] * dvol)
    tavg = jnp.where(vtot != 0, tavg / vtot, 0.0)
    savg = jnp.where(vtot != 0, stot / vtot, 0.0)

    # kinetic energy: interior + east/north edges only (advance.f:733-740)
    ke = dmass * (act(st.u)[:kbm1] ** 2 + act(st.v)[:kbm1] ** 2)
    ekin = (0.5 * jnp.sum(ke[:, 1:-1, 1:-1])
            + jnp.sum(ke[:, -1, 1:-1]) + jnp.sum(ke[:, 1:-1, -1]))

    return dict(vtot=vtot, atot=atot, mtot=mtot, tsalt=stot,
                taver=tavg, saver=savg, eaver=eavg, ekin=ekin)


def check_velocity(cfg: Config, vaf: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Blow-up detector (advance.f:611-641).

    Returns (vamax, (i, j) argmax location); the caller compares
    vamax > cfg.vmaxl and reports the grid location plus coordinates, like
    the reference's imax/jmax + east_e/north_e printout (advance.f:625-636).
    """
    a = jnp.abs(vaf)
    i, j = jnp.unravel_index(jnp.argmax(a), a.shape)
    return jnp.max(a), (i, j)


def cfl_min(grid: Grid, cfg: Config) -> jnp.ndarray:
    """Minimum external-mode CFL time step over water points
    (parallel_mpi.f:488-502): 0.5 / sqrt(1/dx^2 + 1/dy^2) / sqrt(g h)."""
    tps = (0.5 / jnp.sqrt(1.0 / grid.dx ** 2 + 1.0 / grid.dy ** 2)
           / jnp.sqrt(cfg.grav * jnp.maximum(grid.h, 1.0e-12)))
    big = jnp.asarray(1.0e30, tps.dtype)
    return jnp.min(jnp.where(grid.fsm > 0, tps, big))
