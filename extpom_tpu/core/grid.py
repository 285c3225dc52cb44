"""Static model grid.

Replaces the grid/metric portion of the reference's COMMON blocks
(pom.h_dist:200-364) and its setup code ``read_grid`` (initialize.f:317-389),
the dum/dvm mask derivation of ``read_grid_pnetcdf`` (io_pnetcdf.F:2241-2256)
and ``bottom_friction`` (initialize.f:524-544).

A :class:`Grid` is an immutable pytree of device arrays; it is passed as an
argument to jitted step functions (so one compiled step serves any grid of
the same shape).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from extpom_tpu.core.config import Config


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid:
    # vertical sigma grid (kb,)
    z: jnp.ndarray     # sigma levels, 0 (surface) .. -1 (bottom)
    zz: jnp.ndarray    # mid-layer sigma levels
    dz: jnp.ndarray    # z(k)-z(k+1), 0 at kb
    dzz: jnp.ndarray   # zz(k)-zz(k+1), 0 at kb

    # horizontal metrics (im, jm)
    dx: jnp.ndarray
    dy: jnp.ndarray
    h: jnp.ndarray     # bottom depth (positive)
    fsm: jnp.ndarray   # free-surface (T-cell) land mask
    dum: jnp.ndarray   # u-velocity mask
    dvm: jnp.ndarray   # v-velocity mask
    cor: jnp.ndarray   # Coriolis parameter
    art: jnp.ndarray   # T-cell area
    aru: jnp.ndarray   # u-cell area
    arv: jnp.ndarray   # v-cell area
    cbc: jnp.ndarray   # bottom friction coefficient
    hmax: jnp.ndarray  # max depth, scalar; used by bc_vel3d's depth blend
                       # (the reference recomputes hmax=maxval(d) per call,
                       # bounds_forcing.f:90 — and under MPI that is the
                       # LOCAL tile max, i.e. decomposition-dependent; a
                       # static global max is consistent and removes a
                       # full-array reduce from every internal step)

    # coordinates (for output/diagnostics; not used by the dynamics)
    east_e: jnp.ndarray
    north_e: jnp.ndarray
    east_c: jnp.ndarray
    north_c: jnp.ndarray
    east_u: jnp.ndarray
    north_u: jnp.ndarray
    east_v: jnp.ndarray
    north_v: jnp.ndarray
    rot: jnp.ndarray   # local grid rotation angle

    @property
    def im(self) -> int:
        return self.h.shape[0]

    @property
    def jm(self) -> int:
        return self.h.shape[1]

    @property
    def kb(self) -> int:
        return self.z.shape[0]

    @property
    def dtype(self):
        return self.h.dtype

    # broadcast helpers: (kb,) -> (kb, 1, 1) for 3-D expressions
    @property
    def dz3(self) -> jnp.ndarray:
        return self.dz[:, None, None]

    @property
    def dzz3(self) -> jnp.ndarray:
        return self.dzz[:, None, None]

    @property
    def z3(self) -> jnp.ndarray:
        return self.z[:, None, None]

    @property
    def zz3(self) -> jnp.ndarray:
        return self.zz[:, None, None]

    def inertial_period_days(self) -> float:
        """Inertial period at domain center (initialize.f:354-358)."""
        c = np.asarray(self.cor)[self.im // 2, self.jm // 2]
        if c == 0:
            raise ValueError("zero Coriolis at domain center")
        return float(2.0 * np.pi / abs(c) / 86400.0)


def masks_from_fsm(fsm: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Derive u/v masks from the T-cell mask.

    A u-face (v-face) is closed when either adjacent T cell is land
    (io_pnetcdf.F:2241-2256: dum(i+1,j)=0 where fsm(i,j)=0 & fsm(i+1,j)/=0,
    on top of dum=fsm)."""
    dum = fsm.copy()
    dvm = fsm.copy()
    dum[1:, :] = fsm[1:, :] * np.where(fsm[:-1, :] == 0.0, 0.0, 1.0)
    dvm[:, 1:] = fsm[:, 1:] * np.where(fsm[:, :-1] == 0.0, 0.0, 1.0)
    return dum, dvm


def sigma_levels(kb: int, kl1: Optional[int] = None,
                 kl2: Optional[int] = None) -> tuple[np.ndarray, np.ndarray]:
    """Build sigma coordinates z (levels) and zz (mid-layers).

    With kl1/kl2 given, uses the classic POM logarithmic refinement near
    surface and bottom; otherwise uniform spacing.
    """
    if kl1 is None:
        z = -np.linspace(0.0, 1.0, kb)
    else:
        # tanh-stretched refinement toward surface and bottom (the role the
        # classic POM kl1/kl2 log spacing plays)
        s = np.linspace(0.0, 1.0, kb)
        c = np.tanh(2.0)
        z = -(np.tanh(2.0 * s) + s * (1.0 - c)) / (c + (1.0 - c))
        z[0], z[-1] = 0.0, -1.0
    zz = np.zeros(kb)
    zz[:-1] = 0.5 * (z[:-1] + z[1:])
    zz[-1] = 2.0 * zz[-2] - zz[-3]
    return z, zz


def make_grid(cfg: Config,
              z: np.ndarray,
              zz: np.ndarray,
              dx: np.ndarray,
              dy: np.ndarray,
              h: np.ndarray,
              fsm: np.ndarray,
              east_e: Optional[np.ndarray] = None,
              north_e: Optional[np.ndarray] = None,
              rot: Optional[np.ndarray] = None,
              dum: Optional[np.ndarray] = None,
              dvm: Optional[np.ndarray] = None,
              cor: Optional[np.ndarray] = None) -> Grid:
    """Assemble a :class:`Grid`, deriving metrics as ``read_grid`` does."""
    dt_ = np.dtype(cfg.dtype)
    im, jm, kb = cfg.im, cfg.jm, cfg.kb
    assert h.shape == (im, jm) and z.shape == (kb,)

    z = np.asarray(z, np.float64)
    zz = np.asarray(zz, np.float64)
    dz = np.zeros(kb)
    dzz = np.zeros(kb)
    dz[:-1] = z[:-1] - z[1:]           # initialize.f:331-335
    dzz[:-1] = zz[:-1] - zz[1:]

    if east_e is None:
        # synthetic lon/lat from metric spacing around 45N (diagnostic only)
        xe = np.cumsum(dx, axis=0) - dx / 2.0
        ye = np.cumsum(dy, axis=1) - dy / 2.0
        east_e = xe / 111.0e3
        north_e = 45.0 + ye / 111.0e3
    if rot is None:
        rot = np.zeros((im, jm))

    if cor is None:
        # cor = 2 Omega sin(lat) (initialize.f:347-351)
        cor = 2.0 * 7.29e-5 * np.sin(np.deg2rad(north_e))
    cor = np.broadcast_to(np.asarray(cor, np.float64), (im, jm))

    # cell areas (initialize.f:361-381); aru/arv on i,j >= 2 with west/south
    # edge rows copied from the adjacent interior row
    art = dx * dy
    aru = np.ones((im, jm))
    arv = np.ones((im, jm))
    aru[1:, 1:] = 0.25 * (dx[1:, 1:] + dx[:-1, 1:]) * (dy[1:, 1:] + dy[:-1, 1:])
    arv[1:, 1:] = 0.25 * (dx[1:, 1:] + dx[1:, :-1]) * (dy[1:, 1:] + dy[1:, :-1])
    aru[0, :] = aru[1, :]
    arv[0, :] = arv[1, :]
    aru[:, 0] = aru[:, 1]
    arv[:, 0] = arv[:, 1]

    if dum is None or dvm is None:
        dum, dvm = masks_from_fsm(np.asarray(fsm, np.float64))

    # bottom friction coefficient (initialize.f:524-544)
    with np.errstate(divide="ignore", invalid="ignore"):
        cbc = (cfg.kappa / np.log((1.0 + zz[kb - 2]) * h / cfg.z0b)) ** 2
    cbc = np.clip(np.nan_to_num(cbc, nan=cfg.cbcmax), cfg.cbcmin, cfg.cbcmax)

    # C-grid staggered coordinates (diagnostic)
    east_u = np.copy(east_e)
    east_u[1:, :] = 0.5 * (east_e[1:, :] + east_e[:-1, :])
    north_u = np.copy(north_e)
    north_u[1:, :] = 0.5 * (north_e[1:, :] + north_e[:-1, :])
    east_v = np.copy(east_e)
    east_v[:, 1:] = 0.5 * (east_e[:, 1:] + east_e[:, :-1])
    north_v = np.copy(north_e)
    north_v[:, 1:] = 0.5 * (north_e[:, 1:] + north_e[:, :-1])
    east_c = np.copy(east_u)
    east_c[:, 1:] = 0.5 * (east_u[:, 1:] + east_u[:, :-1])
    north_c = np.copy(north_v)
    north_c[1:, :] = 0.5 * (north_v[1:, :] + north_v[:-1, :])

    def dev(a):
        return jnp.asarray(np.asarray(a), dt_)

    return Grid(
        z=dev(z), zz=dev(zz), dz=dev(dz), dzz=dev(dzz),
        dx=dev(dx), dy=dev(dy), h=dev(h), fsm=dev(fsm),
        dum=dev(dum), dvm=dev(dvm), cor=dev(cor),
        art=dev(art), aru=dev(aru), arv=dev(arv), cbc=dev(cbc),
        hmax=dev(np.max(np.asarray(h) * np.asarray(fsm))
                 if np.any(np.asarray(fsm) > 0) else np.max(h)),
        east_e=dev(east_e), north_e=dev(north_e),
        east_c=dev(east_c), north_c=dev(north_c),
        east_u=dev(east_u), north_u=dev(north_u),
        east_v=dev(east_v), north_v=dev(north_v), rot=dev(rot),
    )
