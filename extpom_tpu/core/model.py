"""High-level model driver.

Replaces the reference's ``program pom`` + ``initialize`` + per-step host
logic (pom.f:8-39, initialize.f:7-64, advance.f:6-59): cold start, the time
loop, print-interval diagnostics, the blow-up guard, and restart/output
hooks.  All device compute is delegated to the jitted step function
(:mod:`extpom_tpu.core.stepper`); the driver only does host-side control.
"""

from __future__ import annotations

import dataclasses
import math
import time as _time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid
from extpom_tpu.core.state import State, Forcing, zero_state, zero_forcing
from extpom_tpu.core import stepper
from extpom_tpu.ops import density, pressure
from extpom_tpu.diag import stats as diag_stats


def cold_start(grid: Grid, cfg: Config,
               tb: jnp.ndarray, sb: jnp.ndarray,
               tclim: jnp.ndarray, sclim: jnp.ndarray,
               elb: Optional[jnp.ndarray] = None,
               uab: Optional[jnp.ndarray] = None,
               vab: Optional[jnp.ndarray] = None,
               ub: Optional[jnp.ndarray] = None,
               vb: Optional[jnp.ndarray] = None,
               ):
    """Build the initial State + rmean, mirroring ``initial_conditions`` +
    ``update_initial`` (initialize.f:392-521).

    Returns (state, rmean).
    """
    dt_ = cfg.jnp_dtype
    st = zero_state(grid, cfg)
    z2 = jnp.zeros((cfg.im, cfg.jm), dt_)

    elb = z2 if elb is None else jnp.asarray(elb, dt_)
    uab = z2 if uab is None else jnp.asarray(uab, dt_)
    vab = z2 if vab is None else jnp.asarray(vab, dt_)
    tb = jnp.asarray(tb, dt_)
    sb = jnp.asarray(sb, dt_)
    tclim = jnp.asarray(tclim, dt_)
    sclim = jnp.asarray(sclim, dt_)

    rmean = density.dens(grid, cfg, sclim, tclim)   # initialize.f:416
    rho = density.dens(grid, cfg, sb, tb)           # initialize.f:425

    et = elb
    dt2 = grid.h + et

    # MY-2.5 seeds (initialize.f:481-494)
    l0 = jnp.broadcast_to(0.1 * dt2, (cfg.kb, cfg.im, cfg.jm)).astype(dt_)
    q2b = jnp.full_like(l0, cfg.small)
    q2lb = l0 * q2b
    kh = l0 * jnp.sqrt(q2b)
    aam = jnp.full_like(l0, cfg.aam_init)

    u0 = jnp.zeros((cfg.kb, cfg.im, cfg.jm), dt_) if ub is None \
        else jnp.asarray(ub, dt_)
    v0 = jnp.zeros((cfg.kb, cfg.im, cfg.jm), dt_) if vb is None \
        else jnp.asarray(vb, dt_)

    st = st.replace(
        el=elb, elb=elb, et=et, etb=et, etf=et,
        ua=uab, uab=uab, va=vab, vab=vab,
        utb=uab * dt2, vtb=vab * dt2,   # depth-integrated accumul. seeds
        t=tb, tb=tb, s=sb, sb=sb, rho=rho,
        u=u0, ub=u0, v=v0, vb=v0,
        l=l0, q2=q2b, q2b=q2b, q2l=q2lb, q2lb=q2lb,
        kh=kh, km=kh, kq=kh, aam=aam,
    )

    # initial baroclinic PG -> drx2d/dry2d (initialize.f:500-519)
    ramp = jnp.asarray(1.0, dt_)
    if cfg.npg == 1:
        drhox, drhoy = pressure.baropg(grid, cfg, rho, rmean, dt2, ramp)
    else:
        drhox, drhoy = pressure.baropg_mcc(grid, cfg, rho, rmean,
                                           grid.h + elb, dt2, ramp)
    dz3 = grid.dz3[:cfg.kbm1]
    st = st.replace(drx2d=jnp.sum(drhox[:cfg.kbm1] * dz3, axis=0),
                    dry2d=jnp.sum(drhoy[:cfg.kbm1] * dz3, axis=0))
    return st, rmean


def edge_forcing(fc: Forcing, tb, sb, elb, uab, vab, ub, vb) -> Forcing:
    """Seed open-boundary data from the IC edge columns: T/S profiles and
    tsurf/ssurf as the reference does (initialize.f:437-460), plus
    elevation/velocity edges (which the reference reads from the .lbry file,
    bounds_forcing.f:593-868) so self-contained cases radiate toward their
    initial state."""
    return fc.replace(
        tbe=tb[:, -1, :], tbw=tb[:, 0, :], sbe=sb[:, -1, :], sbw=sb[:, 0, :],
        tbn=tb[:, :, -1], tbs=tb[:, :, 0], sbn=sb[:, :, -1], sbs=sb[:, :, 0],
        tsurf=tb[0], ssurf=sb[0],
        elw=elb[0, :], ele=elb[-1, :], els=elb[:, 0], eln=elb[:, -1],
        uabw=uab[1, :], uabe=uab[-1, :], vabs=vab[:, 1], vabn=vab[:, -1],
        uabs=uab[:, 0], uabn=uab[:, -1], vabw=vab[0, :], vabe=vab[-1, :],
        ubw=ub[:, 1, :], ube=ub[:, -1, :], vbw=vb[:, 0, :], vbe=vb[:, -1, :],
        vbs=vb[:, :, 1], vbn=vb[:, :, -1], ubs=ub[:, :, 0], ubn=ub[:, :, -1])


class Model:
    """Owns (grid, cfg, state, climatology) and drives the time loop.

    ``forcing_fn(model, iint) -> Forcing`` supplies per-step forcing (time
    interpolation happens host-side, like the reference's wind/heat/
    lateral_bc readers, bounds_forcing.f:593-1020); default is the static
    edge-seeded forcing of the cold start.
    """

    def __init__(self, grid: Grid, cfg: Config,
                 tb, sb, tclim=None, sclim=None,
                 elb=None, uab=None, vab=None, ub=None, vb=None,
                 forcing_fn: Optional[Callable] = None,
                 donate: bool = True):
        cfg.validate()
        self.grid = grid
        self.cfg = cfg
        tclim = tb if tclim is None else tclim
        sclim = sb if sclim is None else sclim
        self.state, self.rmean = cold_start(grid, cfg, tb, sb, tclim, sclim,
                                            elb=elb, uab=uab, vab=vab,
                                            ub=ub, vb=vb)
        self.tclim = jnp.asarray(tclim, cfg.jnp_dtype)
        self.sclim = jnp.asarray(sclim, cfg.jnp_dtype)
        st = self.state
        self.base_forcing = edge_forcing(
            zero_forcing(grid, cfg, with_restore=cfg.do_restore),
            st.tb, st.sb, st.elb, st.uab, st.vab, st.ub, st.vb)
        self.forcing_fn = forcing_fn
        self._donate = donate
        self._step = stepper.make_step_fn(cfg, donate=donate)
        self.iint = 0          # completed internal steps
        self.time0 = 0.0
        self.mesh = None       # set by shard()
        self._par_mode = None
        try:
            self.period = grid.inertial_period_days()
        except ValueError:
            self.period = math.inf

    def shard(self, mesh, mode: str = "gspmd") -> "Model":
        """Distribute the model over a 2-D device mesh (the distribute_mpi
        analogue, parallel_mpi.f:34-122).

        ``mode="gspmd"`` keeps the jitted global-array step and lets the
        SPMD partitioner insert halo exchanges; ``mode="shardmap"`` swaps in
        the explicit shard_map + ppermute path (mesh.shardmap).  Grids that
        do not divide the mesh are padded (mesh.padding).  Works unchanged
        under multi-process execution (call mesh.distributed.
        init_distributed first; every process builds the same Model)."""
        from extpom_tpu.mesh import padding, shardmap
        from extpom_tpu.mesh.sharding import shard_pytree

        px, py = mesh.shape["x"], mesh.shape["y"]
        if self.cfg.im % px or self.cfg.jm % py:
            padding.pad_model(self, px, py)
        self.mesh = mesh
        self._par_mode = mode
        if mode == "shardmap":
            (self.grid, self.state, self.base_forcing, self.rmean,
             self.tclim, self.sclim) = shardmap.shard_args(
                mesh, self.cfg, self.grid, self.state, self.base_forcing,
                self.rmean, self.tclim, self.sclim)
            self._step = shardmap.make_shardmap_step(
                mesh, self.grid, self.cfg, self.base_forcing, donate=False)
            self._donate = False
        elif mode == "gspmd":
            im, jm = self.cfg.im, self.cfg.jm
            self.grid = shard_pytree(self.grid, mesh, im, jm)
            self.state = shard_pytree(self.state, mesh, im, jm)
            self.base_forcing = shard_pytree(self.base_forcing, mesh,
                                             im, jm)
            self.rmean = shard_pytree(self.rmean, mesh, im, jm)
            self.tclim = shard_pytree(self.tclim, mesh, im, jm)
            self.sclim = shard_pytree(self.sclim, mesh, im, jm)
            self._step = stepper.make_step_fn(self.cfg,
                                              donate=self._donate)
        else:
            raise ValueError(f"unknown parallel mode {mode!r}")
        self._run_fn = None
        self._plan = None
        return self

    def _shard_fc(self, fc: Forcing) -> Forcing:
        if self.mesh is None:
            return fc
        from extpom_tpu.mesh import shardmap
        from extpom_tpu.mesh.sharding import shard_pytree
        if self._par_mode == "shardmap":
            return shardmap.shard_args(self.mesh, self.cfg, self.grid,
                                       self.state, fc)[2]
        return shard_pytree(fc, self.mesh, self.cfg.im, self.cfg.jm)

    # -- time & ramp (advance.f:62-75) --
    @property
    def time_days(self) -> float:
        return self.cfg.dti * self.iint / 86400.0 + self.time0

    def ramp_value(self, iint: int) -> float:
        if not self.cfg.lramp:
            return 1.0
        t = self.cfg.dti * iint / 86400.0 + self.time0
        return min(t / self.period, 1.0)

    def forcing_at(self, iint: int) -> Forcing:
        fc = (self.forcing_fn(self, iint) if self.forcing_fn is not None
              else self.base_forcing)
        return fc.replace(ramp=jnp.asarray(self.ramp_value(iint),
                                           self.cfg.jnp_dtype))

    def compute_wr(self) -> jnp.ndarray:
        """Physical (z-coordinate) vertical velocity ``wr`` from the current
        state (realvertvl, solver.f:2024-2067).

        The reference computes wr every step (advance.f:534) but only
        consumes it in output files; here it is computed on demand at output
        time from the same post-step time levels (et=etf has already been
        rotated), which yields the identical output values without paying
        the stencil every step."""
        from extpom_tpu.ops import continuity, stencil
        st = self.state
        with stencil.domain_of(self.cfg):
            return continuity.realvertvl(self.grid, self.cfg, st.w, st.u,
                                         st.v, self.grid.h + st.et, st.et,
                                         st.etf, st.etb)

    def step_once(self) -> State:
        fc = self._shard_fc(self.forcing_at(self.iint + 1))
        try:
            new = self._step(self.grid, self.state, fc, self.rmean,
                             self.tclim, self.sclim,
                             first=(self.iint == 0))
        except jax.errors.JaxRuntimeError:
            if not self._donate:
                raise
            # Some backends reject whole-pytree buffer donation at compile
            # time (observed on the axon TPU plugin); fall back without it.
            self._donate = False
            self._step = stepper.make_step_fn(self.cfg, donate=False)
            new = self._step(self.grid, self.state, fc, self.rmean,
                             self.tclim, self.sclim,
                             first=(self.iint == 0))
        self.state = new
        self.iint += 1
        return self.state

    def _device_plan(self, t0_days=None, t1_days=None):
        """Staged on-device forcing series, when the forcing_fn is a
        ForcingProvider with a record source (extpom_tpu.forcing.device).

        Series within the HBM budget (cfg.forcing_hbm_mb) are staged once
        and cached; oversized series are staged as per-segment record
        WINDOWS for [t0_days, t1_days] and re-staged on every call (the
        one-record-pair streaming analogue, bounds_forcing.f:607-613) —
        window lengths depend only on the segment duration, so the jitted
        segment does not recompile."""
        from extpom_tpu.forcing import device as fdev
        from extpom_tpu.forcing.provider import ForcingProvider
        if not isinstance(self.forcing_fn, ForcingProvider):
            return None
        p = self.forcing_fn
        budget = self.cfg.forcing_hbm_mb * 2 ** 20
        # plan_bytes reads record 0 of every series from the host source —
        # cache it per provider so run_segment does no per-segment host I/O
        # when the fully-staged plan is already resident
        cached = getattr(self, "_plan_bytes", None)
        if cached is None or cached[0] is not p:
            cached = (p, fdev.plan_bytes(p))
            self._plan_bytes = cached
        if cached[1] > budget and t0_days is not None:
            return fdev.make_device_plan(p, budget_bytes=budget,
                                         t0_days=t0_days,
                                         t1_days=t1_days)
        if getattr(self, "_plan", None) is None:
            self._plan = (fdev.make_device_plan(p),)
        return self._plan[0]

    def run_segment(self, n_steps: int) -> State:
        """Fast path: run ``n_steps`` under one jitted ``lax.scan`` segment.

        Time-varying forcing served by a ForcingProvider record source is
        staged on device and interpolated INSIDE the scan (forcing.device);
        any other ``forcing_fn`` must use :meth:`run` (per-step host
        assembly).  The production throughput path."""
        from extpom_tpu.forcing.provider import ForcingProvider
        if (self.forcing_fn is not None
                and not isinstance(self.forcing_fn, ForcingProvider)):
            raise ValueError(
                "run_segment needs a ForcingProvider-backed forcing_fn "
                "(or none); use run() for arbitrary per-step forcing")
        if getattr(self, "_run_fn", None) is None:
            period = self.period if math.isfinite(self.period) else 1.0
            if self._par_mode == "shardmap":
                # whole segment scan inside the shard_map body (one
                # dispatch per segment on the explicit ppermute path)
                from extpom_tpu.mesh import shardmap
                self._run_fn = shardmap.make_shardmap_run(
                    self.mesh, self.grid, self.cfg, self.base_forcing,
                    period, self.time0)
            else:
                self._run_fn = stepper.make_run_fn(
                    self.cfg, period, self.time0, donate=False)
        fc = self.base_forcing
        t0 = self.time_days
        t1 = t0 + n_steps * self.cfg.dti / 86400.0
        plan = self._device_plan(t0, t1)
        if plan is not None and self._par_mode == "shardmap":
            from extpom_tpu.mesh import shardmap
            was_cached = (getattr(self, "_plan", None) is not None
                          and plan is self._plan[0])
            plan = shardmap.shard_plan(self.mesh, self.cfg, plan)
            if was_cached:     # keep the sharded layout across segments
                self._plan = (plan,)
        self.state = self._run_fn(self.grid, self.state, fc, self.rmean,
                                  self.tclim, self.sclim, self.iint,
                                  n_steps, first=(self.iint == 0),
                                  plan=plan)
        self.iint += n_steps
        return self.state

    def run(self, n_steps: Optional[int] = None,
            log: Optional[Callable[[str], None]] = None,
            check_interval: Optional[int] = None,
            on_print: Optional[Callable[["Model", Dict], None]] = None,
            ) -> State:
        """Run the time loop (pom.f:14-22 + print_section/check_velocity).

        Raises ``FloatingPointError`` if the blow-up guard trips
        (|va| > vmaxl, advance.f:611-641).
        """
        cfg = self.cfg
        n = cfg.iend if n_steps is None else n_steps
        t0 = _time.perf_counter()
        for _ in range(n):
            self.step_once()
            # print-interval switch at iswtch (advance.f:65-68)
            if check_interval is not None:
                iprint = check_interval
            elif self.iint >= cfg.iswtch:
                iprint = cfg.iprint2
            else:
                iprint = cfg.iprint
            if self.iint % iprint == 0 or self.iint == n:
                st = self.state
                vamax, (iloc, jloc) = diag_stats.check_velocity(cfg, st.va)
                vamax = float(vamax)
                if not np.isfinite(vamax) or vamax > cfg.vmaxl:
                    i, j = int(iloc), int(jloc)
                    lon = float(self.grid.east_e[i, j])
                    lat = float(self.grid.north_e[i, j])
                    raise FloatingPointError(
                        f"velocity condition violated: vamax={vamax:.3e} "
                        f"at (i,j)=({i},{j}) lon/lat=({lon:.4f},{lat:.4f}),"
                        f" iint={self.iint}")
                if log is not None or on_print is not None:
                    s = {k: float(v) for k, v in
                         diag_stats.domain_stats(self.grid, cfg, st).items()}
                    if log is not None:
                        log(f"time={self.time_days:9.4f} iint={self.iint:8d} "
                            f"vtot={s['vtot']:.7e} eaver={s['eaver']:.7e} "
                            f"taver={s['taver']:.7e} saver={s['saver']:.7e} "
                            f"ekin={s['ekin']:.7e}")
                    if on_print is not None:
                        on_print(self, s)
        jax.block_until_ready(self.state.el)
        self.last_wall_s = _time.perf_counter() - t0
        return self.state
