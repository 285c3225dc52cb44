"""External-mode (vertically averaged) advection and diffusion.

Mirrors ``advave`` (solver.f:6-199).  All arrays are (im, jm); Fortran loop
bounds map to 0-based slice regions (see ops.stencil).  The reference's
mid-computation halo exchanges (solver.f:60-61,111-112,153) are implicit in
the global-array formulation.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid
from extpom_tpu.ops.stencil import sft, put, s_


def advave(grid: Grid, cfg: Config,
           d: jnp.ndarray, ua: jnp.ndarray, va: jnp.ndarray,
           uab: jnp.ndarray, vab: jnp.ndarray, aam2d: jnp.ndarray,
           wubot: jnp.ndarray, wvbot: jnp.ndarray, em=None,
           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (advua, advva, wubot, wvbot).

    wubot/wvbot are updated only in mode 2 (bottom stress from the depth
    mean flow, solver.f:123-143); otherwise passed through unchanged.
    ``em`` carries the loop-invariant derived metrics
    (core.stepper.ext_precompute) when the caller runs this every
    external substep.
    """
    dx, dy = grid.dx, grid.dy
    z = jnp.zeros_like(d)

    if em is None:
        from extpom_tpu.core.stepper import ext_precompute
        em = ext_precompute(grid)
    dx4, dy4 = em.dx4, em.dy4

    # ---- u advection & diffusion (solver.f:16-70) ----
    # advective fluxes
    fluxua = put(z, 0.125 * ((sft(d, 1, 0) + d) * sft(ua, 1, 0)
                             + (d + sft(d, -1, 0)) * ua)
                 * (sft(ua, 1, 0) + ua),
                 slice(1, -1), slice(1, None))
    fluxva = put(z, 0.125 * ((d + sft(d, 0, -1)) * va
                             + (sft(d, -1, 0) + sft(d, -1, -1)) * sft(va, -1, 0))
                 * (ua + sft(ua, 0, -1)),
                 slice(1, None), slice(1, None))
    # viscous flux (solver.f:37-43)
    fluxua = put(fluxua,
                 fluxua - d * 2.0 * aam2d * (sft(uab, 1, 0) - uab) * em.rdx,
                 slice(1, -1), slice(1, None))
    # cross term + metric scaling (solver.f:45-58); tps is reused by the
    # v-part below, exactly as in the reference
    tps = put(z, 0.25 * (d + sft(d, -1, 0) + sft(d, 0, -1) + sft(d, -1, -1))
              * (aam2d + sft(aam2d, 0, -1) + sft(aam2d, -1, 0)
                 + sft(aam2d, -1, -1))
              * ((uab - sft(uab, 0, -1)) * em.rdy4
                 + (vab - sft(vab, -1, 0)) * em.rdx4),
              slice(1, None), slice(1, None))
    fluxua = put(fluxua, fluxua * dy, slice(1, None), slice(1, None))
    fluxva = put(fluxva, (fluxva - tps) * 0.25 * dx4,
                 slice(1, None), slice(1, None))

    advua = put(z, fluxua - sft(fluxua, -1, 0) + sft(fluxva, 0, 1) - fluxva,
                slice(1, -1), slice(1, -1))

    # ---- v advection & diffusion (solver.f:72-121) ----
    fluxua = put(z, 0.125 * ((d + sft(d, -1, 0)) * ua
                             + (sft(d, 0, -1) + sft(d, -1, -1)) * sft(ua, 0, -1))
                 * (sft(va, -1, 0) + va),
                 slice(1, None), slice(1, None))
    fluxva = put(z, 0.125 * ((sft(d, 0, 1) + d) * sft(va, 0, 1)
                             + (d + sft(d, 0, -1)) * va)
                 * (sft(va, 0, 1) + va),
                 slice(1, None), slice(1, -1))
    fluxva = put(fluxva,
                 fluxva - d * 2.0 * aam2d * (sft(vab, 0, 1) - vab) * em.rdy,
                 slice(1, None), slice(1, -1))
    fluxva = put(fluxva, fluxva * dx, slice(1, None), slice(1, None))
    fluxua = put(fluxua, (fluxua - tps) * 0.25 * dy4,
                 slice(1, None), slice(1, None))

    advva = put(z, sft(fluxua, 1, 0) - fluxua + fluxva - sft(fluxva, 0, -1),
                slice(1, -1), slice(1, -1))

    if cfg.mode == 2:
        cbc = grid.cbc
        # depth-mean bottom stress (solver.f:125-143)
        wubot = put(wubot,
                    -0.5 * (cbc + sft(cbc, -1, 0))
                    * jnp.sqrt(uab ** 2
                               + (0.25 * (vab + sft(vab, 0, 1)
                                          + sft(vab, -1, 0)
                                          + sft(vab, -1, 1))) ** 2) * uab,
                    slice(1, -1), slice(1, -1))
        wvbot = put(wvbot,
                    -0.5 * (cbc + sft(cbc, 0, -1))
                    * jnp.sqrt(vab ** 2
                               + (0.25 * (uab + sft(uab, 1, 0)
                                          + sft(uab, 0, -1)
                                          + sft(uab, 1, -1))) ** 2) * vab,
                    slice(1, -1), slice(1, -1))
        # metric curvature terms (solver.f:145-193); the reduced range at the
        # physical west/south edge is the global i=3../j=3.. region
        curv2d = put(z, 0.25 * ((sft(va, 0, 1) + va) * (sft(dy, 1, 0) - sft(dy, -1, 0))
                                - (sft(ua, 1, 0) + ua) * (sft(dx, 0, 1) - sft(dx, 0, -1)))
                     * em.rart,
                     slice(1, -1), slice(1, -1))
        advua = put(advua,
                    advua - grid.aru * 0.25
                    * (curv2d * d * (sft(va, 0, 1) + va)
                       + sft(curv2d, -1, 0) * sft(d, -1, 0)
                       * (sft(va, -1, 1) + sft(va, -1, 0))),
                    slice(2, -1), slice(1, -1))
        advva = put(advva,
                    advva + grid.arv * 0.25
                    * (curv2d * d * (sft(ua, 1, 0) + ua)
                       + sft(curv2d, 0, -1) * sft(d, 0, -1)
                       * (sft(ua, 1, -1) + sft(ua, 0, -1))),
                    slice(1, -1), slice(2, -1))

    return advua, advva, wubot, wvbot
