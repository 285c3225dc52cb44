"""Chunked, grid-blocked external-mode loop (HBM-traffic reduction).

The external (2-D barotropic) loop is the model's hottest code: isplit
(~30) substeps per internal step, each re-reading/re-writing the ~48-field
2-D working set from HBM under the plain XLA ``fori_loop`` (ROOFLINE.md).
The whole-grid VMEM-resident Pallas kernel (pallas/extloop.py) removes that
traffic entirely but only fits <= ~256^2.

This module scales the same idea to ANY grid size with halo-chunking:

* the isplit substeps are split into chunks of ``C = cfg.ext_chunk``;
* within a chunk the domain is processed as overlapping windows of
  ``B + 2H`` rows/cols (``H = C * rho``, ``rho = cfg.ext_halo_sub`` the
  per-substep stencil radius): each window runs all C substeps locally
  with NO intermediate HBM round trip, losing rho cells of halo validity
  per substep, and commits only its B x B interior — the classic
  halo-trimming / temporal-tiling scheme;
* window semantics are provided by the SAME stencil machinery as the
  shard_map path: a windowed :class:`extpom_tpu.ops.stencil.DomainCtx`
  resolves every region mask and boundary-condition write against GLOBAL
  indices (vmapped per-window offsets), and the zero-fill of local shifts
  lands only in halo cells that the trim discards.

HBM traffic per substep drops from ~48 field passes to ~(34 * overlap +
28) / C (window overlap factor (B+2H)^2/B^2), a ~3-4x reduction at C=5.

Physics is NOT re-implemented: each window calls the exact
:func:`extpom_tpu.core.stepper.mode_external_substep` used by every other
path.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid
from extpom_tpu.ops import stencil

# field groups (same roles as pallas/extloop.py)
GRID_FIELDS = ("h", "dx", "dy", "art", "aru", "arv", "cor",
               "fsm", "dum", "dvm", "cbc")
GRID_PAD_ONE = {"dx", "dy", "h", "art", "aru", "arv"}
FC_2D = ("wusurf", "wvsurf", "vflux", "e_atmos")
FC_1D_J = ("elw", "ele", "uabw", "uabe", "vabw", "vabe")
FC_1D_I = ("els", "eln", "vabs", "vabn", "uabs", "uabn")


def use_blocked_ext(cfg: Config) -> bool:
    """Static dispatch: the blocked path needs a grid big enough that the
    window overhead pays off, and must not run inside another block
    context (shard_map local shards could use it per-shard, but that is
    not wired yet)."""
    ctx = stencil._ctx()
    if ctx is not None and ctx.block:
        return False
    if cfg.ext_block == "off":
        return False
    if cfg.ext_block == "on":
        return True
    # auto: above the Pallas whole-grid VMEM limit and at least 2x2 blocks
    return (cfg.im >= 2 * cfg.ext_block_size
            and cfg.jm >= 2 * cfg.ext_block_size)


def _pad_hv(a, hi, hj, fill=0.0):
    return jnp.pad(a, ((hi[0], hi[1]), (hj[0], hj[1])),
                   constant_values=fill)


def run_external_loop_blocked(grid: Grid, cfg: Config, c0, fc, aux):
    """Run all isplit substeps chunk-by-chunk over halo windows.

    Same contract as pallas.extloop.run_external_loop: takes/returns the
    stepper's ExtCarry.
    """
    from extpom_tpu.core import stepper

    B = cfg.ext_block_size
    C = max(1, min(cfg.ext_chunk, cfg.isplit))
    rho = cfg.ext_halo_sub
    H = C * rho
    im, jm = cfg.im, cfg.jm
    im_act = cfg.im_act or im
    jm_act = cfg.jm_act or jm
    nbi = -(-im // B)
    nbj = -(-jm // B)
    im_p, jm_p = nbi * B, nbj * B
    W_i, W_j = B + 2 * H, B + 2 * H
    dt_ = c0.el.dtype

    # ---- step-constant inputs, padded once ----
    def pad_full(a, fill=0.0):
        return _pad_hv(jnp.asarray(a, dt_),
                       (H, im_p - im + H), (H, jm_p - jm + H), fill)

    grid_p = {f: pad_full(getattr(grid, f),
                          1.0 if f in GRID_PAD_ONE else 0.0)
              for f in GRID_FIELDS}
    aux_p = tuple(pad_full(a) for a in aux)
    fc_p = {f: pad_full(getattr(fc, f)) for f in FC_2D}
    fc_j = {f: jnp.pad(jnp.asarray(getattr(fc, f), dt_),
                       (H, jm_p - jm + H)) for f in FC_1D_J}
    fc_i = {f: jnp.pad(jnp.asarray(getattr(fc, f), dt_),
                       (H, im_p - im + H)) for f in FC_1D_I}
    ramp = jnp.asarray(fc.ramp, dt_)

    # per-window start offsets in padded coordinates
    bi = jnp.arange(nbi, dtype=jnp.int32) * B
    bj = jnp.arange(nbj, dtype=jnp.int32) * B
    i0s = jnp.repeat(bi, nbj)
    j0s = jnp.tile(bj, nbi)

    def chunk(carry_tuple, iext0, n_sub):
        """Run substeps iext0 .. iext0+n_sub-1 over all windows."""
        carry_pad = tuple(pad_full(a) for a in carry_tuple)

        def window_fn(i0, j0):
            win = lambda a: lax.dynamic_slice(a, (i0, j0), (W_i, W_j))
            winj = lambda a: lax.dynamic_slice(a, (j0,), (W_j,))
            wini = lambda a: lax.dynamic_slice(a, (i0,), (W_i,))
            grid_ns = SimpleNamespace(
                **{f: win(v) for f, v in grid_p.items()},
                hmax=grid.hmax,
                dz=grid.dz, dzz=grid.dzz, z=grid.z, zz=grid.zz)
            fc_ns = SimpleNamespace(
                **{f: win(v) for f, v in fc_p.items()},
                **{f: winj(v) for f, v in fc_j.items()},
                **{f: wini(v) for f, v in fc_i.items()},
                ramp=ramp)
            aux_w = tuple(win(a) for a in aux_p)
            c = stepper.ExtCarry(*(win(a) for a in carry_pad))
            ctx = stencil.DomainCtx(
                im=im_act, jm=jm_act, windowed=True,
                off_i=i0 - H, off_j=j0 - H)
            with stencil.domain(ctx):
                for k in range(n_sub):
                    c = stepper.mode_external_substep(
                        grid_ns, cfg, c, jnp.int32(iext0 + k), fc_ns,
                        aux_w)
            # commit the B x B interior only
            return tuple(v[H:H + B, H:H + B] for v in c)

        outs = jax.vmap(window_fn)(i0s, j0s)    # each (nb, B, B)

        def reassemble(a):
            a = a.reshape(nbi, nbj, B, B).transpose(0, 2, 1, 3)
            return a.reshape(im_p, jm_p)[:im, :jm]

        return tuple(reassemble(a) for a in outs)

    carry = tuple(c0)
    iext = 1
    while iext <= cfg.isplit:
        n_sub = min(C, cfg.isplit - iext + 1)
        if n_sub < C:
            # partial tail chunk: halo budget H > n_sub*rho, still valid
            pass
        carry = chunk(carry, iext, n_sub)
        iext += n_sub
    return stepper.ExtCarry(*carry)
