"""Halo-window Pallas external-mode loop for grids beyond VMEM.

The whole-grid VMEM-resident kernel (pallas/extloop.py) holds every 2-D
field on-chip for all ``isplit`` substeps, but only fits up to ~512^2 f32
on a v5e.  Above that the XLA ``fori_loop`` path round-trips the ~48-field
working set through HBM EVERY substep (measured 44-46 % of the roofline at
1024^2, ROOFLINE.md round 2), and an XLA-materialized window gather
(round 2's ops/extblock.py, since removed) lost to its own
pad/reassemble traffic.

This kernel applies temporal tiling with MANUAL windows, the scheme the
reference's halo machinery exists to serve (advance.f:205-353,
parallel_mpi.f:154-239): split the i axis into stripes of ``Bi`` rows;
for each stripe, DMA a ``W = Bi + 2H`` row window of every field
HBM->VMEM, run ``C`` consecutive substeps entirely in VMEM (each substep
consumes halo rows — H must cover ``C x ext_halo_sub``), and write the
Bi-row interiors of the carry back.  HBM traffic drops from
``isplit`` full passes to ``isplit/C`` window passes.

The physics is the same :func:`extpom_tpu.core.stepper.
mode_external_substep` used by every other external path, evaluated under
a windowed DomainCtx (global region masks, boundary-clamped edge windows,
O(edge) edge writes via ``edge_slice``).
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except ImportError:          # pragma: no cover
    _HAVE_PLTPU = False

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid
from extpom_tpu.core import hw
from extpom_tpu.pallas.extloop import (CARRY_FIELDS, GRID_FIELDS,
                                       AUX_FIELDS, FC_2D_FIELDS,
                                       FC_1D_J, FC_1D_I, fits_vmem)


# window-set composition: input windows (carry+grid+aux+fc2+fci, double-
# buffered) vs carry outputs — used by the traffic model in chunk_geometry
_N_WIN = 40
_N_OUT = 14


def chunk_geometry(cfg: Config):
    """(C substeps per pass, H halo rows, Bi interior rows, ok).

    C divides isplit; H covers C x ext_halo_sub rounded up to a sublane
    tile; Bi fills the cfg.extwin_budget_mb VMEM window budget at the
    grid's jm.  C is chosen to minimize the MODELED total HBM traffic of
    the whole loop, (isplit/C) x (n_win x (Bi+2H)/Bi + n_out) window
    passes — larger C cuts passes but inflates the halo read
    amplification (Bi+2H)/Bi, and on wide grids (small Bi) the optimum
    walks down (round-3 accepted 2x amplification at 2048^2 and ran 82 %
    vs 90 % at 1024^2).  ``ok`` is False when no divisor yields a window
    that fits the i extent — callers must not dispatch then."""
    isplit = cfg.isplit
    w_max = cfg.extwin_budget_mb * 2 ** 20 // (110 * 4 * cfg.jm)
    best = None
    for C in range(min(cfg.extwin_chunk, isplit), 0, -1):
        if isplit % C:
            continue
        H = -(-(C * cfg.ext_halo_sub) // 8) * 8
        bi = min((w_max - 2 * H) // 8 * 8, cfg.im // 8 * 8 - 2 * H)
        if bi < 8:
            continue
        traffic = (isplit // C) * (_N_WIN * (bi + 2 * H) / bi + _N_OUT)
        if best is None or traffic < best[0]:
            best = (traffic, C, H, bi)
    if best is None:
        return 1, 8, 8, False
    return best[1], best[2], best[3], True


def _lane_aligned(cfg: Config) -> bool:
    """Mosaic lane-dim tiling gate (see pallas.phases._geometry_ok): on a
    real TPU the window DMA slices need a 128-aligned lane extent."""
    return hw.backend() != "tpu" or cfg.jm % 128 == 0


def use_pallas_extwin(cfg: Config) -> bool:
    """Static dispatch: the chunked window kernel serves grids too large
    for the whole-grid VMEM loop."""
    from extpom_tpu.ops import stencil
    if cfg.pallas_extwin == "off" or not _HAVE_PLTPU:
        return False
    ctx = stencil._ctx()
    if ctx is not None and ctx.block:
        return False
    C, H, Bi, ok = chunk_geometry(cfg)
    if not (ok and cfg.im % 8 == 0 and _lane_aligned(cfg)):
        return False
    if cfg.pallas_extwin == "on":
        return True
    return (hw.backend() == "tpu" and hw.device_count() == 1
            and cfg.dtype == "float32" and not fits_vmem(cfg)
            and cfg.im_act in (None, cfg.im)
            and cfg.jm_act in (None, cfg.jm))


def _kernel(cfg: Config, C: int, H: int, Bi: int, R: int, im_act: int,
            jm_act: int, has_off: bool, n_win: int,
            win_names, rep_names, *refs):
    """One chunk over one i-stripe: DMA windows in, C substeps VMEM-
    resident, DMA carry interiors out.

    ``R``: i extent of the input arrays (cfg.im on the plain path; the
    ring-extended local block of the shard_map composition).  ``has_off``:
    the SMEM block carries the traced global (i, j) index of array cell
    (0, 0) (mesh variant) — region masks then resolve against global
    indices and edge windows must NOT be treated as boundary-clamped."""
    from extpom_tpu.core import stepper
    from extpom_tpu.ops import stencil

    W = Bi + 2 * H
    n_rep = len(rep_names)
    n_out = len(CARRY_FIELDS)

    it = iter(refs)
    win_refs = [next(it) for _ in range(n_win)]
    rep_refs = [next(it) for _ in range(n_rep)]
    smem_ref = next(it)              # (1, 2): ramp, iext0 [+ goff_i/j]
    out_refs = [next(it) for _ in range(n_out)]
    win_scr = [next(it) for _ in range(n_win)]
    out_scr = [next(it) for _ in range(n_out)]
    sem_in = next(it)
    sem_out = next(it)

    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    j0 = pl.multiple_of(jnp.minimum(i * Bi, R - Bi), 8)
    start = pl.multiple_of(jnp.clip(j0 - H, 0, R - W), 8)
    off = pl.multiple_of(j0 - start, 8)

    # two-slot input pipeline (same pattern as pallas/phases._kernel):
    # window i was prefetched by iteration i-1; i+1 streams in while this
    # stripe's C substeps run.  Outputs are separate HBM buffers, so the
    # prefetch can never observe a stale carry write.
    slot = lax.rem(i, jnp.int32(2))

    def in_copy(k, block_start, sl):
        return pltpu.make_async_copy(
            win_refs[k].at[pl.ds(block_start, W), :],
            win_scr[k].at[sl], sem_in.at[sl, k])

    @pl.when(i == 0)
    def _():
        for k in range(n_win):
            in_copy(k, start, 0).start()

    @pl.when(i + 1 < nblk)
    def _():
        nj0 = pl.multiple_of(jnp.minimum((i + 1) * Bi, R - Bi), 8)
        nstart = pl.multiple_of(jnp.clip(nj0 - H, 0, R - W), 8)
        for k in range(n_win):
            in_copy(k, nstart, lax.rem(i + 1, jnp.int32(2))).start()

    for k in range(n_win):
        in_copy(k, start, slot).wait()

    vals = dict(zip(win_names, (s[slot] for s in win_scr)))
    for f, r in zip(rep_names, rep_refs):
        vals[f] = r[0]                         # (1, n) -> (n,)
    ramp = smem_ref[0, 0]
    iext0 = smem_ref[0, 1].astype(jnp.int32)

    grid_ns = SimpleNamespace(**{f: vals[f] for f in GRID_FIELDS})
    fc_ns = SimpleNamespace(
        ramp=ramp,
        **{f: vals[f] for f in FC_2D_FIELDS + FC_1D_J + FC_1D_I})
    aux_vals = tuple(vals[f] for f in AUX_FIELDS)
    c = stepper.ExtCarry(*(vals[f] for f in CARRY_FIELDS))

    if has_off:
        ctx = stencil.DomainCtx(
            im=im_act, jm=jm_act, windowed=True,
            off_i=smem_ref[0, 2].astype(jnp.int32) + start,
            off_j=smem_ref[0, 3].astype(jnp.int32))
    else:
        ctx = stencil.DomainCtx(
            im=im_act, jm=jm_act, windowed=True, off_i=start,
            edge_slice=(im_act == R))
    with stencil.domain(ctx), stencil.mask_caching():
        # the C substeps are Python-unrolled: mask_caching dedupes the
        # put/set region masks across them (one iota+compare set total)
        em = stepper.ext_precompute(grid_ns)
        for s in range(C):
            c = stepper.mode_external_substep(
                grid_ns, cfg, c, iext0 + s, fc_ns, aux_vals, em=em)

    # two-slot OUTPUT pipeline (same as pallas.phases._kernel): this
    # stripe's carry write-back drains while the next stripe computes;
    # the slot frees when the copy from two iterations ago lands, and
    # the final stripe drains both slots.
    n_out_c = len(CARRY_FIELDS)

    def out_copy(k, sl):
        return pltpu.make_async_copy(
            out_scr[k].at[sl, pl.ds(off, Bi), :],
            out_refs[k].at[pl.ds(j0, Bi), :], sem_out.at[sl, k])

    @pl.when(i >= 2)
    def _():
        for k in range(n_out_c):
            out_copy(k, slot).wait()

    for k, val in enumerate(c):
        out_scr[k][slot] = val
    for k in range(n_out_c):
        out_copy(k, slot).start()

    @pl.when((i == nblk - 1) & (i >= 1))
    def _():
        for k in range(n_out_c):
            out_copy(k, 1 - slot).wait()

    @pl.when(i == nblk - 1)
    def _():
        for k in range(n_out_c):
            out_copy(k, slot).wait()


def run_external_loop_windowed(grid: Grid, cfg: Config, c0, fc, aux,
                               interpret: bool = False):
    """Run the isplit external substeps as isplit/C chunked window passes.
    Same contract as extloop.run_external_loop."""
    from extpom_tpu.core import stepper

    dt_ = c0.el.dtype
    im, jm = cfg.im, cfg.jm
    C, H, Bi, _ = chunk_geometry(cfg)
    W = Bi + 2 * H
    n_chunks = cfg.isplit // C

    # windowed operands: carry (in+out) + grid + aux + 2-D forcing +
    # i-side series pre-broadcast to (im, jm) (lane-aligned windows; the
    # windowed _bi passes them through)
    win_names = (list(CARRY_FIELDS) + list(GRID_FIELDS)
                 + list(AUX_FIELDS) + list(FC_2D_FIELDS) + list(FC_1D_I))
    rep_names = list(FC_1D_J)

    grid_in = [getattr(grid, f) for f in GRID_FIELDS]
    aux_in = list(aux)
    fc2_in = [jnp.asarray(getattr(fc, f), dt_) for f in FC_2D_FIELDS]
    fci_in = [jnp.broadcast_to(
        jnp.asarray(getattr(fc, f), dt_)[:, None], (im, jm))
        for f in FC_1D_I]
    rep_in = [jnp.asarray(getattr(fc, f), dt_).reshape(1, -1)
              for f in FC_1D_J]
    n_win = len(win_names)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    n_out = len(CARRY_FIELDS)
    out_shape = tuple(jax.ShapeDtypeStruct((im, jm), dt_)
                      for _ in CARRY_FIELDS)
    scratch = ([pltpu.VMEM((2, W, jm), dt_) for _ in range(n_win)]
               + [pltpu.VMEM((2, W, jm), dt_) for _ in range(n_out)]
               + [pltpu.SemaphoreType.DMA((2, n_win)),
                  pltpu.SemaphoreType.DMA((2, n_out))])

    kern = functools.partial(_kernel, cfg, C, H, Bi, im,
                             cfg.im_act or im, cfg.jm_act or jm, False,
                             n_win, win_names, rep_names)
    call = pl.pallas_call(
        kern,
        grid=(-(-im // Bi),),
        in_specs=[any_spec] * n_win + [vmem] * len(rep_names) + [smem],
        out_specs=tuple(any_spec for _ in CARRY_FIELDS),
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=110 * 2 ** 20)
            if (_HAVE_PLTPU and not interpret) else None),
    )

    def chunk(ic, carry):
        smem_in = jnp.stack(
            [jnp.asarray(fc.ramp, dt_),
             (ic * C + 1).astype(dt_)]).reshape(1, 2)
        wins = list(carry) + grid_in + aux_in + fc2_in + fci_in
        outs = call(*wins, *rep_in, smem_in)
        return stepper.ExtCarry(*outs)

    return lax.fori_loop(0, n_chunks, chunk, c0)


# ---------------------------------------------------------------------------
# shard_map composition: the same striped window kernel on a
# halo-ring-extended local block (one chunk of C substeps per call)
# ---------------------------------------------------------------------------

def win_geometry(cfg: Config, R: int, L: int, C: int):
    """(H, Bi, ok) for striping a (R, L) ring-extended local block
    through the window kernel for ``C`` substeps.  H covers the substeps'
    chained halo consumption (ring width, rounded to a sublane tile); Bi
    fills the extwin VMEM budget at lane extent ``L``."""
    H = -(-(C * cfg.ext_halo_sub) // 8) * 8
    w_max = cfg.extwin_budget_mb * 2 ** 20 // (110 * 4 * L)
    bi = min((w_max - 2 * H) // 8 * 8, R // 8 * 8 - 2 * H)
    ok = (bi >= 8 and R % 8 == 0
          and (hw.backend() != "tpu" or L % 128 == 0))
    return H, max(bi, 0), ok


def use_win_chunk(cfg: Config, R: int, L: int, C: int) -> bool:
    """Dispatch the striped window kernel as the chunk body of the
    shard_map external loop (mesh/extchunk.py) — serves local blocks too
    large for the whole-block VMEM chunk kernel, carrying the plain
    path's large-grid external machine onto the mesh.  "on" forces
    (interpret off-TPU: tests); "auto" requires TPU f32 and a fitting
    stripe geometry."""
    if cfg.pallas_extwin == "off" or not _HAVE_PLTPU:
        return False
    _, _, ok = win_geometry(cfg, R, L, C)
    if not ok:
        return False
    if cfg.pallas_extwin == "on":
        return True
    return hw.backend() == "tpu" and cfg.dtype == "float32"


def run_external_chunk_windowed(grid_ns, cfg: Config, c0, fc_ns, aux,
                                C: int, iext0, goff, im_act: int,
                                jm_act: int, interpret: bool = False):
    """Run ``C`` external substeps over a halo-ring-extended (R, L) local
    block as striped window passes (the shard_map composition of
    :func:`run_external_loop_windowed`, mirroring
    extloop.run_external_chunk_vmem's contract).  ``goff`` is the traced
    global (i, j) index of block cell (0, 0); region masks resolve
    against global indices through SMEM, outputs' ring rows are garbage
    by construction and must be trimmed by the caller."""
    from extpom_tpu.core import stepper

    dt_ = c0.el.dtype
    R, L = c0.el.shape[-2], c0.el.shape[-1]
    H, Bi, ok = win_geometry(cfg, R, L, C)
    assert ok, "caller must gate on use_win_chunk"
    W = Bi + 2 * H

    win_names = (list(CARRY_FIELDS) + list(GRID_FIELDS)
                 + list(AUX_FIELDS) + list(FC_2D_FIELDS) + list(FC_1D_I))
    rep_names = list(FC_1D_J)

    wins = list(c0)
    wins += [getattr(grid_ns, f) for f in GRID_FIELDS]
    wins += list(aux)
    wins += [jnp.asarray(getattr(fc_ns, f), dt_) for f in FC_2D_FIELDS]
    wins += [jnp.broadcast_to(
        jnp.asarray(getattr(fc_ns, f), dt_)[:, None], (R, L))
        for f in FC_1D_I]
    rep_in = [jnp.asarray(getattr(fc_ns, f), dt_).reshape(1, -1)
              for f in FC_1D_J]
    n_win = len(wins)
    smem_in = jnp.stack([
        jnp.asarray(fc_ns.ramp, dt_),
        jnp.asarray(iext0, dt_),
        jnp.asarray(goff[0], dt_),
        jnp.asarray(goff[1], dt_)]).reshape(1, 4)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    n_out = len(CARRY_FIELDS)
    out_shape = tuple(jax.ShapeDtypeStruct((R, L), dt_)
                      for _ in CARRY_FIELDS)
    scratch = ([pltpu.VMEM((2, W, L), dt_) for _ in range(n_win)]
               + [pltpu.VMEM((2, W, L), dt_) for _ in range(n_out)]
               + [pltpu.SemaphoreType.DMA((2, n_win)),
                  pltpu.SemaphoreType.DMA((2, n_out))])

    kern = functools.partial(_kernel, cfg, C, H, Bi, R, im_act, jm_act,
                             True, n_win, win_names, rep_names)
    outs = pl.pallas_call(
        kern,
        grid=(-(-R // Bi),),
        in_specs=[any_spec] * n_win + [vmem] * len(rep_names) + [smem],
        out_specs=tuple(any_spec for _ in CARRY_FIELDS),
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=110 * 2 ** 20)
            if (_HAVE_PLTPU and not interpret) else None),
    )(*wins, *rep_in, smem_in)
    return stepper.ExtCarry(*outs)
