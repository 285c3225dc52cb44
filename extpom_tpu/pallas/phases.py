"""Fused halo-window Pallas kernels for the internal (3-D) mode phases.

The full 3-D step is LAUNCH-bound on a single chip: the XLA path emits
~1600 device kernels per step with a ~2.8 us mean (ROOFLINE.md round-2
census) while the minimum HBM traffic of the internal mode is well under a
millisecond.  The fix is structural: run each internal-mode phase —
depth-mean/vertical-velocity (advance.f:364-400), the TKE pair + MY-2.5
closure (advance.f:406-421, solver.f:411-477/1212-1538), the tracer step
(advance.f:424-456, solver.f:480-731/1541-1683), and the momentum step
(advance.f:459-521, solver.f:734-845/1686-1877) — as a handful of BIG
Pallas kernels instead of hundreds of tiny ones.

Geometry: fields are (kb, im, jm) (or (im, jm)); each kernel instance
processes an i-stripe of ``Bi`` rows.  Because the phase bodies contain
horizontal stencils (and chains of them), each instance reads a HALO
WINDOW of ``W = Bi + 2H`` rows: the kernel DMAs every operand's window
HBM->VMEM (``pl.ds`` with sublane-aligned dynamic starts), evaluates the
WHOLE phase on the resident window, and DMAs only the Bi-row interior of
each output back.  At the domain edges the window start clamps to the
boundary, so the zero-fill semantics of the local shifts (ops.stencil.sft)
coincide with the global ones exactly where results are committed.

Source of truth: the kernel bodies call the SAME phase functions
(core.stepper.phase_uvw/tke/tracer/mom) and op library used by the XLA
path, under a ``windowed`` DomainCtx so region masks resolve against
global indices (ops/stencil.py).  The two paths agree to roundoff and are
maintained together; tests/test_phases.py asserts equality in interpret
mode at float64.

Halo sufficiency: H must cover the total chained stencil radius of a
phase (worst chain: advection radius 2 + closure/BC radius ~2).  H = 8
(one sublane tile) is comfortably above every phase's radius and keeps
every DMA start 8-aligned; correctness does not depend on tuning it down.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace
from typing import Callable, List, NamedTuple, Optional, Sequence

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
from extpom_tpu.core import hw


def use_pallas_phases(cfg: Config) -> bool:
    """Static dispatch decision (trace time), same contract as
    extloop.use_pallas_ext: "on" forces (interpret off-TPU), "off"
    disables, "auto" enables on a single-TPU f32 trace when at least one
    phase's windows fit the VMEM model (per-phase dispatch: infeasible
    phases individually fall back to the XLA path inside the runner)."""
    from extpom_tpu.ops import stencil
    if cfg.pallas_phases == "off" or not _HAVE_PLTPU:
        return False
    ctx = stencil._ctx()
    if ctx is not None and ctx.block:
        # shard_map local / windowed trace: stencils must stay jnp
        return False
    if not feasible_phases(cfg):
        return False
    if cfg.pallas_phases == "on":
        return True
    return (hw.backend() == "tpu" and hw.device_count() == 1
            and cfg.dtype == "float32"
            and cfg.im_act in (None, cfg.im)
            and cfg.jm_act in (None, cfg.jm))


# ---------------------------------------------------------------------------
# per-phase VMEM geometry model
# ---------------------------------------------------------------------------
#
# Round 4 sized every phase for the worst one (TKE: 15 3-D windows in,
# 8 out) — which returned Bi=0 and silently refused to dispatch exactly at
# the config-5 flagship tile (1024x512x41 local block, ring lanes 640;
# VERDICT r4 Missing #1).  The reference's machine is geometry-blind
# (exchange2d/3d_mpi + solver.f at any im_local x jm_local x kb,
# parallel_mpi.f:154-351); the analogue here is PER-PHASE sizing: each
# phase gets the largest stripe ITS operand set affords, and a phase whose
# windows cannot fit at all falls back to the XLA path alone instead of
# dragging the other four with it.

PHASES = ("lat", "uvw", "tke", "tracer", "mom")

# Live-temporary allowance per phase, in 3-D-window-row equivalents: the
# phase bodies keep O(few) W-row intermediates live next to the declared
# scratch (Mosaic allocates them from the same VMEM).  tke=3 (plus this
# model's explicit 2-D-window charge) reproduces the round-4 anchored
# worst-phase boundaries exactly: 256^2x31 (32,2s,2s) fits / (40,.,2s)
# OOMs, 512^2x31 (16,2s,1s) fits / (24,2s,1s) refused.  The others are
# scaled by chain length and probed on-chip with tools/phasetune.py.
_PHASE_TMP3 = {"uvw": 4, "tke": 3, "tracer": 6, "lat": 6, "mom": 5}

# REAL live-temporary load for the scoped-demand filter, in 3-D-row
# equivalents at kb=31, scaling ~ kb (so absolute temp bytes ~ kb^2 W
# lanes — the fully-unrolled Thomas solves keep per-level values live
# across the whole sweep).  tke is CHIP-CALIBRATED: 15.5 x 41/31 = 20.5
# row-equivalents reproduces the measured 117.95 MiB scoped demand of
# tke(16,1s,1s) at 1024x512x41 to 0.2 % and the kb=31 fit boundaries;
# phases without an OOM anchor get a modest default (their bodies are
# single-solve or solve-free).  The flat-headroom _PHASE_TMP3 scheme
# above mispriced exactly this: headroom is constant while real
# temporaries scale with row3 x W, so kb=41 geometries OOMed at plans
# the kb=31 anchors blessed (caught by the config-5 2x4 AOT compile,
# round 5).
_PHASE_T31 = {"tke": 15.5, "uvw": 5.0}
_T31_DEFAULT = 10.0
_SCOPED_MARGIN = 6 * 2 ** 20

# scratch budget for the windows (under the VMEM_LIMIT kernel limit,
# leaving temporaries headroom).  Anchored on-chip (v5e,
# tools/phasetune.py): 256^2x31 Bi=32 2-slot-out FITS / Bi=40 OOMs;
# 512^2x31 Bi=16 1-slot-out FITS (757 Mpt-steps/s) / 2-slot OOMs.
_SCRATCH_BUDGET = 83 * 2 ** 20

# scoped-vmem limit requested for the phase kernels (128 MiB physical on
# v5e).  120 MiB: the mesh-composed variant of a phase kernel carries
# more live temporaries than the global one at the same plan — its region
# masks resolve against traced global offsets and its edge writes cannot
# be row-sliced (stencil.set_i edge_slice off), so e.g. tke(Bi=16,1s,1s)
# at the config-5 per-chip tile (1024x512x41) measures 117.95 MiB scoped
# demand where the plain variant fits 110 (probed on-chip, round 5); at
# 120 the same plan compiles and runs on both.  The plain variant keeps
# requesting 110 (a higher limit relaxes Mosaic's scheduling pressure
# for no benefit on kernels that fit); VMEM_LIMIT is the ceiling the
# scoped-demand plan filter sizes against.
VMEM_LIMIT = 120 * 2 ** 20
VMEM_LIMIT_PLAIN = 110 * 2 ** 20


def phase_counts(cfg: Config, phase: str):
    """Windowed-operand counts (n3_in, n2_in, n3_out, n2_out) of one
    phase under this cfg — the i-windowed inputs each kernel instance
    DMAs (11 2-D grid metrics ride every phase; i-side boundary series
    are lane-broadcast to 3-D windows; j-side series and vertical
    columns are VMEM-replicated whole and charged to the temporary
    allowance).  Mirrors the operand assembly in :class:`runner`; the
    runner re-derives exact counts from the actual arrays at trace time,
    this static table serves the dispatch predicates."""
    if phase == "uvw":
        return 3, 20, 3, 0
    if phase == "tke":
        return 15, 18, 8, 0
    if phase == "tracer":
        n3 = 12 + (4 if cfg.bc_scheme != "orlanski" else 0) \
            + (3 if cfg.do_restore else 0)
        return n3, 19, 5, 0
    if phase == "lat":
        return 7, 13, 5, 0
    if phase == "mom":
        return 10 + (4 if cfg.bc_scheme == "file" else 0), 20, 4, 2
    raise ValueError(f"unknown phase {phase!r}")


class PhasePlan(NamedTuple):
    """One phase's window geometry: interior stripe rows per kernel
    instance and whether the input/output windows double-buffer."""
    bi: int
    in2: bool
    out2: bool


def plan_from_counts(cfg: Config, counts, rows: int = 0,
                     lanes: int = 0, t31: float = _T31_DEFAULT
                     ) -> PhasePlan:
    """Choose (Bi, in2, out2) so the windows + a live-temporary allowance
    fit the anchored VMEM budget.

    Selection rule (round-5 on-chip A/Bs at 256^2x31, tools/phasetune.py:
    all-(32,2s,2s) = 877 Mpt-steps/s; lat/uvw at Bi=64 flat; tke
    (40,2s,1s) = 825; tracer (64,1s,2s) = 822): the kernels are
    VPU-bound above Bi ~ 16-24, so DMA-overlap slots dominate stripe
    size there, while below that the halo read amplification wins
    (round 4: 512^2 tke (16,2s,1s) 757 vs (8,2s,2s) 668).  Ranked
    tiers — full double-buffering with a Bi >= 24 stripe, then input
    prefetch with Bi >= 16, then the largest single-slot stripe — with
    the largest feasible Bi inside each tier.  Returns bi < 8 when
    nothing fits (callers must fall back to the XLA phase path).
    ``rows``/``lanes`` override the kernel input extents (the
    halo-ring-extended local block of the shard_map variant); 0 means
    the global cfg.im/jm."""
    n3i, n2i, n3o, n2o, t3 = counts
    H = cfg.phase_halo
    rows = rows or cfg.im
    row3 = max((lanes or cfg.jm) * cfg.kb * 4, 1)
    row2 = max((lanes or cfg.jm) * 4, 1)
    bi_rows = (rows - 2 * H) // 8 * 8      # window must fit the array
    best, best_rank = PhasePlan(0, False, False), (-1, 0, 0)
    in_choices = (True, False) if cfg.phase_double_buffer else (False,)
    out_choices = (True, False) if cfg.phase_out_double else (False,)
    temp_row = t31 * (cfg.kb / 31.0) * row3
    for in2 in in_choices:
        si = 2 if in2 else 1
        for out2 in out_choices:
            so = 2 if out2 else 1
            per_row = ((n3i * si + n3o * so + t3) * row3
                       + (n2i * si + n2o * so) * row2)
            w_max = _SCRATCH_BUDGET // per_row
            bi = min(cfg.phase_block, (w_max - 2 * H) // 8 * 8, bi_rows)
            # scoped-demand filter (see _PHASE_T31): windows + the
            # kb-scaled REAL temporary load must fit the requested
            # scoped-vmem limit, walking bi down until it does
            win_row = ((n3i * si + n3o * so) * row3
                       + (n2i * si + n2o * so) * row2)
            while bi >= 8 and ((bi + 2 * H) * (win_row + temp_row)
                               > VMEM_LIMIT - _SCOPED_MARGIN):
                bi -= 8
            if bi < 8:
                continue
            if in2 and out2 and bi >= 24:
                tier = 4
            elif in2 and bi >= 16:
                tier = 3
            elif bi >= 16:
                tier = 2
            else:
                tier = 1
            rank = (tier, bi, int(in2) + int(out2))
            if rank > best_rank:
                best, best_rank = PhasePlan(bi, in2, out2), rank
    return best


def scoped_demand(cfg: Config, counts, plan: PhasePlan, lanes: int = 0,
                  t31: float = _T31_DEFAULT) -> int:
    """Modeled scoped-vmem demand (bytes) of one phase kernel at
    ``plan`` — windows plus the kb-scaled live-temporary charge (the
    same formula the plan filter walks against)."""
    n3i, n2i, n3o, n2o = counts[:4]
    row3 = max((lanes or cfg.jm) * cfg.kb * 4, 1)
    row2 = max((lanes or cfg.jm) * 4, 1)
    si = 2 if plan.in2 else 1
    so = 2 if plan.out2 else 1
    win_row = (n3i * si + n3o * so) * row3 + (n2i * si + n2o * so) * row2
    temp_row = t31 * (cfg.kb / 31.0) * row3
    return int((plan.bi + 2 * cfg.phase_halo) * (win_row + temp_row))


def phase_plan(cfg: Config, phase: str, rows: int = 0,
               lanes: int = 0) -> PhasePlan:
    """Per-phase window geometry from the static operand table."""
    n3i, n2i, n3o, n2o = phase_counts(cfg, phase)
    return plan_from_counts(cfg, (n3i, n2i, n3o, n2o, _PHASE_TMP3[phase]),
                            rows=rows, lanes=lanes,
                            t31=_PHASE_T31.get(phase, _T31_DEFAULT))


def _aligned(cfg: Config, rows: int, lanes: int) -> bool:
    """Alignment constraints shared by every phase kernel."""
    if hw.backend() == "tpu" and lanes % 128 != 0:
        # Mosaic lane-dim tiling: on a real TPU the windowed DMA slices
        # need a 128-aligned lane extent ("Slice shape along dimension 1
        # must be aligned to tiling (128)", reproduced on-device with
        # jm=48) — fall back to the XLA phase path on unaligned grids.
        # Interpret mode (CPU tests) is exempt.
        return False
    # kb != rows guards the _is_windowed shape ambiguity ((kb, rows)
    # boundary series vs (rows, lanes) fields)
    return (rows % 8 == 0 and cfg.phase_halo % 8 == 0
            and cfg.kb != rows)


def feasible_phases(cfg: Config, rows: int = 0, lanes: int = 0) -> list:
    """Phases whose windows fit the VMEM model at this geometry (the
    dispatch set; the rest run the XLA path)."""
    rows = rows or cfg.im
    lanes = lanes or cfg.jm
    if not _aligned(cfg, rows, lanes):
        return []
    return [p for p in PHASES
            if phase_plan(cfg, p, rows=rows, lanes=lanes).bi >= 8]


# ---------------------------------------------------------------------------
# generic halo-window runner
# ---------------------------------------------------------------------------

def _is_windowed(arr, im: int, jm: int) -> bool:
    """Fields with an i axis at position -2 get halo-windowed; everything
    else (vertical columns, j-side series, broadcast scalars) is VMEM-
    replicated whole.  i-side boundary series are passed pre-shaped as
    (..., im, 1)."""
    if arr.ndim < 2:
        return False
    return arr.shape[-2] == im and arr.shape[-1] in (jm, 1)


def _win_shape(shape, W: int):
    return shape[:-2] + (W,) + shape[-1:]


def _block_shape(shape, Bi: int):
    return shape[:-2] + (Bi,) + shape[-1:]


def _window_geom(i, im: int, Bi: int, H: int):
    W = Bi + 2 * H
    j0 = pl.multiple_of(jnp.minimum(i * Bi, im - Bi), 8)
    start = pl.multiple_of(jnp.clip(j0 - H, 0, im - W), 8)
    off = pl.multiple_of(j0 - start, 8)
    return j0, start, off


def _kernel(im: int, Bi: int, H: int, n_win: int, n_rep: int, n_out: int,
            double: bool, double_out: bool, has_off: bool,
            body: Callable, *refs):
    W = Bi + 2 * H
    win_refs = refs[:n_win]
    rep_refs = refs[n_win:n_win + n_rep]
    k0 = n_win + n_rep
    off_ref = refs[k0] if has_off else None   # SMEM (1, 2): goff_i, goff_j
    k0 += 1 if has_off else 0
    out_refs = refs[k0:k0 + n_out]
    scr = refs[k0 + n_out:]
    win_scr = scr[:n_win]
    out_scr = scr[n_win:n_win + n_out]
    sem_in, sem_out = scr[n_win + n_out:]

    i = pl.program_id(0)
    j0, start, off = _window_geom(i, im, Bi, H)

    def in_copy(k, block_start, slot):
        r, s = win_refs[k], win_scr[k]
        pre = (slice(None),) * (len(r.shape) - 2)
        dst = s.at[slot] if double else s
        return pltpu.make_async_copy(
            r.at[pre + (pl.ds(block_start, W), slice(None))], dst,
            sem_in.at[slot, k] if double else sem_in.at[k])

    if double:
        # two-slot pipeline: window i was prefetched by iteration i-1
        # (i=0 starts its own), window i+1 starts now and lands while
        # this iteration computes — input HBM streaming overlaps VPU work
        nblk = pl.num_programs(0)
        slot = lax.rem(i, jnp.int32(2))

        @pl.when(i == 0)
        def _():
            for k in range(n_win):
                in_copy(k, start, 0).start()

        @pl.when(i + 1 < nblk)
        def _():
            _, nstart, _ = _window_geom(i + 1, im, Bi, H)
            for k in range(n_win):
                in_copy(k, nstart,
                        lax.rem(i + 1, jnp.int32(2))).start()

        for k in range(n_win):
            in_copy(k, start, slot).wait()
        win_vals = [s[slot] for s in win_scr]
    else:
        copies = [in_copy(k, start, 0) for k in range(n_win)]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()
        win_vals = [s[:] for s in win_scr]

    rep_vals = [r[:] for r in rep_refs]
    goff = (off_ref[0, 0], off_ref[0, 1]) if has_off else None
    out_vals = body(win_vals, rep_vals, start, goff)

    def out_copy(k, oslot):
        s, r = out_scr[k], out_refs[k]
        pre = (slice(None),) * (len(r.shape) - 2)
        src = (s.at[oslot] if double_out else s).at[
            pre + (pl.ds(off, Bi), slice(None))]
        return pltpu.make_async_copy(
            src, r.at[pre + (pl.ds(j0, Bi), slice(None))],
            sem_out.at[oslot, k] if double_out else sem_out.at[k])

    if double_out:
        # two-slot OUTPUT pipeline: this window's interior write-back
        # drains while the next window computes (the tail wait was
        # serializing ~out_bytes/BW of idle VPU time per window).  The
        # slot is reusable once the copy issued two iterations ago (same
        # slot) completes; the final window drains both slots.
        nblk = pl.num_programs(0)
        oslot = lax.rem(i, jnp.int32(2))

        @pl.when(i >= 2)
        def _():
            for k in range(n_out):
                out_copy(k, oslot).wait()

        for k, val in enumerate(out_vals):
            out_scr[k][oslot] = val
        for k in range(n_out):
            out_copy(k, oslot).start()

        @pl.when((i == nblk - 1) & (i >= 1))
        def _():
            for k in range(n_out):
                out_copy(k, 1 - oslot).wait()

        @pl.when(i == nblk - 1)
        def _():
            for k in range(n_out):
                out_copy(k, oslot).wait()
    else:
        copies = []
        for k, val in enumerate(out_vals):
            out_scr[k][:] = val
            cp = out_copy(k, 0)
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()


def windowed_phase(cfg: Config, body: Callable, arrays: Sequence,
                   out_templates: Sequence, interpret: bool = False,
                   rows: int = 0, lanes: int = 0, off=None,
                   plan: Optional[PhasePlan] = None,
                   vmem_limit: int = 0):
    """Run ``body`` over halo-windowed i-stripes.

    ``arrays``: phase operands; fields with an i axis ((.., im, jm) or
    (.., im, 1)) are halo-windowed, the rest VMEM-replicated whole.
    ``body(win_vals, rep_vals, start) -> out_vals`` receives the windowed
    values (in ``arrays`` order), the replicated values (ditto), and the
    traced global row index of window row 0; it returns window-shaped
    outputs matching ``out_templates`` ((.., im, jm) ShapeDtypeStructs or
    arrays), whose Bi-row interiors are committed.

    ``rows``/``lanes``/``off``: the shard_map local-block variant
    (mesh_runner) — the arrays are halo-ring-extended LOCAL blocks of
    ``rows`` x ``lanes`` cells; ``off`` is the traced (2,) global (i, j)
    index of local cell (0, 0) (negative by the ring width), threaded to
    the kernel through SMEM so region masks keep resolving against global
    indices.  ``body`` then receives ``start + off[0]`` semantics via the
    DomainCtx and must NOT assume boundary-clamped edge windows
    (edge_slice off).

    ``plan``: the per-phase window geometry (see :func:`phase_plan`); the
    caller is responsible for it fitting (bi >= 8).
    """
    from extpom_tpu.ops import stencil

    im = rows or cfg.im
    jm = lanes or cfg.jm
    if plan is None:
        plan = phase_plan(cfg, "tke", rows=im, lanes=jm)
    Bi, double_out = plan.bi, plan.out2
    H = cfg.phase_halo
    W = Bi + 2 * H
    im_act = cfg.im_act or cfg.im
    jm_act = cfg.jm_act or cfg.jm

    win_idx = [k for k, a in enumerate(arrays) if _is_windowed(a, im, jm)]
    rep_idx = [k for k, a in enumerate(arrays) if k not in win_idx]
    win_in = [arrays[k] for k in win_idx]
    rep_in = [arrays[k] for k in rep_idx]

    def kernel_body(win_vals, rep_vals, start, goff):
        vals = [None] * len(arrays)
        for k, v in zip(win_idx, win_vals):
            vals[k] = v
        for k, v in zip(rep_idx, rep_vals):
            vals[k] = v
        # region masks resolve against GLOBAL row indices: local window
        # iota + start (+ the block's global offset in mesh mode) — the
        # exchange2d/3d-free analogue of the reference's per-rank
        # i_global maps (parallel_mpi.f:88-105).  edge_slice: the global
        # i layout is pad-free and edge windows clamp to the boundary, so
        # set_i may slice edge-row expressions to one row (see
        # stencil.py); never valid for ring-extended local blocks.
        if goff is None:
            ctx = stencil.DomainCtx(
                im=im_act, jm=jm_act, windowed=True, off_i=start,
                edge_slice=(im_act == im))
        else:
            ctx = stencil.DomainCtx(
                im=im_act, jm=jm_act, windowed=True,
                off_i=goff[0] + start, off_j=goff[1])
        with stencil.domain(ctx), stencil.mask_caching():
            # dedupe repeated put/set region masks within the phase body
            return body(vals, start)

    n_win, n_rep, n_out = len(win_in), len(rep_in), len(out_templates)
    double = plan.in2
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = tuple(jax.ShapeDtypeStruct(t.shape, t.dtype)
                      for t in out_templates)
    slots = (2,) if double else ()
    oslots = (2,) if double_out else ()
    scratch = ([pltpu.VMEM(slots + _win_shape(a.shape, W), a.dtype)
                for a in win_in]
               + [pltpu.VMEM(oslots + _win_shape(t.shape, W), t.dtype)
                  for t in out_templates]
               + [pltpu.SemaphoreType.DMA(slots + (max(n_win, 1),)),
                  pltpu.SemaphoreType.DMA(oslots + (max(n_out, 1),))])

    has_off = off is not None
    extra_in = []
    extra_specs = []
    if has_off:
        extra_in.append(jnp.asarray(off, jnp.int32).reshape(1, 2))
        extra_specs.append(smem)

    grid = (-(-im // Bi),)
    kern = functools.partial(_kernel, im, Bi, H, n_win, n_rep, n_out,
                             double, double_out, has_off, kernel_body)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[any_spec] * n_win + [vmem] * n_rep + extra_specs,
        out_specs=tuple(any_spec for _ in out_templates),
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=(
                vmem_limit or VMEM_LIMIT_PLAIN))
            if (_HAVE_PLTPU and not interpret) else None),
    )(*win_in, *rep_in, *extra_in)
    return outs


# ---------------------------------------------------------------------------
# phase adapters
# ---------------------------------------------------------------------------

_GRID_WIN = ("h", "dx", "dy", "fsm", "dum", "dvm", "cor", "art", "aru",
             "arv", "cbc")
_GRID_REP = ("dz3", "dzz3", "z3", "zz3")


class _GridNS(SimpleNamespace):
    """Window-valued grid namespace; .dz/.dzz/.z/.zz fall back to the
    (kb, 1, 1) 3-D columns (broadcast-identical in every op use)."""

    @property
    def dz(self):
        return self.dz3

    @property
    def dzz(self):
        return self.dzz3

    @property
    def z(self):
        return self.z3

    @property
    def zz(self):
        return self.zz3


def _grid_arrays(grid, prep=None, lanes: int = 0) -> List:
    """``prep``: transform applied to each windowed (im, jm) grid field
    (the mesh_runner's halo-ring extension); ``lanes`` overrides the lane
    extent of the replicated column broadcasts."""
    dt_ = grid.h.dtype
    jm = lanes or grid.h.shape[-1]
    kb = grid.z.shape[0]
    prep = prep or (lambda f, a: a)
    arrs = [prep(f, getattr(grid, f)) for f in _GRID_WIN]
    # vertical columns broadcast to (kb, 1, jm): Mosaic can broadcast
    # sublanes OR lanes, not both, so the lane dim is pre-expanded here
    # (tiny: kb x jm) and only the sublane broadcast happens in-kernel
    arrs += [jnp.broadcast_to(jnp.asarray(getattr(grid, f), dt_),
                              (kb, 1, jm)) for f in _GRID_REP]
    arrs.append(jnp.broadcast_to(jnp.asarray(grid.hmax, dt_), (1, jm)))
    return arrs


def _grid_ns(vals) -> _GridNS:
    ns = _GridNS()
    n2 = len(_GRID_WIN)
    for f, v in zip(_GRID_WIN, vals[:n2]):
        setattr(ns, f, v)
    for f, v in zip(_GRID_REP, vals[n2:n2 + len(_GRID_REP)]):
        setattr(ns, f, v)
    ns.hmax = vals[n2 + len(_GRID_REP)]
    return ns


_N_GRID = len(_GRID_WIN) + len(_GRID_REP) + 1


def _shape_iseries(a, lanes: int):
    """(.., im) i-side boundary series -> full (.., im, lanes) field so
    the runner windows it with a 128-aligned lane extent (Mosaic cannot
    DMA 1-lane slices); bcond._bi/_bj pass the 3-D form through.  The
    materialization is small (one j-replicated field per used series)."""
    return jnp.broadcast_to(a[..., :, None], a.shape + (lanes,))


class runner:
    """Per-trace phase dispatcher: builds the fused kernels lazily with
    grid/cfg/fc closed over, mirroring the signatures of
    core.stepper.phase_* minus (grid, cfg, fc).  Dispatch is PER PHASE:
    a phase whose exact operand windows don't fit the VMEM model falls
    back to the XLA phase function alone (under the ambient DomainCtx),
    so one heavy phase never drags the others off the fast path."""

    def __init__(self, grid, cfg: Config, fc):
        self.grid = grid
        self.cfg = cfg
        self.fc = fc
        self.ni = cfg.im            # i extent of the phase operand arrays
        self.nj = cfg.jm
        self.rows = cfg.im          # i extent of the kernels' input arrays
        self.lanes = cfg.jm         # lane extent of same
        self.interpret = jax.default_backend() != "tpu"

    # -- overridable preparation hooks (mesh_runner ring-extends) ----------

    def _vmem_limit(self, demand: int) -> int:
        """Plain kernels are chip-validated at the 110 MiB limit at every
        dispatching geometry (the model overcharges them: it is
        calibrated on the heavier mesh variant)."""
        return VMEM_LIMIT_PLAIN

    def _garrs(self) -> List:
        return _grid_arrays(self.grid)

    def _prep_fc(self, name: str, a):
        return a

    def _prep_arr(self, a):
        return a

    def _post(self, outs):
        return outs

    def _wp_kwargs(self) -> dict:
        return {}

    # -- shared plumbing ---------------------------------------------------

    def _exact_counts(self, fc_fields, fc_iseries, arrays, n_out3,
                      n_out2):
        """Exact windowed-operand counts of the operand set about to be
        assembled (the static :func:`phase_counts` table serves the
        dispatch predicates; counting the real arrays cannot lag a
        scheme variation).  Counted on the pre-extension shapes so no
        ring exchange runs for a phase that then falls back."""
        n3 = 0
        n2 = len(_GRID_WIN)
        for a in arrays:
            if a.ndim >= 2 and a.shape[-2:] == (self.ni, self.nj):
                n3, n2 = (n3 + 1, n2) if a.ndim >= 3 else (n3, n2 + 1)
        for f in fc_fields:
            a = getattr(self.fc, f)
            if a.ndim >= 2 and a.shape[-2:] == (self.ni, self.nj):
                n3, n2 = (n3 + 1, n2) if a.ndim >= 3 else (n3, n2 + 1)
        n3 += len(fc_iseries)       # lane-broadcast to 3-D windows
        return n3, n2, n_out3, n_out2

    def _exact_plan(self, phase: str, fc_fields, fc_iseries, arrays,
                    n_out3, n_out2) -> PhasePlan:
        """Window geometry from the exact operand set."""
        counts = self._exact_counts(fc_fields, fc_iseries, arrays,
                                    n_out3, n_out2)
        return plan_from_counts(
            self.cfg, counts + (_PHASE_TMP3[phase],),
            rows=self.rows, lanes=self.lanes,
            t31=_PHASE_T31.get(phase, _T31_DEFAULT))

    def _run(self, phase, phase_fn, fc_fields, fc_iseries, arrays,
             n_out3, n_out2, extra_rep=(), fallback=None):
        """arrays: the phase's own operands (windowed/replicated by shape).
        fc_fields: names of 2-D (im, jm) / (kb, side) forcing fields used;
        fc_iseries: names of (.., im) series (pre-shaped to (.., im, 1)).
        Returns phase_fn's outputs; phase_fn(grid_ns, cfg, fc_ns, *vals).
        ``fallback`` (the XLA phase call) runs instead when this phase's
        exact window geometry does not fit.
        """
        cfg, fc = self.cfg, self.fc
        plan = self._exact_plan(phase, fc_fields, fc_iseries, arrays,
                                n_out3, n_out2)
        if plan.bi < 8 or not _aligned(cfg, self.rows, self.lanes):
            return fallback()
        # request the higher scoped-vmem limit ONLY where the modeled
        # demand needs it (the mesh variant at kb=41-class tiles): an
        # inflated limit measurably relaxes Mosaic's scheduling on
        # kernels that fit 110 (256^2 shardmap ratio 0.888 -> 0.9 class)
        demand = scoped_demand(
            cfg, self._exact_counts(fc_fields, fc_iseries, arrays,
                                    n_out3, n_out2),
            plan, lanes=self.lanes,
            t31=_PHASE_T31.get(phase, _T31_DEFAULT))
        limit = self._vmem_limit(demand)
        dt_ = arrays[0].dtype
        kb = cfg.kb
        garrs = self._garrs()
        fcarrs = [self._prep_fc(f, jnp.asarray(getattr(fc, f), dt_))
                  for f in fc_fields]
        fcarrs += [_shape_iseries(
            self._prep_fc(f, jnp.asarray(getattr(fc, f), dt_)), self.lanes)
            for f in fc_iseries]
        all_in = (garrs + fcarrs + [self._prep_arr(a) for a in arrays]
                  + list(extra_rep))

        n_fc = len(fc_fields) + len(fc_iseries)
        n_arr = len(arrays)

        def body(vals, start):
            gns = _grid_ns(vals[:_N_GRID])
            fcv = vals[_N_GRID:_N_GRID + n_fc]
            fcns = SimpleNamespace(**dict(zip(
                list(fc_fields) + list(fc_iseries), fcv)))
            pvals = vals[_N_GRID + n_fc:_N_GRID + n_fc + n_arr]
            evals = vals[_N_GRID + n_fc + n_arr:]
            return phase_fn(gns, cfg, fcns, *pvals, *evals)

        t3 = jax.ShapeDtypeStruct((kb, self.rows, self.lanes), dt_)
        t2 = jax.ShapeDtypeStruct((self.rows, self.lanes), dt_)
        outs = [t3] * n_out3 + [t2] * n_out2
        return self._post(windowed_phase(cfg, body, all_in, outs,
                                         interpret=self.interpret,
                                         plan=plan, vmem_limit=limit,
                                         **self._wp_kwargs()))

    # -- phases ------------------------------------------------------------

    def uvw(self, u, v, w, dt, utb, vtb, utf, vtf, etb, etf, vfluxb,
            vflux):
        from extpom_tpu.core import stepper

        def fn(gns, cfg, fcns, u, v, w, dt, utb, vtb, utf, vtf, etb, etf,
               vfluxb):
            return stepper.phase_uvw(gns, cfg, u, v, w, dt, utb, vtb,
                                     utf, vtf, etb, etf, vfluxb,
                                     fcns.vflux)

        return self._run("uvw", fn, ("vflux",), (),
                         [u, v, w, dt, utb, vtb, utf, vtf, etb, etf,
                          vfluxb], 3, 0,
                         fallback=lambda: stepper.phase_uvw(
                             self.grid, self.cfg, u, v, w, dt, utb, vtb,
                             utf, vtf, etb, etf, vfluxb, vflux))

    def tke(self, q2, q2b, q2l, q2lb, u, v, w, aam, t, s, rho,
            km, kh, kq, l, dt, etb, etf, wubot, wvbot):
        from extpom_tpu.core import stepper

        def fn(gns, cfg, fcns, *vals):
            (q2, q2b, q2l, q2lb, u, v, w, aam, t, s, rho,
             km, kh, kq, l, dt, etb, etf, wubot, wvbot) = vals
            return stepper.phase_tke(gns, cfg, q2, q2b, q2l, q2lb,
                                     u, v, w, aam, t, s, rho,
                                     km, kh, kq, l, dt, etb, etf,
                                     wubot, wvbot, fcns)

        return self._run("tke", fn, ("wusurf", "wvsurf"), (),
                         [q2, q2b, q2l, q2lb, u, v, w, aam, t, s, rho,
                          km, kh, kq, l, dt, etb, etf, wubot, wvbot],
                         8, 0,
                         fallback=lambda: stepper.phase_tke(
                             self.grid, self.cfg, q2, q2b, q2l, q2lb,
                             u, v, w, aam, t, s, rho, km, kh, kq, l,
                             dt, etb, etf, wubot, wvbot, self.fc))

    def tracer(self, t, tb, s, sb, tclim, sclim, u, ub, v, w, aam, kh,
               dt, etb, etf):
        from extpom_tpu.core import stepper
        cfg = self.cfg

        fc2 = ["wtsurf", "tsurf", "wssurf", "ssurf", "swrad"]
        if cfg.do_restore:
            fc2 += ["trstr", "srstr", "taurstr"]
        iseries: tuple = ()
        if cfg.bc_scheme != "orlanski":
            fc2 += ["tbw", "tbe", "sbw", "sbe"]
            iseries = ("tbs", "tbn", "sbs", "sbn")
        else:
            fc2 += ["tbw", "tbe", "sbw", "sbe"]

        def fn(gns, cfg, fcns, *vals):
            (t, tb, s, sb, tclim, sclim, u, ub, v, w, aam, kh,
             dt, etb, etf) = vals
            if not cfg.do_restore:
                fcns.trstr = fcns.srstr = fcns.taurstr = None
            return stepper.phase_tracer(gns, cfg, t, tb, s, sb,
                                        tclim, sclim, u, ub, v, w, aam,
                                        kh, dt, etb, etf, fcns)

        return self._run("tracer", fn, tuple(fc2), iseries,
                         [t, tb, s, sb, tclim, sclim, u, ub, v, w, aam,
                          kh, dt, etb, etf], 5, 0,
                         fallback=lambda: stepper.phase_tracer(
                             self.grid, self.cfg, t, tb, s, sb, tclim,
                             sclim, u, ub, v, w, aam, kh, dt, etb, etf,
                             self.fc))

    def lat(self, u, v, ub, vb, aam, rho, rmean, dt, d):
        from extpom_tpu.core import stepper
        cfg = self.cfg
        # ramp enters as a (1, lanes) broadcast row so the scalar rides a
        # lane-replicated VMEM block (no SMEM plumbing needed)
        ramp_row = jnp.broadcast_to(
            jnp.asarray(self.fc.ramp, u.dtype), (1, self.lanes))

        def fn(gns, cfg, fcns, *vals):
            (u, v, ub, vb, aam, rho, rmean, dt, d, ramp) = vals
            return stepper.phase_lat(gns, cfg, u, v, ub, vb, aam, rho,
                                     rmean, dt, d, ramp)

        return self._run("lat", fn, (), (),
                         [u, v, ub, vb, aam, rho, rmean, dt, d],
                         5, 0, extra_rep=(ramp_row,),
                         fallback=lambda: stepper.phase_lat(
                             self.grid, self.cfg, u, v, ub, vb, aam,
                             rho, rmean, dt, d, self.fc.ramp))

    def mom(self, u, ub, v, vb, w, advx, advy, drhox, drhoy, km,
            dt, egf, egb, etb, etf, d):
        from extpom_tpu.core import stepper
        cfg = self.cfg

        fc2 = ["e_atmos", "wusurf", "wvsurf"]
        iseries: tuple = ()
        if cfg.bc_scheme == "file":
            fc2 += ["ubw", "ube", "vbw", "vbe"]
            iseries = ("ubs", "ubn", "vbs", "vbn")

        def fn(gns, cfg, fcns, *vals):
            (u, ub, v, vb, w, advx, advy, drhox, drhoy, km,
             dt, egf, egb, etb, etf, d) = vals
            return stepper.phase_mom(gns, cfg, u, ub, v, vb, w,
                                     advx, advy, drhox, drhoy, km, dt,
                                     egf, egb, etb, etf, d, fcns)

        return self._run("mom", fn, tuple(fc2), iseries,
                         [u, ub, v, vb, w, advx, advy, drhox, drhoy,
                          km, dt, egf, egb, etb, etf, d], 4, 2,
                         fallback=lambda: stepper.phase_mom(
                             self.grid, self.cfg, u, ub, v, vb, w,
                             advx, advy, drhox, drhoy, km, dt, egf,
                             egb, etb, etf, d, self.fc))


# ---------------------------------------------------------------------------
# shard_map composition: the SAME fused kernels on halo-ring-extended
# local blocks
# ---------------------------------------------------------------------------

def mesh_ring_halos(cfg: Config, ctx) -> tuple:
    """Ring widths (Hx, Hy) for running the windowed phase kernels on a
    shard_map local block.  Each split axis gets a ring >= the phase
    chain radius (cfg.phase_halo covers it, see module docstring); the
    LANE axis ring is rounded up so the extended lane extent stays
    128-aligned on a real TPU (Mosaic tiling)."""
    hy_unit = cfg.phase_halo
    if hw.backend() == "tpu":
        hy_unit = -(-cfg.phase_halo // 64) * 64
    return (cfg.phase_halo if ctx.px > 1 else 0,
            hy_unit if ctx.py > 1 else 0)


def use_pallas_phases_mesh(cfg: Config, ctx, local_shape) -> bool:
    """Dispatch the fused phase kernels on shard_map local blocks.

    This is the round-4 closure of the one-machine split (VERDICT r3 #1):
    the same per-stripe windowed kernels run on the halo-ring-extended
    local block, composing mesh/extchunk.py's ring-extend trick (one
    ppermute ring per phase) with pallas/phases.py — the analogue of the
    reference's single comm layer serving every kernel
    (parallel_mpi.f:154-351).  "on" forces (interpret off-TPU: tests on
    the virtual CPU mesh); "auto" enables on TPU f32 meshes whose local
    geometry supports aligned windows."""
    if cfg.pallas_phases == "off" or not _HAVE_PLTPU:
        return False
    if ctx is None or not ctx.local or ctx.windowed:
        return False
    if cfg.pallas_phases != "on" and not (
            hw.backend() == "tpu" and cfg.dtype == "float32"):
        return False
    ni, nj = local_shape[-2], local_shape[-1]
    hx, hy = mesh_ring_halos(cfg, ctx)
    return bool(feasible_phases(cfg, rows=ni + 2 * hx, lanes=nj + 2 * hy))


def make_runner(grid, cfg: Config, fc):
    """Resolve the phase dispatcher for the ambient execution regime:
    the global-array runner, the shard_map mesh_runner, or None (XLA
    phase path)."""
    from extpom_tpu.ops import stencil
    ctx = stencil._ctx()
    if use_pallas_phases(cfg):
        return runner(grid, cfg, fc)
    if use_pallas_phases_mesh(cfg, ctx, grid.h.shape):
        return mesh_runner(grid, cfg, fc, ctx)
    return None


class mesh_runner(runner):
    """Phase dispatcher for shard_map local blocks.

    Per phase call: ring-exchange ONE halo ring of width (Hx, Hy) per
    operand (lax.ppermute strips — x first, then y on the already-
    extended block, so corners ride along), run the SAME windowed Pallas
    kernel over the extended block with region masks resolving against
    global indices (the block's traced offset rides into the kernel
    through SMEM), and trim the ring off every output.  Grid metrics in
    denominators get 1.0 beyond the physical domain (the GRID_PAD_ONE
    rule) so all halo arithmetic is finite; every committed cell is
    put-masked on global indices, so results match the global trace
    exactly (tests/test_phases_mesh.py)."""

    def __init__(self, grid, cfg: Config, fc, ctx):
        super().__init__(grid, cfg, fc)
        self.ctx = ctx
        self.ni, self.nj = grid.h.shape[-2], grid.h.shape[-1]
        self.hx, self.hy = mesh_ring_halos(cfg, ctx)
        self.rows = self.ni + 2 * self.hx
        self.lanes = self.nj + 2 * self.hy

    # -- ring plumbing -----------------------------------------------------

    def _vmem_limit(self, demand: int) -> int:
        # the ring-extended variant genuinely exceeds 110 MiB at
        # kb=41-class tiles (117.95 MiB measured, see VMEM_LIMIT note)
        return (VMEM_LIMIT if demand > VMEM_LIMIT_PLAIN - _SCOPED_MARGIN
                else VMEM_LIMIT_PLAIN)

    def _ring(self, a, fill: float = 0.0):
        from extpom_tpu.mesh.extchunk import _ring_extend
        return _ring_extend(a, self.ctx, self.hx, fill=fill, Hy=self.hy)

    def _garrs(self) -> List:
        from extpom_tpu.mesh.padding import _GRID_PAD_ONE

        def prep(name, a):
            return self._ring(a, fill=(1.0 if name in _GRID_PAD_ONE
                                       else 0.0))

        return _grid_arrays(self.grid, prep=prep, lanes=self.lanes)

    def _prep_fc(self, name: str, a):
        from extpom_tpu.mesh.extchunk import _ring_extend_1d
        from extpom_tpu.mesh.padding import (FORCING_I_SERIES,
                                             FORCING_J_SERIES)
        if a.ndim >= 2 and a.shape[-2:] == (self.ni, self.nj):
            return self._ring(a)
        if name in FORCING_J_SERIES and a.shape[-1] == self.nj:
            return _ring_extend_1d(a, self.ctx, self.hy, "y") \
                if self.hy else a
        if name in FORCING_I_SERIES and a.shape[-1] == self.ni:
            return _ring_extend_1d(a, self.ctx, self.hx, "x") \
                if self.hx else a
        return a

    def _prep_arr(self, a):
        return self._ring(a)

    def _post(self, outs):
        ni, nj, hx, hy = self.ni, self.nj, self.hx, self.hy
        return [o[..., hx:hx + ni, hy:hy + nj] for o in outs]

    def _wp_kwargs(self) -> dict:
        off = jnp.stack([
            jnp.asarray(self.ctx.off_i - self.hx, jnp.int32),
            jnp.asarray(self.ctx.off_j - self.hy, jnp.int32)])
        return dict(rows=self.rows, lanes=self.lanes, off=off)
