"""VMEM-resident external-mode loop (Pallas TPU kernel).

The external (2-D barotropic) mode is the hottest loop in the model: the
reference runs it ``isplit`` (~30) times per internal step, each substep a
handful of 5-point stencils over the (im, jm) plane punctuated by halo
exchanges (advance.f:205-353, SURVEY.md §3.2).  Under plain XLA each substep
re-reads and re-writes the 2-D state from HBM; with ~35 live fields that is
~isplit x 35 x im x jm x 4 bytes of HBM traffic per internal step.

This kernel runs the WHOLE loop on-chip: every 2-D field is brought into
VMEM once, all ``isplit`` substeps execute VMEM-resident straight-line VPU
code, and only the final carry goes back to HBM — the HBM traffic drops to
one read + one write of the state regardless of isplit.

The physics is not re-implemented: the kernel body calls the exact same
:func:`extpom_tpu.core.stepper.mode_external_substep` used by the XLA path
(all its stencil ops are jnp expressions that Mosaic lowers), so the two
paths are maintained by a single source of truth and agree to f32 roundoff.

Applicability: the whole 2-D working set must fit in VMEM (128 MiB on
v5e), i.e. up to 512x512 f32 with headroom for temporaries.
:func:`fits_vmem` gates the dispatch; the stepper falls back to the XLA
``fori_loop`` otherwise.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on all platforms; kernels interpret on CPU
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    _HAVE_PLTPU = False

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid
from extpom_tpu.core import hw


# field lists; order defines the kernel's positional ref layout
CARRY_FIELDS = ("el", "elb", "ua", "uab", "va", "vab", "etf", "egf",
                "utf", "vtf", "advua", "advva", "wubot", "wvbot")
GRID_FIELDS = ("h", "dx", "dy", "art", "aru", "arv", "cor",
               "fsm", "dum", "dvm", "cbc")
AUX_FIELDS = ("adx2d", "ady2d", "drx2d", "dry2d", "aam2d")
FC_2D_FIELDS = ("wusurf", "wvsurf", "vflux", "e_atmos")
# 1-D open-boundary series used by bcond idx 1/2 (bounds_forcing.f:18-83);
# j-sides have length jm, i-sides length im
FC_1D_J = ("elw", "ele", "uabw", "uabe", "vabw", "vabe")
FC_1D_I = ("els", "eln", "vabs", "vabn", "uabs", "uabn")


def device_vmem_budget() -> int:
    """Input-set VMEM budget derived from the attached device kind.

    v5e has 128 MiB VMEM and a 40 MiB input set (512x512 f32) is measured
    working on-chip (ROOFLINE.md round 2); the same holds for later
    generations (v5p/v6) whose VMEM is >= 128 MiB.  Older chips (v2-v4)
    have ~16-32 MiB VMEM, where only a ~11 MiB input set (256x256 f32)
    leaves Mosaic headroom.  Unknown/CPU devices get the conservative
    number (auto dispatch never selects Pallas off-TPU anyway)."""
    global _BUDGET_LOGGED
    kind = hw.device_kind().lower()
    if any(tag in kind for tag in ("v5", "v6", "v7")):
        budget = 40 * 2 ** 20
    else:
        budget = 11 * 2 ** 20
        if hw.backend() == "tpu" and not _BUDGET_LOGGED:
            # an unrecognized TPU generation silently falls to the
            # conservative budget (losing the 512^2 VMEM fast path) —
            # say so once instead of silently
            _BUDGET_LOGGED = True
            print(f"# extpom_tpu: unrecognized TPU kind {kind!r}; using "
                  f"conservative {budget >> 20} MiB VMEM input budget",
                  flush=True)
    return budget


_BUDGET_LOGGED = False


def fits_vmem(cfg: Config, budget_bytes: int | None = None) -> bool:
    """True when the kernel's VMEM-resident 2-D working set fits.

    ~34 input blocks + 14 aliased outputs + transients; f32 only (f64 is
    the CPU validation dtype and doubles the footprint past VMEM).  The
    budget is for the INPUT blocks alone and defaults to the attached
    device's :func:`device_vmem_budget` (40 MiB on v5e+: measured working
    at 512x512, 2.46 ms/step vs 3.23 ms XLA, ROOFLINE.md round 2)."""
    if budget_bytes is None:
        budget_bytes = device_vmem_budget()
    n_blocks = (len(CARRY_FIELDS) + len(GRID_FIELDS) + len(AUX_FIELDS)
                + len(FC_2D_FIELDS))
    per = cfg.im * cfg.jm * 4
    return cfg.dtype == "float32" and n_blocks * per <= budget_bytes


def _lean_kernel(cfg: Config) -> bool:
    """Skip the mask cache + peeled first substep inside the whole-grid
    kernel when they don't fit NEXT TO the live set.

    mode 2 runs advave's bottom-stress + curvature branches every substep
    — with the cached masks and the peeled body its 512^2 scoped-vmem
    peak exceeds any limit (125 MiB live at a 120 MiB cap, measured r4);
    with just the hoisted metrics (kept either way) it fits AND runs
    faster than round 3 (2.31 vs 2.40 ms/step, 80 % of roofline).
    mode 3's external loop is leaner and keeps everything at every size
    that passes fits_vmem."""
    return cfg.mode == 2 and not fits_vmem(cfg, 30 * 2 ** 20)


def use_pallas_ext(cfg: Config) -> bool:
    """Static dispatch decision, resolved at trace time."""
    from extpom_tpu.ops import stencil
    ctx = stencil._ctx()
    if ctx is not None and ctx.local:
        # shard_map local mode: the stencils must stay jnp so sft can issue
        # its ppermute halo exchanges
        return False
    if cfg.pallas_ext == "off" or not _HAVE_PLTPU:
        return False
    if cfg.pallas_ext == "on":
        return True
    # auto: single-device TPU only — under a multi-device mesh the stencil
    # ops must stay XLA so GSPMD can insert halo collective-permutes
    return (hw.backend() == "tpu" and hw.device_count() == 1
            and fits_vmem(cfg))


def _chunk_kernel(cfg: Config, C: int, n_in: int, *refs):
    """Shard_map chunk variant of :func:`_kernel`: run ``C`` substeps on a
    halo-ring-extended LOCAL block held whole in VMEM, with region masks
    resolving against global indices (the block's traced offset and the
    chunk's first substep index ride in through SMEM)."""
    from extpom_tpu.core import stepper
    from extpom_tpu.ops import stencil

    ins, outs = refs[:n_in], refs[n_in:]
    it = iter(ins)

    carry_vals = [next(it)[:] for _ in CARRY_FIELDS]
    grid_vals = {f: next(it)[:] for f in GRID_FIELDS}
    aux_vals = tuple(next(it)[:] for _ in AUX_FIELDS)
    fc_vals = {f: next(it)[:] for f in FC_2D_FIELDS}
    for f in FC_1D_J + FC_1D_I:
        fc_vals[f] = next(it)[0]         # (1, n) block -> (n,)
    smem_ref = next(it)                  # (1, 4): ramp, iext0, goff_i/j
    fc_vals["ramp"] = smem_ref[0, 0]
    iext0 = smem_ref[0, 1].astype(jnp.int32)
    goff_i = smem_ref[0, 2].astype(jnp.int32)
    goff_j = smem_ref[0, 3].astype(jnp.int32)

    grid_ns = SimpleNamespace(**grid_vals)
    fc_ns = SimpleNamespace(**fc_vals)
    c = stepper.ExtCarry(*carry_vals)

    im_act = cfg.im_act or cfg.im
    jm_act = cfg.jm_act or cfg.jm
    with stencil.domain(stencil.DomainCtx(
            im=im_act, jm=jm_act, windowed=True,
            off_i=goff_i, off_j=goff_j)), stencil.mask_caching():
        em = stepper.ext_precompute(grid_ns)
        # rolled loop with the first substep peeled to prime the mask
        # cache (see _kernel); a C-way Python unroll makes the Mosaic
        # program C x bigger and dominates compile time
        unroll = max(1, min(cfg.ext_unroll, C))
        if unroll >= C:
            for s in range(C):
                c = stepper.mode_external_substep(
                    grid_ns, cfg, c, iext0 + s, fc_ns, aux_vals, em=em)
        else:
            c = stepper.mode_external_substep(
                grid_ns, cfg, c, iext0, fc_ns, aux_vals, em=em)

            def body(s, c):
                return stepper.mode_external_substep(
                    grid_ns, cfg, c, iext0 + s, fc_ns, aux_vals, em=em)

            c = jax.lax.fori_loop(1, C, body, c, unroll=unroll)

    for ref, val in zip(outs, c):
        ref[:] = val


def run_external_chunk_vmem(grid_ns, cfg: Config, c0, fc_ns, aux, C: int,
                            iext0, goff, interpret: bool = False):
    """Run ``C`` external substeps on a halo-ring-extended local block in
    one VMEM-resident Pallas kernel (the shard_map composition of this
    module: mesh/extchunk.py ring-exchanges once per chunk, this kernel
    replaces its XLA fori body).  ``grid_ns``/``fc_ns`` are the extended
    grid/forcing (Grid dataclass or namespace); ``goff`` the traced
    global (i, j) index of extended-block cell (0, 0)."""
    from extpom_tpu.core import stepper

    dt_ = c0.el.dtype
    R, L = c0.el.shape[-2], c0.el.shape[-1]

    inputs = list(c0)
    inputs += [getattr(grid_ns, f) for f in GRID_FIELDS]
    inputs += list(aux)
    inputs += [getattr(fc_ns, f) for f in FC_2D_FIELDS]
    inputs += [jnp.asarray(getattr(fc_ns, f), dt_).reshape(1, -1)
               for f in FC_1D_J + FC_1D_I]
    smem_in = jnp.stack([
        jnp.asarray(fc_ns.ramp, dt_),
        jnp.asarray(iext0, dt_),
        jnp.asarray(goff[0], dt_),
        jnp.asarray(goff[1], dt_)]).reshape(1, 4)
    inputs.append(smem_in)
    n_in = len(inputs)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = ([vmem] * (len(CARRY_FIELDS) + len(GRID_FIELDS)
                          + len(AUX_FIELDS) + len(FC_2D_FIELDS)
                          + len(FC_1D_J) + len(FC_1D_I))
                + [smem])
    out_shape = tuple(jax.ShapeDtypeStruct((R, L), dt_)
                      for _ in CARRY_FIELDS)

    kernel = functools.partial(_chunk_kernel, cfg, C, n_in)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=tuple(vmem for _ in CARRY_FIELDS),
        input_output_aliases={i: i for i in range(len(CARRY_FIELDS))},
        interpret=interpret,
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=112 * 2 ** 20)
            if (_HAVE_PLTPU and not interpret) else None),
    )(*inputs)
    return stepper.ExtCarry(*outs)


def _kernel(cfg: Config, interpret: bool, n_in: int, *refs):
    """Kernel body: load 2-D state into VMEM values, run the isplit loop.

    refs = inputs (CARRY | GRID | AUX | FC_2D | FC_1D_J | FC_1D_I | ramp)
    then the 14 carry outputs.
    """
    from extpom_tpu.core import stepper  # local import: cycle-free

    ins, outs = refs[:n_in], refs[n_in:]
    it = iter(ins)

    carry_vals = [next(it)[:] for _ in CARRY_FIELDS]
    grid_vals = {f: next(it)[:] for f in GRID_FIELDS}
    aux_vals = tuple(next(it)[:] for _ in AUX_FIELDS)
    fc_vals = {f: next(it)[:] for f in FC_2D_FIELDS}
    for f in FC_1D_J + FC_1D_I:
        fc_vals[f] = next(it)[0]         # (1, n) block -> (n,)
    ramp_ref = next(it)
    fc_vals["ramp"] = ramp_ref[0, 0]

    grid_ns = SimpleNamespace(**grid_vals)
    fc_ns = SimpleNamespace(**fc_vals)
    c = stepper.ExtCarry(*carry_vals)

    from extpom_tpu.ops import stencil
    import contextlib

    # loop-invariant derived metrics + region masks live in VMEM across
    # the whole loop: the first substep is PEELED under mask_caching so
    # every put/set mask becomes a pre-loop value the rolled body
    # closure-captures instead of rebuilding (iota + compares) every
    # substep.  _lean_kernel configs skip both (no VMEM room next to the
    # mode-2 live set at 512^2).
    lean = _lean_kernel(cfg)
    with (contextlib.nullcontext() if lean else stencil.mask_caching()):
        em = stepper.ext_precompute(grid_ns)

        # rolled loop: keeps the Mosaic program ~isplit x smaller than a
        # Python unroll, which dominates compile time at production grid
        # sizes (ext_unroll > 1 trades compile time back for schedule
        # freedom)
        unroll = max(1, min(cfg.ext_unroll, cfg.isplit))
        if unroll >= cfg.isplit:
            for iext in range(1, cfg.isplit + 1):
                c = stepper.mode_external_substep(
                    grid_ns, cfg, c, jnp.int32(iext), fc_ns, aux_vals,
                    em=em)
        else:
            start = 1
            if not lean:
                # peel the first substep to prime the mask cache; the
                # lean variant keeps the r3 shape (peel + loop body
                # coexisting raises the scoped-vmem peak)
                c = stepper.mode_external_substep(
                    grid_ns, cfg, c, jnp.int32(1), fc_ns, aux_vals,
                    em=em)
                start = 2

            def body(i, c):
                return stepper.mode_external_substep(
                    grid_ns, cfg, c, i, fc_ns, aux_vals, em=em)

            c = jax.lax.fori_loop(start, cfg.isplit + 1, body, c,
                                  unroll=unroll)

    for ref, val in zip(outs, c):
        ref[:] = val


def run_external_loop(grid: Grid, cfg: Config, c0, fc, aux,
                      interpret: bool = False):
    """Run all isplit external substeps in one VMEM-resident kernel.

    ``c0`` is the stepper's ExtCarry; ``aux`` the (adx2d, ady2d, drx2d,
    dry2d, aam2d) tuple; returns the final ExtCarry.  Bit-compatible with
    the XLA fori_loop path up to f32 fusion differences.
    """
    dt_ = c0.el.dtype
    im, jm = cfg.im, cfg.jm

    inputs = list(c0)
    inputs += [getattr(grid, f) for f in GRID_FIELDS]
    inputs += list(aux)
    inputs += [getattr(fc, f) for f in FC_2D_FIELDS]
    inputs += [jnp.asarray(getattr(fc, f), dt_).reshape(1, -1)
               for f in FC_1D_J + FC_1D_I]
    inputs.append(jnp.asarray(fc.ramp, dt_).reshape(1, 1))
    n_in = len(inputs)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = ([vmem] * (len(CARRY_FIELDS) + len(GRID_FIELDS)
                          + len(AUX_FIELDS) + len(FC_2D_FIELDS)
                          + len(FC_1D_J) + len(FC_1D_I))
                + [smem])
    out_specs = tuple(vmem for _ in CARRY_FIELDS)
    out_shape = tuple(jax.ShapeDtypeStruct((im, jm), dt_)
                      for _ in CARRY_FIELDS)

    kernel = functools.partial(_kernel, cfg, interpret, n_in)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        # donate the carry blocks into the outputs: halves VMEM pressure
        input_output_aliases={i: i for i in range(len(CARRY_FIELDS))},
        interpret=interpret,
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=112 * 2 ** 20)
            if (_HAVE_PLTPU and not interpret) else None),
    )(*inputs)

    from extpom_tpu.core import stepper
    return stepper.ExtCarry(*outs)
