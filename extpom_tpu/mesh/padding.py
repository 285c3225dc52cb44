"""Pad-and-mask support for ragged (non-divisible) mesh decompositions.

The reference handles a grid that does not divide evenly over the process
mesh by shrinking the edge tiles (parallel_mpi.f:88-105).  JAX's
``NamedSharding`` requires equal blocks, so the equivalent here is
pad-and-mask: every horizontal array is padded up to the next multiple of
the mesh extents, the padded cells are land/zero, and the stencil layer
resolves every region bound, edge write, and ``row``/``col`` read against
the ACTIVE extents (``Config.im_act``/``jm_act`` via
:class:`extpom_tpu.ops.stencil.DomainCtx`).  Because the committed regions
of every kernel mirror the reference's loop bounds, no committed cell ever
reads a pad cell — the padded run is bit-identical to the unpadded one on
the active region.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid
from extpom_tpu.core.state import State, Forcing

# grid metric fields that sit in denominators somewhere: pad with 1 to keep
# pad-cell arithmetic finite (the values are never committed)
_GRID_PAD_ONE = {"dx", "dy", "h", "art", "aru", "arv"}
# per-side forcing series orientation (which horizontal axis they follow)
FORCING_J_SERIES = {"elw", "ele", "uabw", "uabe", "vabw", "vabe",
                    "tbw", "tbe", "sbw", "sbe", "ubw", "ube", "vbw", "vbe"}
FORCING_I_SERIES = {"els", "eln", "vabs", "vabn", "uabs", "uabn",
                    "tbs", "tbn", "sbs", "sbn", "vbs", "vbn", "ubs", "ubn"}


def padded_dims(im: int, jm: int, px: int, py: int) -> Tuple[int, int]:
    return -(-im // px) * px, -(-jm // py) * py


def _pad_hv(a: jnp.ndarray, imp: int, jmp: int, fill: float) -> jnp.ndarray:
    """Pad the trailing (im, jm) axes of a 2-D/3-D array to (imp, jmp)."""
    im, jm = a.shape[-2], a.shape[-1]
    pad = [(0, 0)] * (a.ndim - 2) + [(0, imp - im), (0, jmp - jm)]
    return jnp.pad(a, pad, constant_values=fill)


def pad_grid(grid: Grid, cfg: Config, imp: int, jmp: int) -> Grid:
    im, jm = cfg.im, cfg.jm
    out = {}
    for f in dataclasses.fields(Grid):
        a = getattr(grid, f.name)
        if a.ndim >= 2 and a.shape[-2:] == (im, jm):
            fill = 1.0 if f.name in _GRID_PAD_ONE else 0.0
            out[f.name] = _pad_hv(a, imp, jmp, fill)
        else:
            out[f.name] = a
    return Grid(**out)


def _pad_tree(obj, fields, im, jm, imp, jmp, kb):
    out = {}
    for f in fields:
        a = getattr(obj, f.name)
        if hasattr(a, "ndim") and a.ndim >= 2 and a.shape[-2:] == (im, jm):
            out[f.name] = _pad_hv(a, imp, jmp, 0.0)
        elif f.name in FORCING_J_SERIES and a.shape[-1] == jm:
            out[f.name] = jnp.pad(
                a, [(0, 0)] * (a.ndim - 1) + [(0, jmp - jm)])
        elif f.name in FORCING_I_SERIES and a.shape[-1] == im:
            out[f.name] = jnp.pad(
                a, [(0, 0)] * (a.ndim - 1) + [(0, imp - im)])
        else:
            out[f.name] = a
    return out


def pad_state(st: State, cfg: Config, imp: int, jmp: int) -> State:
    return State(**_pad_tree(st, dataclasses.fields(State),
                             cfg.im, cfg.jm, imp, jmp, cfg.kb))


def pad_forcing(fc: Forcing, cfg: Config, imp: int, jmp: int) -> Forcing:
    return Forcing(**_pad_tree(fc, dataclasses.fields(Forcing),
                               cfg.im, cfg.jm, imp, jmp, cfg.kb))


def unpad(a, cfg: Config):
    """Slice a padded array back to the active region."""
    ia = cfg.im_act or cfg.im
    ja = cfg.jm_act or cfg.jm
    if hasattr(a, "ndim") and a.ndim >= 2:
        return a[..., :ia, :ja]
    return a


def pad_model(m, px: int, py: int) -> None:
    """Pad a :class:`extpom_tpu.core.model.Model` in place so its arrays
    shard evenly over a (px, py) mesh.  No-op if already divisible."""
    from extpom_tpu.core import stepper

    cfg = m.cfg
    if cfg.im_act is not None:
        raise ValueError("model is already padded")
    imp, jmp = padded_dims(cfg.im, cfg.jm, px, py)
    if (imp, jmp) == (cfg.im, cfg.jm):
        return
    new_cfg = cfg.replace(im=imp, jm=jmp, im_act=cfg.im, jm_act=cfg.jm)
    m.grid = pad_grid(m.grid, cfg, imp, jmp)
    m.state = pad_state(m.state, cfg, imp, jmp)
    m.base_forcing = pad_forcing(m.base_forcing, cfg, imp, jmp)
    for name in ("rmean", "tclim", "sclim"):
        a = getattr(m, name)
        if a.ndim >= 2 and a.shape[-2:] == (cfg.im, cfg.jm):
            setattr(m, name, _pad_hv(a, imp, jmp, 0.0))
    m.cfg = new_cfg
    m._step = stepper.make_step_fn(new_cfg, donate=m._donate)
    m._run_fn = None
    m._plan = None
