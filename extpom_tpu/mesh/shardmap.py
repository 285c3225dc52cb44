"""Explicit shard_map execution of the model step.

The GSPMD path (mesh.sharding) lets the XLA SPMD partitioner discover the
halo exchanges implied by the shifted-slice stencils.  This module is the
EXPLICIT alternative — the direct analogue of the reference's hand-written
communication layer (exchange2d/3d_mpi + order2d/3d_mpi,
parallel_mpi.f:154-480):

* every horizontal field is a per-shard LOCAL block of a 2-D ('x', 'y')
  mesh;
* every ``sft`` shifted read inside the step performs a ``lax.ppermute`` of
  a width-|d| edge strip with the neighbor shard (zero-filled at the
  physical boundary — the ``n_west == -1`` analogue), including the 2-cell
  strips of the 4th-order McCalpin pressure gradient (order2d/3d);
* every region mask / edge write compares GLOBAL indices (local iota +
  block offset), so boundary conditions fire only on the shards that own a
  physical edge;
* the whole step body is the SAME single-source physics
  (core.stepper._step) — the :class:`extpom_tpu.ops.stencil.DomainCtx`
  swaps the communication implementation underneath it.

Compared to GSPMD this pins the communication schedule: each halo permute
is issued at first use of the shifted operand, so XLA can overlap it with
the interior elementwise work that has no data dependence on it (the
interior-first/rim-last scheduling the reference cannot express with its
blocking MPI sends).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:                                    # jax >= 0.8
    from jax import shard_map
except ImportError:                     # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from extpom_tpu.core.config import Config
from extpom_tpu.core.grid import Grid
from extpom_tpu.core.state import State, Forcing
from extpom_tpu.mesh.padding import FORCING_J_SERIES, FORCING_I_SERIES
from extpom_tpu.ops import stencil


def _leaf_spec(name: str, a, im: int, jm: int, px: int, py: int) -> P:
    """PartitionSpec for one named array leaf (same shape rules as
    mesh.sharding._spec_for, plus per-side forcing series)."""
    x = "x" if px > 1 else None
    y = "y" if py > 1 else None
    nd = getattr(a, "ndim", 0)
    shape = getattr(a, "shape", ())
    if nd == 2 and shape == (im, jm):
        return P(x, y)
    if nd == 3 and shape[-2:] == (im, jm):
        return P(None, x, y)
    if name in FORCING_J_SERIES and nd >= 1 and shape[-1] == jm:
        return P(y) if nd == 1 else P(None, y)
    if name in FORCING_I_SERIES and nd >= 1 and shape[-1] == im:
        return P(x) if nd == 1 else P(None, x)
    return P()


def _spec_tree(obj, im, jm, px, py):
    """Same-structure pytree of PartitionSpecs for a dataclass pytree."""
    cls = type(obj)
    return cls(**{f.name: _leaf_spec(f.name, getattr(obj, f.name),
                                     im, jm, px, py)
                  for f in dataclasses.fields(cls)})


def _local_ctx(cfg: Config, px: int, py: int, ni: int, nj: int):
    """DomainCtx for the shard_map body.

    At a TRIVIAL 1x1 mesh (``cfg.trivial_shardmap="auto"``, the default)
    the local block is the whole domain, so the body runs the plain
    global machine — no traced block offsets in the region masks, row-
    sliced O(edge) boundary writes, and the single-device Pallas fast
    paths dispatch instead of their ring-extended mesh variants.  This is
    the analogue of the reference's communication layer degenerating to
    no-op sends at one process (parallel_mpi.f:154-351); results are
    identical (tests/test_shardmap.py covers both settings).
    ``trivial_shardmap="local"`` keeps the explicit machinery so
    tools/meshbench.py can price the mesh-variant overhead on one chip.
    """
    if px == 1 and py == 1 and cfg.trivial_shardmap == "auto":
        if (cfg.im_act or cfg.im) == cfg.im and (cfg.jm_act or cfg.jm) == cfg.jm:
            return None
        return stencil.DomainCtx(im=cfg.im_act or cfg.im,
                                 jm=cfg.jm_act or cfg.jm)
    return stencil.DomainCtx(
        im=cfg.im_act or cfg.im, jm=cfg.jm_act or cfg.jm,
        axis_x="x", axis_y="y", px=px, py=py,
        off_i=lax.axis_index("x") * ni,
        off_j=lax.axis_index("y") * nj)


def make_shardmap_step(mesh: Mesh, grid: Grid, cfg: Config,
                       fc_example: Forcing, donate: bool = False):
    """Build a jitted shard_map step function.

    Returns ``step_fn(grid, state, fc, rmean, tclim, sclim, first=False)``
    operating on arrays sharded over ``mesh`` (use :func:`shard_args`).
    ``cfg.im``/``jm`` must divide the mesh (pad with mesh.padding first).
    """
    from extpom_tpu.core import stepper

    px, py = mesh.shape["x"], mesh.shape["y"]
    im, jm = cfg.im, cfg.jm
    if im % px or jm % py:
        raise ValueError(f"grid {im}x{jm} does not divide mesh {px}x{py}; "
                         "use mesh.padding.pad_model first")
    ni, nj = im // px, jm // py

    grid_spec = _spec_tree(grid, im, jm, px, py)
    fc_spec = _spec_tree(fc_example, im, jm, px, py)
    state_spec = _spec_tree_state(im, jm, px, py)
    r3 = P(None, "x" if px > 1 else None, "y" if py > 1 else None)

    def local_step(grid_l, st_l, fc_l, rmean_l, tclim_l, sclim_l, first):
        with stencil.domain(_local_ctx(cfg, px, py, ni, nj)):
            return stepper._step(grid_l, cfg, st_l, fc_l, rmean_l,
                                 tclim_l, sclim_l, first=first)

    def build(first):
        return shard_map(
            functools.partial(local_step, first=first),
            mesh=mesh,
            in_specs=(grid_spec, state_spec, fc_spec, r3, r3, r3),
            out_specs=state_spec,
            check_rep=False)

    kw = dict(static_argnames=("first",))
    if donate:
        kw["donate_argnums"] = (1,)

    @functools.partial(jax.jit, **kw)
    def step_fn(grid_a, st, fc, rmean, tclim, sclim, first=False):
        return build(first)(grid_a, st, fc, rmean, tclim, sclim)

    return step_fn


def _plan_spec(plan, im, jm, px, py):
    """Spec pytree for a staged :class:`extpom_tpu.forcing.device.
    DevicePlan`: record stacks shard like the fields they feed ((nrec,
    .., im, jm) -> (None, .., x, y); per-side series along their axis),
    window starts replicate."""
    if plan is None:
        return None
    from extpom_tpu.forcing.device import DevicePlan
    x = "x" if px > 1 else None
    y = "y" if py > 1 else None

    def leaf(name, a):
        nd, shape = a.ndim, a.shape
        if nd >= 3 and shape[-2:] == (im, jm):
            return P(*((None,) * (nd - 2)), x, y)
        if name in FORCING_J_SERIES and shape[-1] == jm:
            return P(*((None,) * (nd - 1)), y)
        if name in FORCING_I_SERIES and shape[-1] == im:
            return P(*((None,) * (nd - 1)), x)
        return P()

    return DevicePlan(
        names=plan.names, cadences=plan.cadences, offsets=plan.offsets,
        interp=plan.interp,
        stacks=tuple(leaf(n, a) for n, a in zip(plan.names, plan.stacks)),
        starts=tuple(P() for _ in plan.starts))


def shard_plan(mesh: Mesh, cfg: Config, plan):
    """Device-put a DevicePlan's record stacks with the shard_map layout
    (already-laid-out leaves pass through, so the cached full plan costs
    nothing after the first segment)."""
    if plan is None:
        return None
    import numpy as np
    spec = _plan_spec(plan, cfg.im, cfg.jm,
                      mesh.shape["x"], mesh.shape["y"])
    multi = jax.process_count() > 1

    def put(a, s):
        if (isinstance(a, jax.Array)
                and isinstance(a.sharding, NamedSharding)
                and a.sharding.mesh == mesh):
            return a
        ns = NamedSharding(mesh, s)
        if multi:
            host = np.asarray(a)
            return jax.make_array_from_callback(
                host.shape, ns, lambda idx: host[idx])
        return jax.device_put(a, ns)

    return dataclasses.replace(
        plan,
        stacks=tuple(put(a, s) for a, s in zip(plan.stacks, spec.stacks)),
        starts=tuple(put(a, P()) for a in plan.starts))


def make_shardmap_run(mesh: Mesh, grid: Grid, cfg: Config,
                      fc_example: Forcing, period_days: float,
                      time0_days: float = 0.0):
    """Build a segment runner with the WHOLE ``run_steps`` scan inside the
    shard_map body — one device dispatch per segment on the explicit
    ppermute path, the reference's host-round-trip-free ``do iint=1,iend``
    loop (pom.f:16-22).  Collectives are legal under ``lax.scan``, so the
    chunked halo-ring external loop and the mesh-composed Pallas phase
    kernels both dispatch inside the scan; staged DevicePlan forcing
    series ride in sharded like the fields they feed and are interpolated
    on device inside the scan.

    Returns ``run(grid, st, fc, rmean, tclim, sclim, iint0, n_steps,
    first=False, plan=None)`` — the :func:`extpom_tpu.core.stepper.
    make_run_fn` contract."""
    from extpom_tpu.core import stepper

    px, py = mesh.shape["x"], mesh.shape["y"]
    im, jm = cfg.im, cfg.jm
    if im % px or jm % py:
        raise ValueError(f"grid {im}x{jm} does not divide mesh {px}x{py}; "
                         "use mesh.padding.pad_model first")
    ni, nj = im // px, jm // py

    grid_spec = _spec_tree(grid, im, jm, px, py)
    fc_spec = _spec_tree(fc_example, im, jm, px, py)
    state_spec = _spec_tree_state(im, jm, px, py)
    r3 = P(None, "x" if px > 1 else None, "y" if py > 1 else None)
    cache = {}

    def run(grid_a, st, fc, rmean, tclim, sclim, iint0, n_steps,
            first=False, plan=None):
        key = (int(n_steps), bool(first),
               jax.tree_util.tree_structure(plan))
        if key not in cache:
            plan_spec = _plan_spec(plan, im, jm, px, py)

            def local_run(grid_l, st_l, fc_l, rmean_l, tclim_l, sclim_l,
                          iint0_l, plan_l):
                with stencil.domain(_local_ctx(cfg, px, py, ni, nj)):
                    return stepper.run_steps(
                        grid_l, cfg, st_l, fc_l, rmean_l, tclim_l,
                        sclim_l, iint0_l, int(n_steps), period_days,
                        time0_days, first=bool(first), plan=plan_l)

            sm = shard_map(
                local_run, mesh=mesh,
                in_specs=(grid_spec, state_spec, fc_spec, r3, r3, r3,
                          P(), plan_spec),
                out_specs=state_spec, check_rep=False)
            cache[key] = jax.jit(sm)
        return cache[key](grid_a, st, fc, rmean, tclim, sclim,
                          jnp.asarray(iint0), plan)

    return run


def _spec_tree_state(im, jm, px, py):
    from extpom_tpu.core.state import FIELDS_2D
    x = "x" if px > 1 else None
    y = "y" if py > 1 else None
    return State(**{f.name: (P(x, y) if f.name in FIELDS_2D
                             else P(None, x, y))
                    for f in dataclasses.fields(State)})


def shard_args(mesh: Mesh, cfg: Config, grid: Grid, st: State, fc: Forcing,
               *extra):
    """Device-put (grid, state, fc, *extra) with the shard_map layout."""
    im, jm = cfg.im, cfg.jm
    px, py = mesh.shape["x"], mesh.shape["y"]

    import numpy as np
    multi = jax.process_count() > 1

    def put_leaf(a, spec):
        if (isinstance(a, jax.Array)
                and isinstance(a.sharding, NamedSharding)
                and a.sharding.mesh == mesh):
            return a       # already laid out over this mesh
        ns = NamedSharding(mesh, spec)
        if multi:
            host = np.asarray(a)
            return jax.make_array_from_callback(
                host.shape, ns, lambda idx: host[idx])
        return jax.device_put(a, ns)

    def put_tree(obj):
        if dataclasses.is_dataclass(obj):
            spec = _spec_tree(obj, im, jm, px, py)
            return type(obj)(**{
                f.name: put_leaf(getattr(obj, f.name),
                                 getattr(spec, f.name))
                for f in dataclasses.fields(obj)})
        a = jnp.asarray(obj)
        return put_leaf(a, _leaf_spec("", a, im, jm, px, py))

    out = [put_tree(grid), put_tree(st), put_tree(fc)]
    out.extend(put_tree(e) for e in extra)
    return tuple(out)
