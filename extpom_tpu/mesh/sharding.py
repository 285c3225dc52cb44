"""Device-mesh sharding of the model pytrees.

Replaces the reference's 2-D horizontal domain decomposition
(``distribute_mpi``, parallel_mpi.f:34-122) and its hand-written halo
exchanges (exchange2d/3d_mpi, order2d/3d_mpi, parallel_mpi.f:154-480):

* the (im, jm) axes of every horizontal field are sharded over a 2-D
  ``jax.sharding.Mesh`` with axes ('x', 'y');
* the vertical kb axis is never sharded (the tridiagonal solves are
  sequential in k, solver.f:1394-1413 — same reason the reference keeps k
  local);
* the shifted-slice stencils of ``ops.stencil`` lower to XLA
  collective-permutes of 1-cell edge strips (2-cell for the McCalpin PG)
  under the SPMD partitioner, which also overlaps them with interior
  compute — no explicit exchange calls anywhere;
* ragged tiles (im % px != 0) are handled by GSPMD padding, replacing the
  reference's shrunken edge tiles (parallel_mpi.f:88-105).

Unlike the reference, the decomposition is a runtime choice (pom.h makes it
a compile-time constant, pom.h_dist:22-28) and any (px, py) gives bitwise
the same answer as a single device.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from extpom_tpu.core.grid import Grid
from extpom_tpu.core.state import State, Forcing


def make_mesh(px: int, py: int,
              devices: Optional[list] = None) -> Mesh:
    """A 2-D device mesh with axes ('x', 'y') — the analogue of the
    reference's nproc_x × nproc_y rank grid (parallel_mpi.f:54-75)."""
    devices = jax.devices() if devices is None else devices
    if px * py > len(devices):
        raise ValueError(f"mesh {px}x{py} needs {px*py} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:px * py]).reshape(px, py)
    return Mesh(dev, ("x", "y"))


def _spec_for(a: jax.Array, im: int, jm: int, mesh: Mesh) -> P:
    """Shard only true horizontal fields — trailing dims exactly (im, jm):
    (im,jm)->('x','y'); (kb,im,jm)->(None,'x','y').  Everything else
    (vertical 1-D arrays, per-side boundary arrays (jm,)/(kb,jm)/(im,)/
    (kb,im), scalars) is replicated, like the reference's per-rank copies
    of z/zz and boundary buffers."""
    # size-1 mesh axes are dropped from the spec: P('x','y') with |x|=1 is
    # semantically identical to P(None,'y') but takes a different (observed
    # buggy) SPMD partitioner path in this environment
    x = "x" if mesh.shape["x"] > 1 else None
    y = "y" if mesh.shape["y"] > 1 else None
    if a.ndim == 2 and a.shape == (im, jm):
        return P(x, y)
    if a.ndim == 3 and a.shape[-2:] == (im, jm):
        return P(None, x, y)
    return P()


def shard_pytree(tree, mesh: Mesh, im: int, jm: int):
    """Device-put every array leaf with its horizontal sharding.

    Under multi-process execution the host data is replicated (every
    process builds the same global arrays) and each process materializes
    only its addressable shards (distribute_mpi analogue)."""
    multi = jax.process_count() > 1

    def put(a):
        a = jax.numpy.asarray(a)
        if (isinstance(a, jax.Array)
                and isinstance(a.sharding, NamedSharding)
                and a.sharding.mesh == mesh):
            return a       # already laid out over this mesh
        ns = NamedSharding(mesh, _spec_for(a, im, jm, mesh))
        if multi:
            host = np.asarray(a)
            return jax.make_array_from_callback(
                host.shape, ns, lambda idx: host[idx])
        return jax.device_put(a, ns)
    return jax.tree_util.tree_map(put, tree)


def shard_model_arrays(grid: Grid, state: State, fc: Forcing, mesh: Mesh,
                       *extra, allow_ragged: bool = True):
    """Shard (grid, state, forcing, *extra 3-D fields) over ``mesh``.

    Non-divisible (ragged) grids are supported: GSPMD pads the trailing
    shard internally, the equivalent of the reference's shrunken edge tiles
    (parallel_mpi.f:88-105).  Pass ``allow_ragged=False`` to require exact
    divisibility."""
    im, jm = grid.im, grid.jm
    px, py = mesh.shape["x"], mesh.shape["y"]
    if (im % px or jm % py) and not allow_ragged:
        raise ValueError(f"grid {im}x{jm} not divisible by mesh {px}x{py}")
    if (px > 1 and im // px < 8) or (py > 1 and jm // py < 8):
        # below 8 cells/shard the halo dominates the tile (useless for
        # perf) and the jaxlib-0.9 CPU multi-device runtime exhibits a
        # data race corrupting halo exchanges at 4-cell minor-axis shards
        raise ValueError(
            f"shards too small: {im//px}x{jm//py} cells/shard (need >= 8)")
    out = [shard_pytree(grid, mesh, im, jm), shard_pytree(state, mesh, im, jm),
           shard_pytree(fc, mesh, im, jm)]
    out.extend(shard_pytree(e, mesh, im, jm) for e in extra)
    return tuple(out)
