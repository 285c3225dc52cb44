"""Decomposition invariance: the sharded step must reproduce the
single-device answer (SURVEY.md §4 — the reference can only validate its
decomposition by startup geometry checks; here it's a real oracle)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extpom_tpu.cases.seamount import seamount_model
from extpom_tpu.core import stepper
from extpom_tpu.mesh.sharding import make_mesh, shard_model_arrays


@pytest.mark.parametrize("px,py", [(2, 4), (4, 2), (1, 8)])
def test_decomposition_invariance(px, py):
    if len(jax.devices()) < px * py:
        pytest.skip("needs 8 devices")
    m = seamount_model(im=32, jm=64, kb=7, donate=False, dtype="float64")
    fc = m.forcing_at(1)

    def run3(grid, state, fc, rmean, tclim, sclim):
        st = stepper.step(grid, m.cfg, state, fc, rmean, tclim, sclim,
                          first=True)
        for _ in range(2):
            st = stepper.step(grid, m.cfg, st, fc, rmean, tclim, sclim,
                              first=False)
        return st

    ref = jax.jit(run3)(m.grid, m.state, fc, m.rmean, m.tclim, m.sclim)

    mesh = make_mesh(px, py)
    grid_s, state_s, fc_s, rmean_s, tclim_s, sclim_s = shard_model_arrays(
        m.grid, m.state, fc, mesh, m.rmean, m.tclim, m.sclim)
    out = jax.jit(run3)(grid_s, state_s, fc_s, rmean_s, tclim_s, sclim_s)

    for name in ("el", "ua", "va", "u", "v", "t", "s", "q2", "km"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        # sharded reductions reorder sums over ~1e7-magnitude flux
        # intermediates -> ~1e-16 relative noise per step; structural
        # decomposition bugs show up at O(0.1) (see ops.stencil docstring)
        tol = 1e-9 * max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=tol, err_msg=name)
