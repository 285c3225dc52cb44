"""Ragged (non-divisible) decomposition via pad-and-mask
(extpom_tpu.mesh.padding) — the analogue of the reference's shrunken edge
tiles (parallel_mpi.f:88-105).

Three guarantees are tested at 33x65 (neither axis divides the 2x4 mesh):

* the padded single-device run matches the unpadded one on the active
  region (shape-dependent XLA fusion allows ~1e-13 roundoff; a structural
  bug shows at O(0.1));
* NO active-region cell ever reads a pad cell — proven by poisoning the pad
  region with NaN and checking the active region stays finite;
* the padded 2x4-sharded run matches the padded single-device run.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extpom_tpu.cases.seamount import seamount_model
from extpom_tpu.core import stepper
from extpom_tpu.core.state import State
from extpom_tpu.mesh.padding import pad_model, unpad, padded_dims
from extpom_tpu.mesh.sharding import make_mesh, shard_model_arrays

IM, JM, KB = 33, 65, 7
CHECK = ("el", "ua", "va", "u", "v", "t", "s", "q2", "km")


def _run3(m):
    for i in range(3):
        m.step_once()
    return m.state


def test_padded_dims():
    assert padded_dims(33, 65, 2, 4) == (34, 68)
    assert padded_dims(32, 64, 2, 4) == (32, 64)


def test_pad_and_mask_matches_unpadded():
    ref = seamount_model(im=IM, jm=JM, kb=KB, dtype="float64", donate=False)
    ref_st = _run3(ref)

    m = seamount_model(im=IM, jm=JM, kb=KB, dtype="float64", donate=False)
    pad_model(m, 2, 4)
    assert (m.cfg.im, m.cfg.jm) == (34, 68)
    assert (m.cfg.im_act, m.cfg.jm_act) == (IM, JM)
    st = _run3(m)

    for name in CHECK:
        a = np.asarray(getattr(ref_st, name))
        b = np.asarray(unpad(getattr(st, name), m.cfg))
        tol = 1e-12 * max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=tol, err_msg=name)
    # pad cells of prognostic fields stay exactly zero
    el = np.asarray(st.el)
    assert np.all(el[IM:, :] == 0.0) and np.all(el[:, JM:] == 0.0)


def test_no_pad_cell_is_read():
    m = seamount_model(im=IM, jm=JM, kb=KB, dtype="float64", donate=False)
    pad_model(m, 2, 4)
    imp, jmp = m.cfg.im, m.cfg.jm

    def poison(a):
        a = np.asarray(a).copy()
        if a.ndim >= 2 and a.shape[-2:] == (imp, jmp):
            a[..., IM:, :] = np.nan
            a[..., :, JM:] = np.nan
        return a

    m.state = State(**{f.name: jnp.asarray(poison(getattr(m.state, f.name)))
                       for f in dataclasses.fields(State)})
    st = _run3(m)
    for f in dataclasses.fields(State):
        a = np.asarray(unpad(getattr(st, f.name), m.cfg))
        assert np.all(np.isfinite(a)), f"pad NaN leaked into {f.name}"


def test_ragged_decomposition_invariance():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    m1 = seamount_model(im=IM, jm=JM, kb=KB, dtype="float64", donate=False)
    pad_model(m1, 2, 4)
    ref_st = _run3(m1)

    m = seamount_model(im=IM, jm=JM, kb=KB, dtype="float64", donate=False)
    pad_model(m, 2, 4)
    mesh = make_mesh(2, 4)
    grid_s, state_s, fc0, rmean_s, tclim_s, sclim_s = shard_model_arrays(
        m.grid, m.state, m.forcing_at(1), mesh, m.rmean, m.tclim, m.sclim)

    @functools.partial(jax.jit, static_argnames=("first",))
    def step_fn(grid, st, fc, rmean, tclim, sclim, first=False):
        return stepper.step(grid, m.cfg, st, fc, rmean, tclim, sclim,
                            first=first)

    from extpom_tpu.mesh.sharding import shard_pytree
    st = state_s
    for i in range(3):
        fc_s = shard_pytree(m.forcing_at(i + 1), mesh, m.cfg.im, m.cfg.jm)
        st = step_fn(grid_s, st, fc_s, rmean_s, tclim_s, sclim_s,
                     first=(i == 0))

    for name in CHECK:
        a = np.asarray(getattr(ref_st, name))
        b = np.asarray(getattr(st, name))
        tol = 1e-9 * max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=tol, err_msg=name)


def test_ragged_orlanski_scheme():
    """Pad-and-mask ragged decomposition with bc_scheme='orlanski': the
    active-edge radiation writes must land on the true domain edges, not
    the pad edges."""
    import numpy as np
    from extpom_tpu.cases.seamount import seamount_model
    from extpom_tpu.mesh.padding import pad_model, unpad
    from extpom_tpu.mesh.sharding import make_mesh

    kw = dict(im=33, jm=65, kb=7, bc_scheme="orlanski")
    ref = seamount_model(dtype="float64", donate=False, **kw)
    for _ in range(3):
        ref.step_once()

    m = seamount_model(dtype="float64", donate=False, **kw)
    pad_model(m, 2, 4)
    if len(jax.devices()) >= 8:
        m.shard(make_mesh(2, 4), mode="gspmd")
    for _ in range(3):
        m.step_once()
    for name in ("el", "ua", "va", "u", "v", "t", "s", "q2"):
        a = np.asarray(getattr(ref.state, name))
        b = np.asarray(unpad(getattr(m.state, name), m.cfg))
        tol = 1e-10 * max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=tol, err_msg=name)
