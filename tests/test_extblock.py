"""Chunked grid-blocked external loop (ops.extblock): halo-window temporal
tiling must reproduce the plain fori_loop path exactly (up to reassociation
roundoff) for every combination that changes the window logic."""

import numpy as np
import pytest

from extpom_tpu.cases.seamount import seamount_model

CHECK = ("el", "ua", "va", "etf", "u", "t")


def _diff(kwargs, block_kwargs, n=3):
    ref = seamount_model(dtype="float64", donate=False, pallas_ext="off",
                         ext_block="off", **kwargs)
    m = seamount_model(dtype="float64", donate=False, pallas_ext="off",
                       ext_block="on", **block_kwargs, **kwargs)
    for _ in range(n):
        ref.step_once()
        m.step_once()
    out = {}
    for name in CHECK:
        a = np.asarray(getattr(ref.state, name))
        b = np.asarray(getattr(m.state, name))
        out[name] = (float(np.abs(a - b).max()),
                     max(1.0, float(np.abs(a).max())))
    return out


def _assert_close(diffs, tol=1e-12):
    for name, (d, scale) in diffs.items():
        assert d <= tol * scale, f"{name}: {d} > {tol * scale}"


def test_blocked_matches_reference():
    d = _diff(dict(im=48, jm=48, kb=7, isplit=12),
              dict(ext_block_size=16, ext_chunk=3))
    _assert_close(d)


def test_blocked_ragged_blocks():
    """Grid not divisible by the block size (47x41 with B=16)."""
    d = _diff(dict(im=47, jm=41, kb=7, isplit=12),
              dict(ext_block_size=16, ext_chunk=3))
    _assert_close(d)


def test_blocked_partial_tail_chunk():
    """isplit not divisible by ext_chunk exercises the tail chunk."""
    d = _diff(dict(im=48, jm=48, kb=7, isplit=10),
              dict(ext_block_size=16, ext_chunk=4))
    _assert_close(d)


def test_blocked_file_bc():
    """File-driven BC family writes through global-offset windows."""
    d = _diff(dict(im=48, jm=48, kb=7, isplit=12, bc_scheme="file"),
              dict(ext_block_size=16, ext_chunk=3))
    _assert_close(d)


def test_blocked_ispadv():
    """advave every ispadv substeps (lax.cond inside the window)."""
    d = _diff(dict(im=48, jm=48, kb=7, isplit=12, ispadv=3),
              dict(ext_block_size=16, ext_chunk=3))
    _assert_close(d)
