"""Fused Pallas Thomas solver (pallas.tridiag) vs the XLA scan pair on
randomized inputs, for every (k0, k_last, bottom-row) variant the four
vertical solvers use."""

import numpy as np
import pytest

import jax.numpy as jnp

from extpom_tpu.core.config import Config
from extpom_tpu.ops.vertical import _forward, _backward
from extpom_tpu.pallas import tridiag


IM, JM, KB = 13, 17, 9   # deliberately lane-unaligned


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(5)


def _scan_solution(cfg, a, c, den, rhs, ee0, gg0, cl, rb, db, mask,
                   k0, k_last):
    ee, gg = _forward(jnp.asarray(a), jnp.asarray(c), jnp.asarray(den),
                      jnp.asarray(rhs), jnp.asarray(ee0), jnp.asarray(gg0),
                      k0, cfg.scan_unroll)
    f_last = ((cl * gg[k_last - 1] + rb)
              / (cl * (1.0 - ee[k_last - 1]) + db))
    f = _backward(ee, gg, f_last, k_last, cfg.scan_unroll) * mask
    if k_last + 1 < KB:
        f = jnp.concatenate(
            [f, jnp.zeros((KB - k_last - 1, IM, JM), f.dtype)], axis=0)
    return np.asarray(f)


@pytest.mark.parametrize("k0,k_last,use_cl,use_mask", [
    (1, KB - 2, True, False),    # proft shape
    (1, KB - 2, True, True),     # profu/profv shape
    (1, KB - 1, False, False),   # profq q2 shape
    (2, KB - 1, False, False),   # profq q2l shape
])
def test_thomas_matches_scan(rng, k0, k_last, use_cl, use_mask):
    cfg = Config(im=IM, jm=JM, kb=KB, dtype="float64")
    r3 = lambda s=1.0, o=0.0: o + s * rng.random((KB, IM, JM))
    r2 = lambda s=1.0, o=0.0: o + s * rng.random((IM, JM))
    a = -r3(0.5, 0.1)
    c = -r3(0.5, 0.1)
    den = r3(0.2, 1.0)
    rhs = r3(2.0, -1.0)
    ee0, gg0 = r2(0.5), r2(1.0)
    cl = a[k_last] if use_cl else np.zeros((IM, JM))
    rb = r2(1.0)
    db = r2(0.5, -1.5) if use_cl else np.ones((IM, JM))
    mask = ((rng.random((IM, JM)) > 0.3).astype(float) if use_mask
            else np.ones((IM, JM)))

    want = _scan_solution(cfg, a, c, den, rhs, ee0, gg0, cl, rb, db,
                          mask, k0, k_last)
    got = np.asarray(tridiag.thomas(
        cfg, a, c, den, rhs, ee0, gg0, cl, rb, db, mask, k0, k_last,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-12)
