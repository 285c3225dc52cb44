"""Regenerate the golden regression snapshot (tests/test_golden.py).

Run ONLY when a numerics change is intended; explain why in the commit.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
from extpom_tpu.cases.seamount import seamount_model

m = seamount_model(im=33, jm=33, kb=11, dtype="float64", donate=False)
m.run(n_steps=10)
out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "seamount_33x33x11_10steps.npz")
np.savez_compressed(
    out,
    **{n: np.asarray(getattr(m.state, n))
       for n in ("el", "u", "v", "t", "s", "q2", "q2l")},
    meta=np.array([33, 33, 11, 10]))
print("wrote", out)
