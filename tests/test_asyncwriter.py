"""AsyncWriter: ordering, backpressure, error surfacing, restart parity."""

import time

import numpy as np
import pytest

from extpom_tpu.io.asyncwriter import AsyncWriter
from extpom_tpu.io import zarrstore as zio


def test_order_and_flush(tmp_path):
    w = AsyncWriter(max_pending=2)
    seen = []

    def slow(x):
        time.sleep(0.02)
        seen.append(x)

    for i in range(5):
        w.submit(slow, i)
    w.close()
    assert seen == [0, 1, 2, 3, 4]


def test_error_surfaces_on_flush():
    w = AsyncWriter()

    def boom():
        raise ValueError("disk full")

    w.submit(boom)
    with pytest.raises(RuntimeError, match="async output write failed"):
        w.flush()
    # the writer stays usable after the failure is reported
    w.submit(lambda: None)
    w.close()


@pytest.mark.skipif(not zio.HAVE_TS, reason="tensorstore unavailable")
def test_async_restart_bitwise(tmp_path):
    """A restart written through the background thread reads back
    bit-identical — the async path must not weaken the bit-seamless
    restart guarantee (io_pnetcdf.F:1661-2083 analogue)."""
    from extpom_tpu.cases.seamount import seamount_model

    m = seamount_model(im=17, jm=17, kb=7, dtype="float64", donate=False)
    m.run_segment(2)
    names = ("el", "elb", "u", "t", "q2", "km")
    before = {n: np.asarray(getattr(m.state, n)).copy() for n in names}
    w = AsyncWriter()
    w.submit(zio.write_restart, str(tmp_path / "rst"), m.state, m.iint)
    # next segment computes while the write drains (the production
    # overlap); the submitted state reference must stay valid and the
    # write must capture the PRE-segment values
    m.run_segment(2)
    w.close()
    st, iint, _ = zio.read_restart(str(tmp_path / "rst"), m.cfg)
    assert iint == 2
    for name in names:
        np.testing.assert_array_equal(before[name],
                                      np.asarray(getattr(st, name)),
                                      err_msg=name)
