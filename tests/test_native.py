"""Native recordio: EFR round-trip, fused interpolation, provider use."""

import numpy as np
import pytest

from extpom_tpu.native import recordio as rio

pytestmark = pytest.mark.skipif(not rio.available(),
                                reason="g++/librecordio unavailable")


def test_roundtrip_and_interp(tmp_path):
    rng = np.random.default_rng(0)
    nrec, shape = 6, (33, 17)
    data = rng.standard_normal((nrec,) + shape)
    rio.write_records(str(tmp_path), {"wusurf": data})
    src = rio.NativeRecordSource(str(tmp_path))
    assert src.names() == ["wusurf"]
    assert src.nrec("wusurf") == nrec
    np.testing.assert_array_equal(src.read("wusurf", 2), data[2])
    # clamp
    np.testing.assert_array_equal(src.read("wusurf", 99), data[-1])
    # fused interpolation matches numpy
    got = src.interp("wusurf", 2.25)
    np.testing.assert_allclose(got, 0.75 * data[2] + 0.25 * data[3],
                               rtol=1e-12)
    # hold-last beyond the series
    np.testing.assert_allclose(src.interp("wusurf", 7.5), data[-1])


def test_provider_native_path(tmp_path):
    from extpom_tpu.cases.seamount import seamount_case
    from extpom_tpu.core.model import Model
    from extpom_tpu.forcing.provider import ForcingProvider

    cfg, grid, ics = seamount_case(im=17, jm=17, kb=7, dtype="float64")
    m = Model(grid, cfg, tb=ics["tb"], sb=ics["sb"], donate=False)
    nrec = 4
    wu = np.arange(nrec, dtype=np.float64)[:, None, None] \
        * np.ones((nrec, 17, 17))
    rio.write_records(str(tmp_path), {"wusurf": wu})
    src = rio.NativeRecordSource(str(tmp_path))
    prov = ForcingProvider(grid, cfg, m.base_forcing, src)
    iint = int(0.0625 * 86400 / cfg.dti)
    fc = prov(m, iint)
    t_days = cfg.dti * iint / 86400.0
    np.testing.assert_allclose(np.asarray(fc.wusurf)[0, 0],
                               t_days / 0.125, rtol=1e-6)
