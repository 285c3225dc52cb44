"""z->sigma vertical spline interpolation (initialize.f:547-667)."""

import numpy as np

from extpom_tpu.utils.interp import spline_coeffs, spline_eval, ztosig


def _spline_scalar_ref(x, y, xq):
    """Direct per-point transcription of splinc/splint for one column."""
    n = len(x)
    y2 = np.zeros(n)
    u = np.zeros(n)
    for i in range(1, n - 1):
        sig = (x[i] - x[i - 1]) / (x[i + 1] - x[i - 1])
        p = sig * y2[i - 1] + 2.0
        y2[i] = (sig - 1.0) / p
        u[i] = (6.0 * ((y[i + 1] - y[i]) / (x[i + 1] - x[i])
                       - (y[i] - y[i - 1]) / (x[i] - x[i - 1]))
                / (x[i + 1] - x[i - 1]) - sig * u[i - 1]) / p
    y2[n - 1] = 0.0
    for k in range(n - 2, -1, -1):
        y2[k] = y2[k] * y2[k + 1] + u[k]
    out = np.zeros(len(xq))
    for m, xv in enumerate(xq):
        klo, khi = 0, n - 1
        while khi - klo > 1:
            k = (khi + klo) // 2
            if x[k] > xv:
                khi = k
            else:
                klo = k
        h = x[khi] - x[klo]
        a = (x[khi] - xv) / h
        b = (xv - x[klo]) / h
        out[m] = (a * y[klo] + b * y[khi]
                  + ((a ** 3 - a) * y2[klo] + (b ** 3 - b) * y2[khi])
                  * h ** 2 / 6.0)
    return out


def test_spline_matches_reference_bisection():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0.0, 100.0, 12))
    y = rng.normal(size=12)
    xq = rng.uniform(-5.0, 110.0, 40)   # includes end-interval extrapolation
    ref = _spline_scalar_ref(x, y, xq)
    y2 = spline_coeffs(x, y)
    got = spline_eval(x, y, y2, xq)
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_spline_exact_on_cubic():
    # a natural cubic spline reproduces linear data exactly
    x = np.linspace(0.0, 10.0, 8)
    y = 3.0 * x + 1.0
    y2 = spline_coeffs(x, y)
    xq = np.linspace(0.5, 9.5, 17)
    np.testing.assert_allclose(spline_eval(x, y, y2, xq), 3.0 * xq + 1.0,
                               rtol=1e-12)


def test_ztosig_monotone_profile():
    ks, im, jm, kb = 10, 8, 6, 5
    zs = np.linspace(0.0, 1000.0, ks)          # z-level depths
    h = np.full((im, jm), 500.0)
    h[0, :] = 0.5                              # dry ring column
    # T decreasing linearly with depth: T(z) = 20 - z/100
    tb = np.broadcast_to((20.0 - zs / 100.0)[:, None, None],
                         (ks, im, jm)).copy()
    zz = -np.linspace(0.05, 0.95, kb)          # sigma mid layers
    out = ztosig(zs, tb, zz, h)
    # interior wet columns: T at depth -zz*h, linear -> exact
    want = 20.0 - (-zz * 500.0) / 100.0
    np.testing.assert_allclose(out[:, 3, 3], want, rtol=1e-10)
    # edge fill copies the adjacent interior row
    np.testing.assert_allclose(out[:, 0, :], out[:, 1, :])
    # profile stays monotone decreasing
    assert np.all(np.diff(out[:, 3, 3]) < 0)


def test_ztosig_missing_data_repair():
    ks, im, jm, kb = 6, 6, 6, 4
    zs = np.linspace(0.0, 100.0, ks)
    h = np.full((im, jm), 80.0)
    tb = np.full((ks, im, jm), 10.0)
    tb[2, 3, 3] = 0.0       # hole on a submerged level -> neighbor max
    zz = -np.linspace(0.1, 0.9, kb)
    out = ztosig(zs, tb, zz, h)
    np.testing.assert_allclose(out[:, 3, 3], 10.0, rtol=1e-10)
