"""Independent NumPy oracle implementations of the numerical kernels.

Loop-based (Fortran-ordered i/j/k loops), written directly from the
discretized equations (solver.f citations in each function) as an
independent check on the vectorized JAX ops.  Arrays follow the framework
convention: 3-D fields are (kb, im, jm); loops run over 0-based indices
with the reference's 1-based bounds shifted by one.
"""

import numpy as np


def dens_ref(s, t, zz, h, fsm, tbias, sbias, grav, rhoref):
    """EOS, solver.f:1162-1209 (Mellor 1991 approximate UNESCO)."""
    kb, im, jm = t.shape
    rho = np.zeros((kb, im, jm))
    for k in range(kb - 1):
        for i in range(im):
            for j in range(jm):
                tr = t[k, i, j] + tbias
                sr = s[k, i, j] + sbias
                tr2 = tr * tr
                tr3 = tr2 * tr
                tr4 = tr3 * tr
                p = grav * rhoref * (-zz[k] * h[i, j]) * 1.0e-5
                rhor = (-0.157406 + 6.793952e-2 * tr - 9.095290e-3 * tr2
                        + 1.001685e-4 * tr3 - 1.120083e-6 * tr4
                        + 6.536332e-9 * tr4 * tr)
                rhor += ((0.824493 - 4.0899e-3 * tr + 7.6438e-5 * tr2
                          - 8.2467e-7 * tr3 + 5.3875e-9 * tr4) * sr
                         + (-5.72466e-3 + 1.0227e-4 * tr
                            - 1.6546e-6 * tr2) * abs(sr) ** 1.5
                         + 4.8314e-4 * sr * sr)
                cr = (1449.1 + 0.0821 * p + 4.55 * tr - 0.045 * tr2
                      + 1.34 * (sr - 35.0))
                rhor += 1.0e5 * p / (cr * cr) * (1.0 - 2.0 * p / (cr * cr))
                rho[k, i, j] = rhor / rhoref * fsm[i, j]
    return rho


def baropg_ref(rho, rmean, dt, dum, dvm, dx, dy, zz, grav, ramp, kbm1):
    """2nd-order sigma-coordinate pressure gradient, solver.f:848-940."""
    kb, im, jm = rho.shape
    rr = rho - rmean
    drhox = np.zeros((kb, im, jm))
    drhoy = np.zeros((kb, im, jm))
    # x component
    for j in range(1, jm - 1):
        for i in range(1, im - 1):
            drhox[0, i, j] = (0.5 * grav * (-zz[0]) * (dt[i, j] + dt[i-1, j])
                              * (rr[0, i, j] - rr[0, i-1, j]))
            for k in range(1, kbm1):
                drhox[k, i, j] = (
                    drhox[k-1, i, j]
                    + grav * 0.25 * (zz[k-1] - zz[k])
                    * (dt[i, j] + dt[i-1, j])
                    * (rr[k, i, j] - rr[k, i-1, j]
                       + rr[k-1, i, j] - rr[k-1, i-1, j])
                    + grav * 0.25 * (zz[k-1] + zz[k])
                    * (dt[i, j] - dt[i-1, j])
                    * (rr[k, i, j] + rr[k, i-1, j]
                       - rr[k-1, i, j] - rr[k-1, i-1, j]))
    for k in range(kbm1):
        for j in range(1, jm - 1):
            for i in range(1, im - 1):
                drhox[k, i, j] = (0.25 * (dt[i, j] + dt[i-1, j])
                                  * drhox[k, i, j] * dum[i, j]
                                  * (dy[i, j] + dy[i-1, j])) * ramp
    # y component
    for j in range(1, jm - 1):
        for i in range(1, im - 1):
            drhoy[0, i, j] = (0.5 * grav * (-zz[0]) * (dt[i, j] + dt[i, j-1])
                              * (rr[0, i, j] - rr[0, i, j-1]))
            for k in range(1, kbm1):
                drhoy[k, i, j] = (
                    drhoy[k-1, i, j]
                    + grav * 0.25 * (zz[k-1] - zz[k])
                    * (dt[i, j] + dt[i, j-1])
                    * (rr[k, i, j] - rr[k, i, j-1]
                       + rr[k-1, i, j] - rr[k-1, i, j-1])
                    + grav * 0.25 * (zz[k-1] + zz[k])
                    * (dt[i, j] - dt[i, j-1])
                    * (rr[k, i, j] + rr[k, i, j-1]
                       - rr[k-1, i, j] - rr[k-1, i, j-1]))
    for k in range(kbm1):
        for j in range(1, jm - 1):
            for i in range(1, im - 1):
                drhoy[k, i, j] = (0.25 * (dt[i, j] + dt[i, j-1])
                                  * drhoy[k, i, j] * dvm[i, j]
                                  * (dx[i, j] + dx[i, j-1])) * ramp
    return drhox, drhoy


def vertvl_ref(w_in, u, v, dt, etf, etb, vfluxb, vfluxf,
               dx, dy, dz, dti2, kbm1):
    """Vertical velocity from continuity, solver.f:1970-2021."""
    kb, im, jm = u.shape
    xflux = np.zeros((kb, im, jm))
    yflux = np.zeros((kb, im, jm))
    for k in range(kbm1):
        for j in range(1, jm):
            for i in range(1, im):
                xflux[k, i, j] = (0.25 * (dy[i, j] + dy[i-1, j])
                                  * (dt[i, j] + dt[i-1, j]) * u[k, i, j])
                yflux[k, i, j] = (0.25 * (dx[i, j] + dx[i, j-1])
                                  * (dt[i, j] + dt[i, j-1]) * v[k, i, j])
    w = w_in.copy()
    for j in range(1, jm - 1):
        for i in range(1, im - 1):
            w[0, i, j] = 0.5 * (vfluxb[i, j] + vfluxf[i, j])
            for k in range(kbm1):
                w[k+1, i, j] = (w[k, i, j]
                                + dz[k] * ((xflux[k, i+1, j] - xflux[k, i, j]
                                            + yflux[k, i, j+1] - yflux[k, i, j])
                                           / (dx[i, j] * dy[i, j])
                                           + (etf[i, j] - etb[i, j]) / dti2))
    return w


def proft_ref(f_in, wfsurf, fsurf, nbc, kh, etf, swrad,
              h, z, dz, dzz, dti2, umol, ntp, kb):
    """Implicit vertical tracer diffusion, solver.f:1541-1683.

    Richtmyer-Morton tridiagonal: a[k] f[k+1] + (denominator) f[k] +
    c[k] f[k-1] with 4 surface BC variants and the Paulson-Simpson
    two-band shortwave absorption profile."""
    kbm1, kbm2 = kb - 1, kb - 2
    _, im, jm = f_in.shape
    R = (0.58, 0.62, 0.67, 0.77, 0.78)[ntp - 1]
    ad1 = (0.35, 0.60, 1.0, 1.5, 1.4)[ntp - 1]
    ad2 = (23.0, 20.0, 17.0, 14.0, 7.9)[ntp - 1]
    f = f_in.copy()
    for i in range(im):
        for j in range(jm):
            dh = h[i, j] + etf[i, j]
            a = np.zeros(kb)
            c = np.zeros(kb)
            for k in range(kbm2):
                a[k] = -dti2 * (kh[k+1, i, j] + umol) / (
                    dz[k] * dzz[k] * dh * dh)
            for k in range(1, kbm1):
                c[k] = -dti2 * (kh[k, i, j] + umol) / (
                    dz[k] * dzz[k-1] * dh * dh)
            rad = np.zeros(kb)
            if nbc in (2, 4):
                for k in range(kbm1):
                    rad[k] = swrad[i, j] * (
                        R * np.exp(z[k] * dh / ad1)
                        + (1.0 - R) * np.exp(z[k] * dh / ad2))
            ee = np.zeros(kb)
            gg = np.zeros(kb)
            if nbc in (1, 2):
                ee[0] = a[0] / (a[0] - 1.0)
                flux0 = wfsurf[i, j] + (rad[0] - rad[1] if nbc == 2 else 0.0)
                gg[0] = (dti2 * flux0 / (dz[0] * dh)
                         - f[0, i, j]) / (a[0] - 1.0)
            else:
                ee[0] = 0.0
                gg[0] = fsurf[i, j]
            for k in range(1, kbm2):
                gg_ = 1.0 / (a[k] + c[k] * (1.0 - ee[k-1]) - 1.0)
                ee[k] = a[k] * gg_
                gg[k] = (c[k] * gg[k-1] - f[k, i, j]
                         + dti2 * (rad[k] - rad[k+1]) / (dh * dz[k])) * gg_
            # bottom adiabatic BC at k = kbm1-1
            f[kbm1-1, i, j] = ((c[kbm1-1] * gg[kbm2-1] - f[kbm1-1, i, j]
                                + dti2 * (rad[kbm1-1] - rad[kbm1])
                                / (dh * dz[kbm1-1]))
                               / (c[kbm1-1] * (1.0 - ee[kbm2-1]) - 1.0))
            for k in range(kbm2 - 1, -1, -1):
                f[k, i, j] = ee[k] * f[k+1, i, j] + gg[k]
    return f


def advt1_ref(fb, f_in, fclim, u, v, w, aam, dt, etb, etf,
              h, dum, dvm, dx, dy, art, dz, dti2, tprni, kbm1):
    """Central tracer advection-diffusion + leapfrog, solver.f:480-574."""
    kb, im, jm = fb.shape
    f = f_in.copy()
    fbw = fb.copy()
    f[kb-1] = f[kb-2]
    fbw[kb-1] = fbw[kb-2]
    xflux = np.zeros((kb, im, jm))
    yflux = np.zeros((kb, im, jm))
    fbmc = fbw - fclim
    for k in range(kbm1):
        for j in range(1, jm):
            for i in range(1, im):
                xa = 0.25 * ((dt[i, j] + dt[i-1, j])
                             * (f[k, i, j] + f[k, i-1, j]) * u[k, i, j])
                ya = 0.25 * ((dt[i, j] + dt[i, j-1])
                             * (f[k, i, j] + f[k, i, j-1]) * v[k, i, j])
                xd = (-0.5 * (aam[k, i, j] + aam[k, i-1, j])
                      * (h[i, j] + h[i-1, j]) * tprni
                      * (fbmc[k, i, j] - fbmc[k, i-1, j]) * dum[i, j]
                      / (dx[i, j] + dx[i-1, j]))
                yd = (-0.5 * (aam[k, i, j] + aam[k, i, j-1])
                      * (h[i, j] + h[i, j-1]) * tprni
                      * (fbmc[k, i, j] - fbmc[k, i, j-1]) * dvm[i, j]
                      / (dy[i, j] + dy[i, j-1]))
                xflux[k, i, j] = 0.5 * (dy[i, j] + dy[i-1, j]) * (xa + xd)
                yflux[k, i, j] = 0.5 * (dx[i, j] + dx[i, j-1]) * (ya + yd)
    zflux = np.zeros((kb, im, jm))
    for j in range(1, jm - 1):
        for i in range(1, im - 1):
            zflux[0, i, j] = f[0, i, j] * w[0, i, j] * art[i, j]
            for k in range(1, kbm1):
                zflux[k, i, j] = (0.5 * (f[k-1, i, j] + f[k, i, j])
                                  * w[k, i, j] * art[i, j])
    ff = np.zeros((kb, im, jm))
    for k in range(kbm1):
        for j in range(1, jm - 1):
            for i in range(1, im - 1):
                adv = (xflux[k, i+1, j] - xflux[k, i, j]
                       + yflux[k, i, j+1] - yflux[k, i, j]
                       + (zflux[k, i, j] - zflux[k+1, i, j]) / dz[k])
                ff[k, i, j] = ((fbw[k, i, j] * (h[i, j] + etb[i, j])
                                * art[i, j] - dti2 * adv)
                               / ((h[i, j] + etf[i, j]) * art[i, j]))
    return ff


def profu_ref(uf_in, ub, vb, km, etf, wusurf, h, cbc, dum,
              dz, dzz, dti2, umol, kb):
    """Implicit vertical u-diffusion + quadratic bottom friction,
    solver.f:1686-1780."""
    kbm1, kbm2 = kb - 1, kb - 2
    _, im, jm = ub.shape
    uf = uf_in.copy()
    wubot = np.zeros((im, jm))
    for i in range(1, im - 1):
        for j in range(1, jm - 1):
            dh = 1.0
            if i > 0 and j > 0:
                dh = 0.5 * (h[i, j] + etf[i, j] + h[i-1, j] + etf[i-1, j])
            cm = np.zeros(kb)
            for k in range(kb):
                cm[k] = 0.5 * (km[k, i, j] + km[k, i-1, j])
            a = np.zeros(kb)
            c = np.zeros(kb)
            for k in range(kbm2):
                a[k] = -dti2 * (cm[k+1] + umol) / (dz[k] * dzz[k] * dh * dh)
            for k in range(1, kbm1):
                c[k] = -dti2 * (cm[k] + umol) / (dz[k] * dzz[k-1] * dh * dh)
            ee = np.zeros(kb)
            gg = np.zeros(kb)
            ee[0] = a[0] / (a[0] - 1.0)
            gg[0] = (-dti2 * wusurf[i, j] / (-dz[0] * dh)
                     - uf[0, i, j]) / (a[0] - 1.0)
            for k in range(1, kbm2):
                gg_ = 1.0 / (a[k] + c[k] * (1.0 - ee[k-1]) - 1.0)
                ee[k] = a[k] * gg_
                gg[k] = (c[k] * gg[k-1] - uf[k, i, j]) * gg_
            tps = (0.5 * (cbc[i, j] + cbc[i-1, j])
                   * np.sqrt(ub[kbm1-1, i, j] ** 2
                             + (0.25 * (vb[kbm1-1, i, j] + vb[kbm1-1, i, j+1]
                                        + vb[kbm1-1, i-1, j]
                                        + vb[kbm1-1, i-1, j+1])) ** 2))
            uf[kbm1-1, i, j] = ((c[kbm1-1] * gg[kbm2-1] - uf[kbm1-1, i, j])
                                / (tps * dti2 / (-dz[kbm1-1] * dh) - 1.0
                                   - (ee[kbm2-1] - 1.0) * c[kbm1-1])
                                ) * dum[i, j]
            for k in range(kbm2 - 1, -1, -1):
                uf[k, i, j] = (ee[k] * uf[k+1, i, j] + gg[k]) * dum[i, j]
            wubot[i, j] = -tps * uf[kbm1-1, i, j]
    return uf, wubot
