"""Independent NumPy oracle of the reference Kessler microphysics.

A straight-line, loop-ordered transliteration of the reference kernel
(`/root/reference/model/modules/microphysics_kessler.h:234-339`, itself
Klemp & Wilhelmson 1978 via kessler.f90 v2), written in a second pass
directly from the C++ as an EXTERNAL golden anchor for the vectorized
production scheme (miniweatherml_tpu/physics/kessler.py kessler_column)
and its Pallas sub-cycle kernel -- the same move as tests/oracle_dycore.py
and tests/oracle_p3.py for the other two physics components.

Only used by tests (tests/test_kessler.py).
"""

from __future__ import annotations

import math

import numpy as np


def kessler_oracle(theta, qv, qc, qr, rho, z, pk, dt, Rd, cp, p0):
    """One Kessler call on (nz, ncol) float64 arrays, bottom-up vertical.

    Returns (theta, qv, qc, qr, precl) exactly as the reference kernel
    leaves them: the CFL sub-cycle count from the global minimum stable
    step (:276-280), upstream rain sedimentation with the half-cell top
    flux (:288-299), KW autoconversion/accretion (:305-309), saturation
    adjustment and ventilation-limited rain evaporation (:311-327), and
    the terminal velocity refresh at the end of each sub-cycle (:331).
    """
    theta = np.array(theta, dtype=float)
    qv = np.array(qv, dtype=float)
    qc = np.array(qc, dtype=float)
    qr = np.array(qr, dtype=float)
    rho = np.asarray(rho, dtype=float)
    z = np.asarray(z, dtype=float)
    pk = np.asarray(pk, dtype=float)
    nz, ncol = theta.shape

    psl = p0 / 100.0   # sea-level pressure (mb)
    rhoqr = 1000.0     # liquid water density
    lv = 2.5e6         # latent heat of vaporization

    r = 0.001 * rho
    rhalf = np.sqrt(rho[0:1, :] / rho)
    pc = 3.8 / (pk ** (cp / Rd) * psl)
    velqr = 36.34 * (qr * r) ** 0.1364 * rhalf

    # maximum stable time step per interior cell (:262-269), reduced to a
    # single global minimum (:276-277)
    dt_max = dt
    for i in range(ncol):
        for k in range(nz - 1):
            if velqr[k, i] > 1.0e-10:
                dt_max = min(dt_max, 0.8 * (z[k + 1, i] - z[k, i])
                             / velqr[k, i])
    rainsplit = math.ceil(dt / dt_max)
    dt0 = dt / float(rainsplit)

    precl = np.zeros(ncol)
    sed = np.zeros((nz, ncol))

    for nt in range(rainsplit):
        for i in range(ncol):
            # precipitation rate accumulates the surface flux each
            # sub-cycle BEFORE the update (:291-293)
            precl[i] += rho[0, i] * qr[0, i] * velqr[0, i] / rhoqr
            # upstream sedimentation; top cell sinks over a half cell
            # (:294-299)
            sed[nz - 1, i] = (-dt0 * qr[nz - 1, i] * velqr[nz - 1, i]
                              / (0.5 * (z[nz - 1, i] - z[nz - 2, i])))
            for k in range(nz - 1):
                sed[k, i] = dt0 * (
                    r[k + 1, i] * qr[k + 1, i] * velqr[k + 1, i]
                    - r[k, i] * qr[k, i] * velqr[k, i]) / (
                        r[k, i] * (z[k + 1, i] - z[k, i]))

            for k in range(nz):
                # KW 2.13a,b autoconversion + accretion (:305-309)
                qrprod = qc[k, i] - (
                    qc[k, i] - dt0 * max(0.001 * (qc[k, i] - 0.001), 0.0)
                ) / (1.0 + dt0 * 2.2 * qr[k, i] ** 0.875)
                qc[k, i] = max(qc[k, i] - qrprod, 0.0)
                qr[k, i] = max(qr[k, i] + qrprod + sed[k, i], 0.0)

                # KW 2.11 saturation mixing ratio (:311-313)
                tmp = pk[k, i] * theta[k, i] - 36.0
                qvs = pc[k, i] * math.exp(
                    17.27 * (pk[k, i] * theta[k, i] - 273.0) / tmp)
                prod = (qv[k, i] - qvs) / (
                    1.0 + qvs * (4093.0 * lv / cp) / (tmp * tmp))

                # KW 2.14a,b ventilation-limited rain evaporation
                # (:316-321)
                rq = r[k, i] * qr[k, i]
                tmp1 = dt0 * (
                    (1.6 + 124.9 * rq ** 0.2046) * rq ** 0.525
                    / (2550000.0 * pc[k, i] / (3.8 * qvs) + 540000.0)
                ) * (max(qvs - qv[k, i], 0.0) / (r[k, i] * qvs))
                tmp2 = max(-prod - qc[k, i], 0.0)
                ern = min(tmp1, min(tmp2, qr[k, i]))

                # KW 3.10 saturation adjustment (:324-328)
                theta[k, i] += lv / (cp * pk[k, i]) * (
                    max(prod, -qc[k, i]) - ern)
                qv[k, i] = max(qv[k, i] - max(prod, -qc[k, i]) + ern, 0.0)
                qc[k, i] = qc[k, i] + max(prod, -qc[k, i])
                qr[k, i] = qr[k, i] - ern

                # terminal velocity refresh for the next sub-cycle (:331)
                velqr[k, i] = (36.34 * (qr[k, i] * r[k, i]) ** 0.1364
                               * rhalf[k, i])
            if nt == rainsplit - 1:
                precl[i] = precl[i] / float(rainsplit)

    return theta, qv, qc, qr, precl
