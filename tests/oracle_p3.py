"""Independent NumPy oracle of the reference P3 microphysics pieces.

Straight-line, scalar/NumPy transliterations written directly from the
vendored SCREAM P3 v4.1.1 Fortran
(/root/reference/model/modules/helpers/microphysics_p3/micro_p3.F90,
micro_p3_utils.F90), kept deliberately dumb-and-faithful as an EXTERNAL
golden anchor for the production scheme (miniweatherml_tpu/physics/p3.py)
and its C++ twin (native/p3_kernels.cpp).  Those two were written by the
same hand from the same Fortran reading; this module is a second,
independent transliteration pass whose whole purpose is to catch a shared
misreading (it already caught three while being written: the Cooper
nucleation cap, aimm = 0.65 vs 0.66, and the bulk-vs-DSD-integrated Bigg
freezing form).

Like the reference subroutines, thermodynamic inputs (saturation mixing
ratios, latent heats) are ARGUMENTS where the Fortran takes arguments; the
saturation itself is the reference's Murphy-Koop qv_sat (wv_sat_scream.F90),
transliterated here independently.

Only used by tests (tests/test_p3_oracle.py).
"""

from __future__ import annotations

import math

import numpy as np

# -- constants (micro_p3_utils.F90) -----------------------------------------
QSMALL = 1.0e-14          # :18
NSMALL = 1.0e-16          # :19
RHO_H2O = 1000.0
PI = math.pi
T0 = 273.15               # tmelt
T_RAINFRZ = T0 - 4.0      # :125
T_ICENUC = T0 - 15.0      # :124
T_HOMOGFRZ = T0 - 40.0    # :123
AIMM = 0.65               # :160 (the 0.66 line at :157 is commented out)
BIMM = 2.0                # :159 (the 100. line at :156 is commented out)
MI0 = 4.0 * PI / 3.0 * 900.0 * 1.0e-18    # :162
ECI = 0.5                 # :164
ERI = 1.0                 # :165
CPW = 4188.0              # cpliq passed by the wrapper (microphysics_p3.h)
CP = 1004.64
INV_CP = 1.0 / CP
CONS1 = PI / 6.0 * RHO_H2O                # :173
CONS2 = 4.0 * PI / 3.0 * RHO_H2O          # :174
CONS3 = 1.0 / (CONS2 * 25.0e-6 ** 3)      # :175 (cons2-based: 4pi/3 r^3)
CONS5 = PI / 6.0 * BIMM                   # :177
CONS6 = (PI / 6.0) ** 2 * RHO_H2O * BIMM  # :178
DROPMASS = 5.2e-7                         # :57
INV_DROPMASS = 1.0 / DROPMASS
MAX_TOTAL_NI = 500.0e3                    # :112
RHO_RIMEMIN, RHO_RIMEMAX = 50.0, 900.0    # :151-152
MU_R_CONSTANT = 1.0                       # :33
F1R, F2R = 0.78, 0.32                     # :138-139
ISIZE, RIMSIZE, DENSIZE, RCOLLSIZE = 50, 4, 5, 30  # :43-46
LOOKUP_TABLE_1A_DUM1_C = 1.0 / (0.1 * math.log10(261.7))  # :34


# ---------------------------------------------------------------------------
# DSD parameter subroutines
# ---------------------------------------------------------------------------
def get_cloud_dsd2(qc, nc, rho):
    """(micro_p3.F90:1774-1837, iparam = 3 so nu is unused.)
    Returns (nc, mu_c, lamc, cdist, cdist1); nc may be adjusted."""
    if qc >= QSMALL:
        nc = max(nc, NSMALL)
        mu_c = 0.0005714 * (nc * 1.0e-6 * rho) + 0.2714
        mu_c = 1.0 / (mu_c * mu_c) - 1.0
        mu_c = min(max(mu_c, 2.0), 15.0)
        lamc = np.cbrt(CONS1 * nc * (mu_c + 3.0) * (mu_c + 2.0)
                       * (mu_c + 1.0) / qc)
        lammin = (mu_c + 1.0) * 2.5e4
        lammax = (mu_c + 1.0) * 1.0e6
        if lamc < lammin:
            lamc = lammin
            nc = (6.0 * lamc ** 3 * qc
                  / (PI * RHO_H2O * (mu_c + 3.0) * (mu_c + 2.0)
                     * (mu_c + 1.0)))
        elif lamc > lammax:
            lamc = lammax
            nc = (6.0 * lamc ** 3 * qc
                  / (PI * RHO_H2O * (mu_c + 3.0) * (mu_c + 2.0)
                     * (mu_c + 1.0)))
        cdist = nc * (mu_c + 1.0) / lamc
        cdist1 = nc / math.gamma(mu_c + 1.0)
        return nc, mu_c, lamc, cdist, cdist1
    return nc, 0.0, 0.0, 0.0, 0.0


def get_rain_dsd2(qr, nr):
    """(micro_p3.F90:1841-1893; v4 tables => constant mu_r.)
    Returns (nr, mu_r, lamr, cdistr, logn0r); nr may be adjusted."""
    if qr >= QSMALL:
        nr = max(nr, NSMALL)
        mu_r = MU_R_CONSTANT
        lamr = np.cbrt(CONS1 * nr * (mu_r + 3.0) * (mu_r + 2.0)
                       * (mu_r + 1.0) / qr)
        lammax = (mu_r + 1.0) * 1.0e5
        lammin = (mu_r + 1.0) * 500.0
        if lamr < lammin:
            lamr = lammin
            nr = math.exp(3.0 * math.log(lamr) + math.log(qr)
                          + math.log(math.gamma(mu_r + 1.0))
                          - math.log(math.gamma(mu_r + 4.0))) / CONS1
        elif lamr > lammax:
            lamr = lammax
            nr = math.exp(3.0 * math.log(lamr) + math.log(qr)
                          + math.log(math.gamma(mu_r + 1.0))
                          - math.log(math.gamma(mu_r + 4.0))) / CONS1
        cdistr = nr / math.gamma(mu_r + 1.0)
        logn0r = (math.log10(nr) + (mu_r + 1.0) * math.log10(lamr)
                  - math.log10(math.gamma(mu_r + 1.0)))
        return nr, mu_r, lamr, cdistr, logn0r
    return nr, MU_R_CONSTANT, 0.0, 0.0, 0.0


def calc_bulk_rho_rime(qi_tot, qi_rim, bi_rim):
    """(micro_p3.F90:1904-1943.)  Returns (qi_rim, bi_rim, rho_rime)."""
    if bi_rim >= 1.0e-15:
        rho_rime = qi_rim / bi_rim
        if rho_rime < RHO_RIMEMIN:
            rho_rime = RHO_RIMEMIN
            bi_rim = qi_rim / rho_rime
        elif rho_rime > RHO_RIMEMAX:
            rho_rime = RHO_RIMEMAX
            bi_rim = qi_rim / rho_rime
    else:
        qi_rim = 0.0
        bi_rim = 0.0
        rho_rime = 0.0
    if qi_rim > qi_tot and rho_rime > 0.0:
        qi_rim = qi_tot
        bi_rim = qi_rim / rho_rime
    if qi_rim < QSMALL:
        qi_rim = 0.0
        bi_rim = 0.0
    return qi_rim, bi_rim, rho_rime


def impose_max_total_ni(ni_local, inv_rho_local):
    """(micro_p3.F90:1947-1969.)"""
    if ni_local >= 1.0e-20:
        dum = MAX_TOTAL_NI * inv_rho_local / ni_local
        ni_local = ni_local * min(dum, 1.0)
    return ni_local


# ---------------------------------------------------------------------------
# lookup-table index finding + interpolation
# ---------------------------------------------------------------------------
def find_lookup_table_indices_1a(qi, ni, qm, rhop):
    """(micro_p3.F90:1620-1677.)  Fortran 1-based (dumi, dumjj, dumii) plus
    fractional positions (dum1, dum4, dum5)."""
    dum1 = (math.log10(qi / ni) + 18.0) * LOOKUP_TABLE_1A_DUM1_C - 10.0
    dumi = int(dum1)
    dum1 = max(min(dum1, float(ISIZE)), 1.0)
    dumi = min(max(dumi, 1), ISIZE - 1)

    dum4 = (qm / qi) * 3.0 + 1.0
    dumii = int(dum4)
    dum4 = max(min(dum4, float(RIMSIZE)), 1.0)
    dumii = min(max(dumii, 1), RIMSIZE - 1)

    if rhop <= 650.0:
        dum5 = (rhop - 50.0) * 0.005 + 1.0
    else:
        dum5 = (rhop - 650.0) * 0.004 + 4.0
    dumjj = int(dum5)
    dum5 = max(min(dum5, float(DENSIZE)), 1.0)
    dumjj = min(max(dumjj, 1), DENSIZE - 1)
    return dumi, dumjj, dumii, dum1, dum4, dum5


def find_lookup_table_indices_1b(qr, nr):
    """(micro_p3.F90:1681-1720.)  Returns (dumj, dum3), 1-based."""
    if qr >= QSMALL and nr > 0.0:
        dumlr = np.cbrt(qr / (PI * RHO_H2O * nr))
        dum3 = (math.log10(1.0 * dumlr) + 5.0) * 10.70415
        dumj = int(dum3)
        dum3 = max(min(dum3, float(RCOLLSIZE)), 1.0)
        dumj = min(max(dumj, 1), RCOLLSIZE - 1)
    else:
        dumj = 1
        dum3 = 1.0
    return dumj, dum3


def find_lookup_table_indices_3(mu_r, lamr):
    """(micro_p3.F90:1725-1770.)  Returns (dumii, dumjj, rdumii, rdumjj)."""
    dum1 = (mu_r + 1.0) / lamr
    if dum1 <= 195.0e-6:
        rdumii = (dum1 * 1.0e6 + 5.0) * 0.1
        rdumii = min(max(rdumii, 1.0), 20.0)
        dumii = min(max(int(rdumii), 1), 20)
    else:
        rdumii = (dum1 * 1.0e6 - 195.0) * (1.0 / 30.0) + 20.0
        rdumii = min(max(rdumii, 20.0), 300.0)
        dumii = min(max(int(rdumii), 20), 299)
    rdumjj = min(max(mu_r + 1.0, 1.0), 10.0)
    dumjj = min(max(int(rdumjj), 1), 9)
    return dumii, dumjj, rdumii, rdumjj


def access_lookup_table(ice_table, dumjj, dumii, dumi, index, dum1, dum4,
                        dum5):
    """(micro_p3.F90:1508-1545.)  ``ice_table[jj, ii, i, col]`` 0-based
    numpy view of ice_table_vals(dumjj, dumii, dumi, index); the Fortran
    index arguments stay 1-based as in the reference."""
    def tv(jj, ii, i):
        return ice_table[jj - 1, ii - 1, i - 1, index - 1]

    iproc1 = tv(dumjj, dumii, dumi) + (dum1 - dumi) * (
        tv(dumjj, dumii, dumi + 1) - tv(dumjj, dumii, dumi))
    gproc1 = tv(dumjj, dumii + 1, dumi) + (dum1 - dumi) * (
        tv(dumjj, dumii + 1, dumi + 1) - tv(dumjj, dumii + 1, dumi))
    tmp1 = iproc1 + (dum4 - dumii) * (gproc1 - iproc1)

    iproc1 = tv(dumjj + 1, dumii, dumi) + (dum1 - dumi) * (
        tv(dumjj + 1, dumii, dumi + 1) - tv(dumjj + 1, dumii, dumi))
    gproc1 = tv(dumjj + 1, dumii + 1, dumi) + (dum1 - dumi) * (
        tv(dumjj + 1, dumii + 1, dumi + 1) - tv(dumjj + 1, dumii + 1, dumi))
    tmp2 = iproc1 + (dum4 - dumii) * (gproc1 - iproc1)
    return tmp1 + (dum5 - dumjj) * (tmp2 - tmp1)


def access_lookup_table_coll(coll_table, dumjj, dumii, dumj, dumi, index,
                             dum1, dum3, dum4, dum5):
    """(micro_p3.F90:1547-1605.)  ``coll_table[jj, ii, i, j, col]``
    0-based numpy view of collect_table_vals."""
    def tv(jj, ii, i, j):
        return coll_table[jj - 1, ii - 1, i - 1, j - 1, index - 1]

    def lin_ij(jj, ii):
        dproc1 = tv(jj, ii, dumi, dumj) + (dum1 - dumi) * (
            tv(jj, ii, dumi + 1, dumj) - tv(jj, ii, dumi, dumj))
        dproc2 = tv(jj, ii, dumi, dumj + 1) + (dum1 - dumi) * (
            tv(jj, ii, dumi + 1, dumj + 1) - tv(jj, ii, dumi, dumj + 1))
        return dproc1 + (dum3 - dumj) * (dproc2 - dproc1)

    iproc1 = lin_ij(dumjj, dumii)
    gproc1 = lin_ij(dumjj, dumii + 1)
    tmp1 = iproc1 + (dum4 - dumii) * (gproc1 - iproc1)
    iproc1 = lin_ij(dumjj + 1, dumii)
    gproc1 = lin_ij(dumjj + 1, dumii + 1)
    tmp2 = iproc1 + (dum4 - dumii) * (gproc1 - iproc1)
    return tmp1 + (dum5 - dumjj) * (tmp2 - tmp1)


# ---------------------------------------------------------------------------
# p3_init_b rain-table generation (micro_p3.F90:236-351)
# ---------------------------------------------------------------------------
def generate_rain_tables():
    """Transliterated p3_init_b do-loops with mu_r_constant = 1; returns
    (vn_table, vm_table, revap_table) each (300,) at mu_r = 1 (row 1 of
    the Fortran's (300, 10) tables)."""
    mu_r = MU_R_CONSTANT
    vn = np.empty(300)
    vm = np.empty(300)
    revap = np.empty(300)
    dd = 2.0
    kk = np.arange(1, 10001)
    dia = (kk * dd - dd * 0.5) * 1.0e-6
    amg = PI / 6.0 * 997.0 * dia ** 3 * 1000.0   # mass in grams
    vt = np.where(
        dia * 1e6 <= 134.43, 4.5795e3 * amg ** (2.0 / 3.0),
        np.where(dia * 1e6 < 1511.64, 4.962e1 * amg ** (1.0 / 3.0),
                 np.where(dia * 1e6 < 3477.84, 1.732e1 * amg ** (1.0 / 6.0),
                          9.17)))
    for jj in range(1, 301):
        if jj <= 20:
            dm = (jj * 10.0 - 5.0) * 1.0e-6
        else:
            dm = ((jj - 20) * 30.0 + 195.0) * 1.0e-6
        lamr = (mu_r + 1.0) / dm
        # numerator/denominator sums with the reference's underflow-guard
        # scalings (10**(4 mu) etc.; they cancel in the ratios)
        wght_n = 10.0 ** (mu_r * np.log10(dia) + 4.0 * mu_r)
        wght_m = 10.0 ** ((mu_r + 3.0) * np.log10(dia) + 4.0 * mu_r)
        e = np.exp(-lamr * dia) * (dd * 1.0e-6)
        dum1 = float(np.sum(vt * wght_n * e))
        dum2 = max(float(np.sum(wght_n * e)), 1e-30)
        dum3 = float(np.sum(vt * wght_m * e))
        dum4 = max(float(np.sum(wght_m * e)), 1e-30)
        wght_v = np.sqrt(vt * dia) * 10.0 ** ((mu_r + 1.0) * np.log10(dia)
                                              + 3.0 * mu_r)
        dum5 = max(float(np.sum(wght_v * e)), 1e-30)
        vn[jj - 1] = dum1 / dum2
        vm[jj - 1] = dum3 / dum4
        revap[jj - 1] = 10.0 ** (math.log10(dum5)
                                 + (mu_r + 1.0) * math.log10(lamr)
                                 - 3.0 * mu_r)
    return vn, vm, revap


def compute_rain_fall_velocity(vn_table, vm_table, qr_incld, rhofacr,
                               nr_incld):
    """(micro_p3.F90:3872-3908.)  vn/vm tables are the mu_r = 1 rows.
    Returns (nr_incld, mu_r, lamr, V_qr, V_nr)."""
    nr_incld, mu_r, lamr, _, _ = get_rain_dsd2(qr_incld, nr_incld)
    dumii, dumjj, rdumii, rdumjj = find_lookup_table_indices_3(mu_r, lamr)
    # with constant mu_r = 1, rdumjj - dumjj interpolation spans identical
    # rows; use the single generated row
    v_qr = vm_table[dumii - 1] + (rdumii - dumii) * (
        vm_table[dumii] - vm_table[dumii - 1])
    v_qr *= rhofacr
    v_nr = vn_table[dumii - 1] + (rdumii - dumii) * (
        vn_table[dumii] - vn_table[dumii - 1])
    v_nr *= rhofacr
    return nr_incld, mu_r, lamr, v_qr, v_nr


# ---------------------------------------------------------------------------
# process-rate subroutines (all gates included; thermodynamic inputs are
# arguments like in the Fortran)
# ---------------------------------------------------------------------------
def cloud_water_autoconversion(qc_incld, nc_incld, rho):
    """(micro_p3.F90:2750-2784, iparam = 3 KK2000.)
    Returns (qc2qr_autoconv, nc2nr_autoconv, ncautr)."""
    if qc_incld >= 1.0e-8:
        au = 1350.0 * qc_incld ** 2.47 * (nc_incld * 1.0e-6 * rho) ** (-1.79)
        ncautr = au * CONS3
        nc2nr = au * nc_incld / qc_incld
        if au == 0.0:
            nc2nr = 0.0
        if nc2nr == 0.0:
            au = 0.0
        return au, nc2nr, ncautr
    return 0.0, 0.0, 0.0


def cloud_rain_accretion(qc_incld, nc_incld, qr_incld):
    """(micro_p3.F90:2655-2703, iparam = 3.)  Returns (qc2qr, nc_accret)."""
    if qr_incld >= QSMALL and qc_incld >= QSMALL:
        ac = 67.0 * (qc_incld * qr_incld) ** 1.15
        nca = ac * nc_incld / qc_incld
        if ac == 0.0:
            nca = 0.0
        if nca == 0.0:
            ac = 0.0
        return ac, nca
    return 0.0, 0.0


def rain_self_collection(rho, qr_incld, nr_incld):
    """(micro_p3.F90:2705-2747, iparam = 3.)"""
    if qr_incld >= QSMALL:
        dum1 = 280.0e-6
        dum2 = np.cbrt(qr_incld / (PI * RHO_H2O * nr_incld))
        if dum2 < dum1:
            dum = 1.0
        else:
            dum = 2.0 - math.exp(2300.0 * (dum2 - dum1))
        return dum * 5.78 * nr_incld * qr_incld * rho
    return 0.0


def cldliq_immersion_freezing(t_atm, lamc, mu_c, cdist1, qc_incld):
    """(micro_p3.F90:2504-2538.)  Returns (Q_nuc, N_nuc)."""
    if qc_incld >= QSMALL and t_atm <= T_RAINFRZ:
        dum1 = math.exp(AIMM * (T0 - t_atm))
        dum2 = (1.0 / lamc) ** 3
        q_nuc = CONS6 * cdist1 * math.gamma(7.0 + mu_c) * dum1 * dum2 ** 2
        n_nuc = CONS5 * cdist1 * math.gamma(mu_c + 4.0) * dum1 * dum2
        return q_nuc, n_nuc
    return 0.0, 0.0


def rain_immersion_freezing(t_atm, lamr, mu_r, cdistr, qr_incld):
    """(micro_p3.F90:2540-2573.)  Returns (Q_nuc, N_nuc)."""
    if qr_incld >= QSMALL and t_atm <= T_RAINFRZ:
        e = math.exp(AIMM * (T0 - t_atm))
        q_nuc = CONS6 * math.exp(
            math.log(cdistr) + math.log(math.gamma(7.0 + mu_r))
            - 6.0 * math.log(lamr)) * e
        n_nuc = CONS5 * math.exp(
            math.log(cdistr) + math.log(math.gamma(mu_r + 4.0))
            - 3.0 * math.log(lamr)) * e
        return q_nuc, n_nuc
    return 0.0, 0.0


def ice_nucleation(t_atm, inv_rho, ni, qv_supersat_i, dt):
    """(micro_p3.F90:2576-2618, do_predict_nc = false path.)
    Returns (qinuc, ni_nucleat)."""
    if t_atm < T_ICENUC and qv_supersat_i >= 0.05:
        dum = 0.005 * math.exp(0.304 * (T0 - t_atm)) * 1000.0 * inv_rho
        dum = min(dum, 100.0e3 * inv_rho)
        n_nuc = max(0.0, (dum - ni) / dt)
        if n_nuc >= 1.0e-20:
            q_nuc = max(0.0, (dum - ni) * MI0 / dt)
            return q_nuc, n_nuc
    return 0.0, 0.0


def ice_cldliq_collection(rho, t_atm, rhofaci, table_val_qc2qi_collect,
                          qi_incld, qc_incld, ni_incld, nc_incld):
    """(micro_p3.F90:2054-2100.)
    Returns (qccol, nc_collect, qc2qr_ice_shed, ncshdc)."""
    qccol = nc_collect = shed = ncshdc = 0.0
    if qi_incld >= QSMALL and qc_incld >= QSMALL:
        if t_atm <= T0:
            qccol = (rhofaci * table_val_qc2qi_collect * qc_incld * ECI
                     * rho * ni_incld)
            nc_collect = (rhofaci * table_val_qc2qi_collect * nc_incld * ECI
                          * rho * ni_incld)
        else:
            shed = (rhofaci * table_val_qc2qi_collect * qc_incld * ECI
                    * rho * ni_incld)
            nc_collect = (rhofaci * table_val_qc2qi_collect * nc_incld * ECI
                          * rho * ni_incld)
            ncshdc = shed * INV_DROPMASS
    return qccol, nc_collect, shed, ncshdc


def ice_rain_collection(rho, t_atm, rhofaci, logn0r, table_val_nr_collect,
                        table_val_qr2qi_collect, qi_incld, ni_incld,
                        qr_incld):
    """(micro_p3.F90:2103-2157.)  Returns (qrcol, nr_collect)."""
    qrcol = nr_collect = 0.0
    if qi_incld >= QSMALL and qr_incld >= QSMALL:
        if t_atm <= T0:
            qrcol = (10.0 ** (table_val_qr2qi_collect + logn0r)
                     * rho * rhofaci * ERI * ni_incld)
            nr_collect = (10.0 ** (table_val_nr_collect + logn0r)
                          * rho * rhofaci * ERI * ni_incld)
        else:
            nr_collect = (10.0 ** (table_val_nr_collect + logn0r)
                          * rho * rhofaci * ERI * ni_incld)
    return qrcol, nr_collect


def ice_self_collection(rho, rhofaci, table_val_ni_self_collect, eii,
                        qm_incld, qi_incld, ni_incld):
    """(micro_p3.F90:2159-2207.)"""
    if qi_incld >= QSMALL:
        if qm_incld > 0.0:
            tmp1 = qm_incld / qi_incld
            if tmp1 < 0.6:
                eii_fact = 1.0
            elif tmp1 < 0.9:
                eii_fact = 1.0 - (tmp1 - 0.6) / 0.3
            else:
                eii_fact = 0.0
        else:
            eii_fact = 1.0
        return (table_val_ni_self_collect * rho * eii * eii_fact * rhofaci
                * ni_incld * ni_incld)
    return 0.0


def ice_melting(rho, t_atm, rhofaci, table_val_melt, table_val_vent_melt,
                latent_heat_vapor, latent_heat_fusion, dv, sc, mu, kap,
                qv, qsat0, qi_incld, ni_incld):
    """(micro_p3.F90:2211-2256; qsat0 = qv_sat(T0) passed in.)
    Returns (qi2qr_melt, ni2nr_melt)."""
    if qi_incld >= QSMALL and t_atm > T0:
        melt = ((table_val_melt
                 + table_val_vent_melt * np.cbrt(sc)
                 * math.sqrt(rhofaci * rho / mu))
                * ((t_atm - T0) * kap
                   - rho * latent_heat_vapor * dv * (qsat0 - qv))
                * 2.0 * PI / latent_heat_fusion) * ni_incld
        melt = max(melt, 0.0)
        return melt, melt * (ni_incld / qi_incld)
    return 0.0, 0.0


def ice_cldliq_wet_growth(rho, t_atm, rhofaci, table_val_melt,
                          table_val_vent_melt, latent_heat_vapor,
                          latent_heat_fusion, dv, kap, mu, sc, qv, qsat0,
                          qc_incld, qi_incld, ni_incld, qr_incld,
                          qrcol, qccol, nr_ice_shed, qc2qr_ice_shed):
    """(micro_p3.F90:2259-2319.)  Returns updated
    (qrcol, qccol, qwgrth, nr_ice_shed, qc2qr_ice_shed, log_wetgrowth)."""
    log_wetgrowth = False
    qwgrth = 0.0
    if (qi_incld >= QSMALL and qc_incld + qr_incld >= 1.0e-6
            and t_atm < T0):
        qwgrth = ((table_val_melt
                   + table_val_vent_melt * np.cbrt(sc)
                   * math.sqrt(rhofaci * rho / mu))
                  * 2.0 * PI
                  * (rho * latent_heat_vapor * dv * (qsat0 - qv)
                     - (t_atm - T0) * kap)
                  / (latent_heat_fusion + CPW * (t_atm - T0))) * ni_incld
        qwgrth = max(qwgrth, 0.0)
        dum = max(0.0, (qccol + qrcol) - qwgrth)
        if dum >= 1.0e-10:
            nr_ice_shed = nr_ice_shed + dum * 1.923e6
            if (qccol + qrcol) >= 1.0e-10:
                dum1 = 1.0 / (qccol + qrcol)
                qc2qr_ice_shed = qc2qr_ice_shed + dum * qccol * dum1
                qccol = max(0.0, qccol - dum * qccol * dum1)
                qrcol = max(0.0, qrcol - dum * qrcol * dum1)
            log_wetgrowth = True
    return qrcol, qccol, qwgrth, nr_ice_shed, qc2qr_ice_shed, log_wetgrowth


def calc_ice_relaxation_timescale(rho, t_atm, rhofaci, table_val_melt,
                                  table_val_vent_melt, dv, mu, sc,
                                  qi_incld, ni_incld):
    """(micro_p3.F90:2322-2355.)  Returns epsi."""
    if qi_incld >= QSMALL and t_atm < T0:
        return ((table_val_melt
                 + table_val_vent_melt * np.cbrt(sc)
                 * math.sqrt(rhofaci * rho / mu))
                * 2.0 * PI * rho * dv) * ni_incld
    return 0.0


def calc_liq_relaxation_timescale(revap_table, rho, dv, mu, sc, mu_r, lamr,
                                  cdistr, qr_incld):
    """(micro_p3.F90:2358-2410; revap_table is the mu_r = 1 row.)
    Returns epsr."""
    if qr_incld >= QSMALL:
        dumii, dumjj, rdumii, rdumjj = find_lookup_table_indices_3(mu_r,
                                                                   lamr)
        dum = revap_table[dumii - 1] + (rdumii - dumii) * (
            revap_table[dumii] - revap_table[dumii - 1])
        return (2.0 * PI * cdistr * rho * dv
                * (F1R * math.gamma(mu_r + 2.0) / lamr
                   + F2R * math.sqrt(rho / mu) * np.cbrt(sc) * dum))
    return 0.0


def evaporate_rain(qr_incld, qc_incld, nr_incld, qi_incld, qv, qv_prev,
                   qv_sat_l, qv_sat_i, ab, abi, epsr, epsi_tot, t, t_prev,
                   latent_heat_sublim, dqsdt, dt):
    """(micro_p3.F90:3383-3537; cld_frac_l = mincld, cld_frac_r = 1 in the
    wrapper's all-or-nothing cloud treatment.)
    Returns (qr2qv_evap, nr_evap)."""
    qr2qv = 0.0
    nr_evap = 0.0
    inv_dt = 1.0 / dt
    ssat_r = qv - qv_sat_l
    cld_frac = 0.0 if (qc_incld + qi_incld < 1.0e-6) else 1.0
    if cld_frac < 1.0 and ssat_r < 0.0 and qr_incld >= QSMALL:
        if t < T0:
            eps_eff = epsr + epsi_tot * (
                1.0 + latent_heat_sublim * INV_CP * dqsdt) / abi
        else:
            eps_eff = epsr
        eps_eff = max(1.0e-20, eps_eff)
        tau_eff = 1.0 / eps_eff
        if t < T0:
            a_c = ((qv - qv_prev) * inv_dt - dqsdt * (t - t_prev) * inv_dt
                   - (qv_sat_l - qv_sat_i)
                   * (1.0 + latent_heat_sublim * INV_CP * dqsdt)
                   / abi * epsi_tot)
        else:
            a_c = (qv - qv_prev) * inv_dt - dqsdt * (t - t_prev) * inv_dt
        if qr_incld < 1e-12 and qv / qv_sat_l < 0.999:
            qr2qv = qr_incld * inv_dt
        else:
            dtau = dt / tau_eff
            tscale_weight = -math.expm1(-dtau) / dtau
            tau_r = 1.0 / epsr
            equilib = -a_c / ab * tau_eff / tau_r
            instant = -ssat_r / (ab * tau_r)
            qr2qv = (instant * tscale_weight
                     + equilib * (1.0 - tscale_weight))
        qr2qv = min(qr2qv, -ssat_r * inv_dt / ab)
        qr2qv = max(0.0, qr2qv)
        qr2qv = min(qr2qv, qr_incld * inv_dt)
        nr_evap = qr2qv * (nr_incld / qr_incld)
    return qr2qv, nr_evap


def homogeneous_freezing(t_atm, inv_exner, latent_heat_fusion, qc, nc, qr,
                         nr, qi, ni, qm, bm, th_atm):
    """(micro_p3.F90:4145-4200.)  One cell; returns the updated tuple."""
    if qc >= QSMALL and t_atm < T_HOMOGFRZ:
        q_nuc = qc
        n_nuc = max(nc, NSMALL)
        qm += q_nuc
        qi += q_nuc
        bm += q_nuc / RHO_RIMEMAX
        ni += n_nuc
        th_atm += inv_exner * q_nuc * latent_heat_fusion * INV_CP
        qc = 0.0
        nc = 0.0
    if qr >= QSMALL and t_atm < T_HOMOGFRZ:
        q_nuc = qr
        n_nuc = max(nr, NSMALL)
        qm += q_nuc
        qi += q_nuc
        bm += q_nuc / RHO_RIMEMAX
        ni += n_nuc
        th_atm += inv_exner * q_nuc * latent_heat_fusion * INV_CP
        qr = 0.0
        nr = 0.0
    return qc, nc, qr, nr, qi, ni, qm, bm, th_atm


RV = 461.505


def ice_supersat_conservation(qidep, qinuc, qv, qv_sat_i, latent_heat_sublim,
                              t_atm, dt, sublim, evap):
    """(micro_p3.F90:2856-2886, cld_frac_i = 1.)  Limits deposition +
    nucleation to the psychrometrically-corrected ice-supersaturation
    excess, credited with this step's sublimation + rain-evap sources.
    Returns (qidep, qinuc) scaled."""
    qv_sink = qidep + qinuc
    if qv_sink > QSMALL:
        qv_avail = ((qv + (sublim + evap) * dt - qv_sat_i)
                    / (1.0 + latent_heat_sublim ** 2 * qv_sat_i
                       / (CP * RV * t_atm ** 2)) / dt)
        qv_avail = max(qv_avail, 0.0)
        if qv_sink > qv_avail:
            fract = qv_avail / qv_sink
            qidep *= fract
            qinuc *= fract
    return qidep, qinuc


def prevent_liq_supersaturation(qv, t_atm, lv, ls, dt, qidep, qinuc,
                                sublim, evap, qsl_of):
    """(micro_p3.F90:2888-2955.)  Scales the vapor sources (sublimation +
    rain evap) so end-of-step qv cannot exceed liquid saturation.
    ``qsl_of(T)`` supplies qv_sat (the repo's Magnus stand-in in tests).
    Returns (sublim, evap) scaled."""
    qv_sources = sublim + evap
    if qv_sources < QSMALL:
        return 0.0, 0.0
    qv_sinks = qidep + qinuc
    t_end = t_atm + ((qv_sinks - sublim) * ls * INV_CP
                     - evap * lv * INV_CP) * dt
    qsl = qsl_of(t_end)
    a = (lv * qsl * dt * INV_CP / (RV * t_end * t_end)
         * (ls * sublim + lv * evap))
    frac = (qsl - qv + qv_sinks * dt + a) / (qv_sources * dt + a)
    frac = min(1.0, max(0.0, frac))
    return frac * sublim, frac * evap


# ---------------------------------------------------------------------------
# conservation subroutines (micro_p3.F90:2957-3106)
# ---------------------------------------------------------------------------
def cloud_water_conservation(qc, dt, au, ac, qccol, qc_frz, shed, berg,
                             sublim, qidep):
    """(micro_p3.F90:3028-3061.)  Returns the scaled
    (au, ac, qccol, qc_frz, shed, berg, sublim, qidep)."""
    sinks = (au + ac + qccol + qc_frz + shed + berg) * dt
    ratio = 1.0
    if sinks > qc and sinks >= 1.0e-20:
        ratio = qc / sinks
        au *= ratio
        ac *= ratio
        qccol *= ratio
        qc_frz *= ratio
        shed *= ratio
        berg *= ratio
    if qc > 1.0e-20:
        qidep *= (1.0 - ratio)
        sublim *= (1.0 - ratio)
    return au, ac, qccol, qc_frz, shed, berg, sublim, qidep


def rain_water_conservation(qr, au, ac, melt, shed, dt, ev, qrcol, qr_frz):
    """(micro_p3.F90:3063-3082.)  Returns (ev, qrcol, qr_frz)."""
    sinks = (ev + qrcol + qr_frz) * dt
    sources = qr + (au + ac + melt + shed) * dt
    if sinks > sources and sinks >= 1.0e-20:
        ratio = sources / sinks
        ev *= ratio
        qrcol *= ratio
        qr_frz *= ratio
    return ev, qrcol, qr_frz


def ice_water_conservation(qi, qidep, qinuc, berg, qrcol, qccol, qr_frz,
                           qc_frz, dt, sublim, melt):
    """(micro_p3.F90:3084-3106.)  Returns (sublim, melt)."""
    sinks = (sublim + melt) * dt
    sources = qi + (qidep + qinuc + qrcol + qccol + qr_frz + qc_frz
                    + berg) * dt
    if sinks > sources and sinks >= 1.0e-20:
        ratio = sources / sinks
        sublim *= ratio
        melt *= ratio
    return sublim, melt


def nc_conservation(nc, nc_self, dt, nc_collect, nc_frz, nc_accret,
                    nc2nr_auto):
    """(micro_p3.F90:2957-2979.)"""
    sink = (nc_collect + nc_frz + nc_accret + nc2nr_auto) * dt
    source = nc + nc_self * dt
    if sink > source:
        ratio = source / sink
        nc_collect *= ratio
        nc_frz *= ratio
        nc_accret *= ratio
        nc2nr_auto *= ratio
    return nc_collect, nc_frz, nc_accret, nc2nr_auto


def nr_conservation(nr, ni2nr_melt, nr_ice_shed, ncshdc, nc2nr_auto, dt,
                    nmltratio, nr_collect, nr_frz, nr_self, nr_evap):
    """(micro_p3.F90:2981-3005; nmltratio = 1, micro_p3_utils.F90:171.)"""
    sink = (nr_collect + nr_frz + nr_self + nr_evap) * dt
    source = nr + (ni2nr_melt * nmltratio + nr_ice_shed + ncshdc
                   + nc2nr_auto) * dt
    if sink > source:
        ratio = source / sink
        nr_collect *= ratio
        nr_frz *= ratio
        nr_self *= ratio
        nr_evap *= ratio
    return nr_collect, nr_frz, nr_self, nr_evap


def ni_conservation(ni, ni_nucleat, nr_frz, nc_frz, dt, ni2nr_melt,
                    ni_sublim, ni_self):
    """(micro_p3.F90:3007-3026.)"""
    sink = (ni2nr_melt + ni_sublim + ni_self) * dt
    source = ni + (ni_nucleat + nr_frz + nc_frz) * dt
    if sink > source:
        ratio = source / sink
        ni2nr_melt *= ratio
        ni_sublim *= ratio
        ni_self *= ratio
    return ni2nr_melt, ni_sublim, ni_self


# ---------------------------------------------------------------------------
# prognostic updates (micro_p3.F90:3108-3266)
# ---------------------------------------------------------------------------
NCCNST = 200.0e6          # micro_p3_utils.F90:115
NMLTRATIO = 1.0           # :171
INCLOUD_LIMIT = 5.1e-3    # :75
PRECIP_LIMIT = 1.0e-2     # :76
RHO_1000MB = 100000.0 / (287.042 * T0)      # :134
RHO_600MB = 60000.0 / (287.042 * 253.15)    # :135
GRAV = 9.80616
LATVAP = 2501000.0
LATICE = 333700.0


def update_prognostic_ice(qc_frz, qccol, shed, nc_collect, nc_frz, ncshdc,
                          qrcol, nr_collect, qr_frz, nr_frz, nr_ice_shed,
                          melt, ni2nr_melt, sublim, qidep, qinuc,
                          ni_nucleat, ni_self, ni_sublim, berg, inv_exner,
                          ls, lf, do_predict_nc, log_wetgrowth, dt,
                          rho_qm_cloud,
                          th, qv, qi, ni, qm, bm, qc, nc, qr, nr):
    """(micro_p3.F90:3108-3214.)  Returns the updated prognostics."""
    qc = qc + (-qc_frz - qccol - shed - berg) * dt
    if do_predict_nc:
        nc = nc + (-nc_collect - nc_frz) * dt
    qr = qr + (-qrcol + melt - qr_frz + shed) * dt
    nr = nr + (-nr_collect - nr_frz + NMLTRATIO * ni2nr_melt
               + nr_ice_shed + ncshdc) * dt
    if qi >= QSMALL:
        bm = bm - ((sublim + melt) / qi) * dt * bm
        qm = qm - ((sublim + melt) * qm / qi) * dt
        qi = qi - (sublim + melt) * dt
    dum = (qrcol + qccol + qr_frz + qc_frz) * dt
    qi = qi + (qidep + qinuc + berg) * dt + dum
    qm = qm + dum
    bm = bm + (qrcol / RHO_RIMEMAX + qccol / rho_qm_cloud
               + (qr_frz + qc_frz) / RHO_RIMEMAX) * dt
    ni = ni + (ni_nucleat - ni2nr_melt - ni_sublim - ni_self
               + nr_frz + nc_frz) * dt
    if qm < 0.0:
        qm = 0.0
        bm = 0.0
    if log_wetgrowth:
        qm = qi
        bm = qm / RHO_RIMEMAX
    qv = qv + (-qidep + sublim - qinuc) * dt
    th = th + inv_exner * ((qidep - sublim + qinuc) * ls * INV_CP
                           + (qrcol + qccol + qc_frz + qr_frz - melt
                              + berg) * lf * INV_CP) * dt
    return th, qv, qi, ni, qm, bm, qc, nc, qr, nr


def update_prognostic_liquid(ac, nc_accret, au, nc2nr_auto, ncautr, nc_self,
                             ev, nr_evap, nr_self, do_predict_nc, inv_rho,
                             inv_exner, lv, dt, th, qv, qc, nc, qr, nr):
    """(micro_p3.F90:3216-3266, iparam = 3.)"""
    qc = qc + (-ac - au) * dt
    qr = qr + (ac + au - ev) * dt
    if do_predict_nc:
        nc = nc + (-nc_accret - nc2nr_auto + nc_self) * dt
    else:
        nc = NCCNST * inv_rho
    nr = nr + (ncautr - nr_self - nr_evap) * dt
    qv = qv + ev * dt
    th = th + inv_exner * (-ev * lv * INV_CP) * dt
    return th, qv, qc, nc, qr, nr


# ---------------------------------------------------------------------------
# thermodynamic helpers -- the repo scheme's Magnus-form svp stand-ins
# (documented deviation from wv_sat_scream; physics/p3.py:91-100), entering
# both sides of every oracle comparison identically
# ---------------------------------------------------------------------------
def svp_liq(t):
    tc = t - 273.15
    return 610.94 * math.exp(17.625 * tc / (243.04 + tc))


def svp_ice(t):
    tc = t - 273.15
    return 611.21 * math.exp(22.587 * tc / (273.86 + tc))


def murphy_koop_svp(t, i_type):
    """Murphy & Koop (2005) saturation vapor pressure [Pa]
    (wv_sat_scream.F90 MurphyKoop_svp:60-118): ice branch below freezing
    when i_type = 1, otherwise the liquid (tanh) form."""
    logt = math.log(t)
    if i_type == 1 and t < T0:
        return math.exp(9.550426 - 5723.265 / t + 3.53068 * logt
                        - 0.00728332 * t)
    return math.exp(54.842763 - 6763.22 / t - 4.210 * logt + 0.000367 * t
                    + math.tanh(0.0415 * (t - 218.8))
                    * (53.878 - 1331.22 / t - 9.44523 * logt
                       + 0.014025 * t))


EP_2 = 18.016 / 28.966   # mwh2o/mwdry (micro_p3_utils.F90:133)


def qv_sat(t_atm, p_atm, i_wrt):
    """wv_sat_scream.F90 qv_sat:30-55: saturation MIXING RATIO from the
    Murphy-Koop svp, ep_2 * e / max(1e-3, p - e)."""
    e = murphy_koop_svp(t_atm, i_wrt)
    return EP_2 * e / max(1.0e-3, p_atm - e)


def get_time_space_phys_variables(t_atm, pres, rho, lv, ls, qv_sat_l,
                                  qv_sat_i):
    """(micro_p3.F90:3538-3585.)  Returns
    (mu, dv, sc, dqsdt, dqsidt, ab, abi, kap, eii)."""
    mu = 1.496e-6 * t_atm ** 1.5 / (t_atm + 120.0)
    dv = 8.794e-5 * t_atm ** 1.81 / pres
    sc = mu / (rho * dv)
    dum = 1.0 / (RV * t_atm * t_atm)
    dqsdt = lv * qv_sat_l * dum
    dqsidt = ls * qv_sat_i * dum
    ab = 1.0 + dqsdt * lv * INV_CP
    abi = 1.0 + dqsidt * ls * INV_CP
    kap = 1.414e3 * mu
    if t_atm < 253.15:
        eii = 0.001
    elif t_atm < 273.15:
        eii = 0.001 + (t_atm - 253.15) * (0.3 - 0.001) / 20.0
    else:
        eii = 0.3
    return mu, dv, sc, dqsdt, dqsidt, ab, abi, kap, eii


def ice_deposition_sublimation(qi_incld, ni_incld, t_atm, qv_sat_l,
                               qv_sat_i, epsi, abi, qv, inv_dt):
    """(micro_p3.F90:3268-3330.)
    Returns (qidep, sublim, ni_sublim, berg)."""
    berg = qidep = sublim = ni_sublim = 0.0
    if qi_incld > QSMALL:
        qi_tend = min(epsi / abi, inv_dt) * (qv - qv_sat_i)
        if qi_tend < 0.0:
            sublim = -qi_tend
            ni_sublim = sublim * (ni_incld / qi_incld)
        if t_atm < T0:
            if qi_tend >= 0.0:
                qidep = qi_tend
            berg = max(epsi / abi * (qv_sat_l - qv_sat_i), 0.0)
    return qidep, sublim, ni_sublim, berg


def calc_rime_density(t_atm, rhofaci, table_val_qi_fallspd, acn, lamc,
                      mu_c, qc_incld, qccol):
    """(micro_p3.F90:2413-2490.)  Returns rho_qm_cloud."""
    if qccol >= QSMALL and t_atm < T0:
        if qc_incld >= QSMALL:
            vtrmi1 = table_val_qi_fallspd * rhofaci
            i_tc = 1.0 / min(-0.001, t_atm - T0)
            vt_qc = (acn * math.gamma(4.0 + 2.0 + mu_c)
                     / (lamc ** 2 * math.gamma(mu_c + 4.0)))
            d_c = (mu_c + 4.0) / lamc
            ri = -0.5e6 * d_c * abs(vtrmi1 - vt_qc) * i_tc
            ri = max(1.0, min(ri, 12.0))
            if ri <= 8.0:
                return (0.051 + 0.114 * ri - 0.0055 * ri * ri) * 1000.0
            return 611.0 + 72.25 * (ri - 8.0)
        return 400.0
    return 400.0


def calculate_incloud_mixingratios(qc, qr, qi, qm, nc, nr, ni, bm):
    """(micro_p3_utils.F90:238-292, cld_frac = 1.)  Returns the 8 incld
    values, including the in-cloud magnitude caps."""
    if qc >= QSMALL:
        qc_incld, nc_incld = qc, max(nc, 0.0)
    else:
        qc_incld = nc_incld = 0.0
    if qi >= QSMALL:
        qi_incld, ni_incld = qi, max(ni, 0.0)
    else:
        qi_incld = ni_incld = 0.0
    if qm >= QSMALL and qi >= QSMALL:
        qm_incld, bm_incld = qm, max(bm, 0.0)
    else:
        qm_incld = bm_incld = 0.0
    if qr >= QSMALL:
        qr_incld, nr_incld = qr, max(nr, 0.0)
    else:
        qr_incld = nr_incld = 0.0
    if (qc_incld > INCLOUD_LIMIT or qi_incld > INCLOUD_LIMIT
            or qr_incld > PRECIP_LIMIT or bm_incld > INCLOUD_LIMIT):
        qc_incld = min(qc_incld, INCLOUD_LIMIT)
        qi_incld = min(qi_incld, INCLOUD_LIMIT)
        bm_incld = min(bm_incld, INCLOUD_LIMIT)
        qr_incld = min(qr_incld, PRECIP_LIMIT)
    return (qc_incld, qr_incld, qi_incld, qm_incld, nc_incld, nr_incld,
            ni_incld, bm_incld)


# ---------------------------------------------------------------------------
# p3_main composition: part1 -> part2 -> sedimentation -> homogeneous
# freezing -> part3 (micro_p3.F90 p3_main:1141-1506).  Single column,
# arrays bottom-up (index 0 = kbot = surface), cld_frac_* = 1,
# do_predict_nc = false, do_prescribed_CCN = false -- the reference
# wrapper's configuration (microphysics_p3.h:291-314).
# ---------------------------------------------------------------------------
def p3_main_part1(dt, pres, exner, rho, rho_d, qv, th, qc, nc, qr, nr,
                  qi, ni, qm, bm):
    """(micro_p3.F90:363-481.)  Mutates the passed arrays in place and
    returns the part1 environment dict.  ``rho`` is the total-density
    array both sides share (the reference derives it hydrostatically from
    dpres, the repo wrapper from rho_d and the mixing ratios -- a wrapper
    choice outside the scheme proper)."""
    nz = len(qv)
    env = {k: np.zeros(nz) for k in
           ("t_atm", "inv_rho", "qv_sat_l", "qv_sat_i", "qv_supersat_i",
            "rhofacr", "rhofaci", "acn")}
    incld = {k: np.zeros(nz) for k in
             ("qc_incld", "qr_incld", "qi_incld", "qm_incld", "nc_incld",
              "nr_incld", "ni_incld", "bm_incld")}
    is_nucleat_possible = False
    is_hydromet_present = False
    env["rho_d"] = np.asarray(rho_d, dtype=float)
    t_atm = th * exner   # beginning-of-step temperature
    lv, ls, lf = LATVAP, LATVAP + LATICE, LATICE
    for k in range(nz):
        inv_rho = 1.0 / rho[k]
        env["inv_rho"][k] = inv_rho
        env["qv_sat_l"][k] = qv_sat(t_atm[k], pres[k], 0)
        env["qv_sat_i"][k] = qv_sat(t_atm[k], pres[k], 1)
        env["qv_supersat_i"][k] = qv[k] / env["qv_sat_i"][k] - 1.0
        env["rhofacr"][k] = (RHO_1000MB * inv_rho) ** 0.54
        env["rhofaci"][k] = (RHO_600MB * inv_rho) ** 0.54
        mu = 1.496e-6 * t_atm[k] ** 1.5 / (t_atm[k] + 120.0)
        env["acn"][k] = GRAV * RHO_H2O / (18.0 * mu)

        if t_atm[k] < T0 and env["qv_supersat_i"][k] >= -0.05:
            is_nucleat_possible = True

        inv_exner = 1.0 / exner[k]
        if qc[k] < QSMALL:
            qv[k] += qc[k]
            th[k] -= inv_exner * qc[k] * lv * INV_CP
            qc[k] = 0.0
            nc[k] = 0.0
        else:
            is_hydromet_present = True
            nc[k] = NCCNST * inv_rho    # do_predict_nc = false

        if qr[k] < QSMALL:
            qv[k] += qr[k]
            th[k] -= inv_exner * qr[k] * lv * INV_CP
            qr[k] = 0.0
            nr[k] = 0.0
        else:
            is_hydromet_present = True

        if qi[k] < QSMALL or (qi[k] < 1.0e-8
                              and env["qv_supersat_i"][k] < -0.1):
            qv[k] += qi[k]
            th[k] -= inv_exner * qi[k] * ls * INV_CP
            qi[k] = 0.0
            ni[k] = 0.0
            qm[k] = 0.0
            bm[k] = 0.0
        else:
            is_hydromet_present = True

        if qi[k] >= QSMALL and qi[k] < 1.0e-8 and t_atm[k] >= T0:
            qr[k] += qi[k]
            th[k] -= inv_exner * qi[k] * lf * INV_CP
            qi[k] = 0.0
            ni[k] = 0.0
            qm[k] = 0.0
            bm[k] = 0.0

        env["t_atm"][k] = th[k] * exner[k]

        (incld["qc_incld"][k], incld["qr_incld"][k], incld["qi_incld"][k],
         incld["qm_incld"][k], incld["nc_incld"][k], incld["nr_incld"][k],
         incld["ni_incld"][k], incld["bm_incld"][k]) = \
            calculate_incloud_mixingratios(qc[k], qr[k], qi[k], qm[k],
                                           nc[k], nr[k], ni[k], bm[k])
    env.update(incld)
    return env, is_nucleat_possible, is_hydromet_present


def p3_main_part2(tables, vn_table, vm_table, revap_table, dt, pres,
                  exner, rho, qv_prev, t_prev, env, qv, th, qc, nc, qr,
                  nr, qi, ni, qm, bm):
    """(micro_p3.F90:483-975.)  Mutates arrays + env in place; returns
    is_hydromet_present."""
    nz = len(qv)
    inv_dt = 1.0 / dt
    lv, ls, lf = LATVAP, LATVAP + LATICE, LATICE
    ice_table = tables.ice
    coll_table = tables.collect
    is_hydromet_present = False
    mu_c = env["mu_c"] = np.zeros(nz)
    lamc = env["lamc"] = np.zeros(nz)
    mu_r = env["mu_r"] = np.zeros(nz)
    lamr = env["lamr"] = np.zeros(nz)

    for k in range(nz):
        t_atm = env["t_atm"][k]
        inv_rho = env["inv_rho"][k]
        inv_exner = 1.0 / exner[k]
        qv_sat_l = env["qv_sat_l"][k]
        qv_sat_i = env["qv_sat_i"][k]
        qv_supersat_i = env["qv_supersat_i"][k]
        rhofaci = env["rhofaci"][k]

        # level skip: dry and no hydrometeors (:588-595)
        log_exitlevel = (qc[k] < QSMALL and qr[k] < QSMALL
                         and qi[k] < QSMALL)
        if log_exitlevel and (t_atm < T0 and qv_supersat_i < -0.05):
            continue

        # initialize process rates
        au = ac = nc_accret = nc2nr_auto = nc_self = nr_self = ev = 0.0
        nr_evap = ncautr = 0.0
        sublim = nr_ice_shed = qc_frz = qrcol = shed = melt = qccol = 0.0
        qr_frz = qinuc = ni2nr_melt = nc_collect = ncshdc = nc_frz = 0.0
        nr_collect = ni_self = ni_nucleat = qidep = berg = 0.0
        nr_frz = ni_sublim = qwgrth = 0.0
        log_wetgrowth = False
        rho_qm_cloud = 400.0
        epsi = epsi_tot = 0.0
        cdist = cdist1 = cdistr = logn0r = 0.0
        t2 = t4 = t5 = t7 = t8 = t10 = 0.0
        tcoll1 = tcoll2 = 0.0

        qc_incld = env["qc_incld"][k]
        qr_incld = env["qr_incld"][k]
        qi_incld = env["qi_incld"][k]
        qm_incld = env["qm_incld"][k]
        nc_incld = env["nc_incld"][k]
        nr_incld = env["nr_incld"][k]
        ni_incld = env["ni_incld"][k]
        bm_incld = env["bm_incld"][k]

        log_exitlevel = (qc_incld < QSMALL and qr_incld < QSMALL
                         and qi_incld < QSMALL)
        if not log_exitlevel:   # goto 444 skips to nucleation
            mu, dv, sc, dqsdt, dqsidt, ab, abi, kap, eii = \
                get_time_space_phys_variables(t_atm, pres[k], rho[k], lv,
                                              ls, qv_sat_l, qv_sat_i)

            nc_incld, mu_c[k], lamc[k], cdist, cdist1 = \
                get_cloud_dsd2(qc_incld, nc_incld, rho[k])
            nc[k] = nc_incld
            nr_incld, mu_r[k], lamr[k], cdistr, logn0r = \
                get_rain_dsd2(qr_incld, nr_incld)
            nr[k] = nr_incld

            ni_incld = impose_max_total_ni(ni_incld, inv_rho)

            if qi_incld >= QSMALL:
                ni_incld = max(ni_incld, NSMALL)
                nr_incld = max(nr_incld, NSMALL)
                qm_incld, bm_incld, rhop = calc_bulk_rho_rime(
                    qi_incld, qm_incld, bm_incld)
                qm[k] = qm_incld
                bm[k] = bm_incld
                dumi, dumjj, dumii, dum1, dum4, dum5 = \
                    find_lookup_table_indices_1a(qi_incld, ni_incld,
                                                 qm_incld, rhop)
                dumj, dum3 = find_lookup_table_indices_1b(qr_incld,
                                                          nr_incld)
                args = (dumjj, dumii, dumi)
                t2 = access_lookup_table(ice_table, *args, 2, dum1, dum4,
                                         dum5)
                t3 = access_lookup_table(ice_table, *args, 3, dum1, dum4,
                                         dum5)
                t4 = access_lookup_table(ice_table, *args, 4, dum1, dum4,
                                         dum5)
                t5 = access_lookup_table(ice_table, *args, 5, dum1, dum4,
                                         dum5)
                t7 = access_lookup_table(ice_table, *args, 7, dum1, dum4,
                                         dum5)
                t8 = access_lookup_table(ice_table, *args, 8, dum1, dum4,
                                         dum5)
                t10 = access_lookup_table(ice_table, *args, 10, dum1,
                                          dum4, dum5)
                if qr_incld >= QSMALL:
                    tcoll1 = access_lookup_table_coll(
                        coll_table, dumjj, dumii, dumj, dumi, 1, dum1,
                        dum3, dum4, dum5)
                    tcoll2 = access_lookup_table_coll(
                        coll_table, dumjj, dumii, dumj, dumi, 2, dum1,
                        dum3, dum4, dum5)
                # ni lambda limiters (:675-678) -- in-cloud value only
                ni_incld = min(ni_incld, t7 * ni_incld)
                ni_incld = max(ni_incld, t8 * ni_incld)

                qccol, nc_collect, shed, ncshdc = ice_cldliq_collection(
                    rho[k], t_atm, rhofaci, t4, qi_incld, qc_incld,
                    ni_incld, nc_incld)
                qrcol, nr_collect = ice_rain_collection(
                    rho[k], t_atm, rhofaci, logn0r, tcoll1, tcoll2,
                    qi_incld, ni_incld, qr_incld)
                ni_self = ice_self_collection(
                    rho[k], rhofaci, t3, eii, qm_incld, qi_incld,
                    ni_incld)
                qsat0 = qv_sat(T0, pres[k], 0)
                melt, ni2nr_melt = ice_melting(
                    rho[k], t_atm, rhofaci, t5, t10, lv, lf, dv, sc, mu,
                    kap, qv[k], qsat0, qi_incld, ni_incld)
                (qrcol, qccol, qwgrth, nr_ice_shed, shed,
                 log_wetgrowth) = ice_cldliq_wet_growth(
                    rho[k], t_atm, rhofaci, t5, t10, lv, lf, dv, kap, mu,
                    sc, qv[k], qsat0, qc_incld, qi_incld, ni_incld,
                    qr_incld, qrcol, qccol, nr_ice_shed, shed)
                epsi = calc_ice_relaxation_timescale(
                    rho[k], t_atm, rhofaci, t5, t10, dv, mu, sc,
                    qi_incld, ni_incld)
                epsi_tot += epsi
                rho_qm_cloud = calc_rime_density(
                    t_atm, rhofaci, t2, env["acn"][k], lamc[k], mu_c[k],
                    qc_incld, qccol)

            qc_frz, nc_frz = cldliq_immersion_freezing(
                t_atm, lamc[k], mu_c[k], cdist1, qc_incld)
            qr_frz, nr_frz = rain_immersion_freezing(
                t_atm, lamr[k], mu_r[k], cdistr, qr_incld)

            epsr = calc_liq_relaxation_timescale(
                revap_table, rho[k], dv, mu, sc, mu_r[k], lamr[k], cdistr,
                qr_incld)
            ev, nr_evap = evaporate_rain(
                qr_incld, qc_incld, nr_incld, qi_incld, qv[k], qv_prev[k],
                qv_sat_l, qv_sat_i, ab, abi, epsr, epsi_tot, t_atm,
                t_prev[k], ls, dqsdt, dt)
            qidep, sublim, ni_sublim, berg = ice_deposition_sublimation(
                qi_incld, ni_incld, t_atm, qv_sat_l, qv_sat_i, epsi, abi,
                qv[k], inv_dt)

        # 444: nucleation runs even when no hydrometeors are present
        qinuc, ni_nucleat = ice_nucleation(
            t_atm, inv_rho, ni[k], qv_supersat_i, dt)

        au, nc2nr_auto, ncautr = cloud_water_autoconversion(
            qc_incld, nc_incld, rho[k])
        nc_self = 0.0  # droplet_self_collection, iparam = 3 (:2646-2648)
        ac, nc_accret = cloud_rain_accretion(qc_incld, nc_incld, qr_incld)
        nr_self = rain_self_collection(rho[k], qr_incld, nr_incld)

        # back_to_cell_average is the identity at cld_frac_* = 1 (:2786)

        (au, ac, qccol, qc_frz, shed, berg, sublim, qidep) = \
            cloud_water_conservation(qc[k], dt, au, ac, qccol, qc_frz,
                                     shed, berg, sublim, qidep)
        ev, qrcol, qr_frz = rain_water_conservation(
            qr[k], au, ac, melt, shed, dt, ev, qrcol, qr_frz)
        sublim, melt = ice_water_conservation(
            qi[k], qidep, qinuc, berg, qrcol, qccol, qr_frz, qc_frz, dt,
            sublim, melt)
        nc_collect, nc_frz, nc_accret, nc2nr_auto = nc_conservation(
            nc[k], nc_self, dt, nc_collect, nc_frz, nc_accret, nc2nr_auto)
        nr_collect, nr_frz, nr_self, nr_evap = nr_conservation(
            nr[k], ni2nr_melt, nr_ice_shed, ncshdc, nc2nr_auto, dt,
            NMLTRATIO, nr_collect, nr_frz, nr_self, nr_evap)
        ni2nr_melt, ni_sublim, ni_self = ni_conservation(
            ni[k], ni_nucleat, nr_frz, nc_frz, dt, ni2nr_melt, ni_sublim,
            ni_self)
        qidep, qinuc = ice_supersat_conservation(
            qidep, qinuc, qv[k], qv_sat_i, ls, th[k] * exner[k], dt,
            sublim, ev)
        sublim, ev = prevent_liq_supersaturation(
            qv[k], t_atm, lv, ls, dt, qidep, qinuc, sublim, ev,
            lambda t, kk=k: qv_sat(t, pres[kk], 0))

        (th[k], qv[k], qi[k], ni[k], qm[k], bm[k], qc[k], nc[k], qr[k],
         nr[k]) = update_prognostic_ice(
            qc_frz, qccol, shed, nc_collect, nc_frz, ncshdc, qrcol,
            nr_collect, qr_frz, nr_frz, nr_ice_shed, melt, ni2nr_melt,
            sublim, qidep, qinuc, ni_nucleat, ni_self, ni_sublim, berg,
            inv_exner, ls, lf, False, log_wetgrowth, dt, rho_qm_cloud,
            th[k], qv[k], qi[k], ni[k], qm[k], bm[k], qc[k], nc[k],
            qr[k], nr[k])
        th[k], qv[k], qc[k], nc[k], qr[k], nr[k] = \
            update_prognostic_liquid(
                ac, nc_accret, au, nc2nr_auto, ncautr, nc_self, ev,
                nr_evap, nr_self, False, inv_rho, inv_exner, lv, dt,
                th[k], qv[k], qc[k], nc[k], qr[k], nr[k])

        # end-of-part2 clipping (:893-920)
        if qc[k] < QSMALL:
            qv[k] += qc[k]
            th[k] -= inv_exner * qc[k] * lv * INV_CP
            qc[k] = 0.0
            nc[k] = 0.0
        else:
            is_hydromet_present = True
        if qr[k] < QSMALL:
            qv[k] += qr[k]
            th[k] -= inv_exner * qr[k] * lv * INV_CP
            qr[k] = 0.0
            nr[k] = 0.0
        else:
            is_hydromet_present = True
        if qi[k] < QSMALL:
            qv[k] += qi[k]
            th[k] -= inv_exner * qi[k] * ls * INV_CP
            qi[k] = 0.0
            ni[k] = 0.0
            qm[k] = 0.0
            bm[k] = 0.0
        else:
            is_hydromet_present = True

        # ni cap on in-cloud value (:921-925)
        ni_incld2 = ni[k]
        ni_incld2 = impose_max_total_ni(ni_incld2, inv_rho)
        ni[k] = ni_incld2

        # recompute in-cloud values for sedimentation (:963)
        (env["qc_incld"][k], env["qr_incld"][k], env["qi_incld"][k],
         env["qm_incld"][k], env["nc_incld"][k], env["nr_incld"][k],
         env["ni_incld"][k], env["bm_incld"][k]) = \
            calculate_incloud_mixingratios(qc[k], qr[k], qi[k], qm[k],
                                           nc[k], nr[k], ni[k], bm[k])

    return is_hydromet_present


def _first_order_upwind_step(k_bot_eff, k_qxtop, dt_sub, rho, inv_dz,
                             vs, qnx):
    """(calc_first_order_upwind_step, micro_p3.F90:4110-4143.)  Arrays
    bottom-up; sedimentation moves mass downward (from k+1 into k).
    Returns the per-array surface fluxes list."""
    fluxes = [v * q * rho for v, q in zip(vs, qnx)]
    for fl, q in zip(fluxes, qnx):
        k = k_qxtop
        q[k] += -fl[k] * inv_dz[k] * dt_sub / rho[k]
        for k in range(k_qxtop - 1, k_bot_eff - 1, -1):
            fluxdiv = (fl[k + 1] - fl[k]) * inv_dz[k]
            q[k] += fluxdiv * dt_sub / rho[k]
    return fluxes


def _generalized_sedimentation(k_qxtop, k_qxbot, kbot, co_max, dt_left,
                               prt_accum, inv_dz, rho, vs, qnx):
    """(micro_p3.F90:4067-4108.)  Returns (k_qxbot, dt_left, prt_accum)."""
    tmpint1 = int(co_max + 1.0)
    dt_sub = min(dt_left, dt_left / float(tmpint1))
    if k_qxbot == kbot:
        k_temp = k_qxbot
    else:
        k_temp = k_qxbot - 1
    fluxes = _first_order_upwind_step(k_temp, k_qxtop, dt_sub, rho,
                                      inv_dz, vs, qnx)
    if k_qxbot == kbot:
        prt_accum += fluxes[0][kbot] * dt_sub
    dt_left -= dt_sub
    if k_qxbot != kbot:
        k_qxbot -= 1
    return k_qxbot, dt_left, prt_accum


def _find_top_bot(q, nz):
    """Top/bottom of the qx >= qsmall layer, bottom-up arrays."""
    k_qxtop = None
    for k in range(nz - 1, -1, -1):
        if q[k] >= QSMALL:
            k_qxtop = k
            break
    if k_qxtop is None:
        return None, None
    k_qxbot = 0
    for k in range(0, k_qxtop + 1):
        if q[k] >= QSMALL:
            k_qxbot = k
            break
    return k_qxtop, k_qxbot


def cloud_sedimentation(dt, rho, inv_dz, env, qc, nc):
    """(micro_p3.F90:3587-3749, do_predict_nc = false 1-moment branch.)
    Returns precip_liq_surf contribution (pre inv_rho_h2o inv_dt)."""
    nz = len(qc)
    prt_accum = 0.0
    bcn = 2.0
    k_qxtop, k_qxbot = _find_top_bot(qc, nz)
    if k_qxtop is None:
        return 0.0
    dt_left = dt
    while dt_left > 1.0e-4:
        co_max = 0.0
        v_qc = np.zeros(nz)
        for k in range(k_qxtop, k_qxbot - 1, -1):
            if env["qc_incld"][k] > QSMALL:
                (env["nc_incld"][k], mu_c, lamc, _, _) = get_cloud_dsd2(
                    env["qc_incld"][k], env["nc_incld"][k], rho[k])
                nc[k] = env["nc_incld"][k]
                dum = 1.0 / lamc ** bcn
                v_qc[k] = (env["acn"][k]
                           * math.gamma(4.0 + bcn + mu_c) * dum
                           / math.gamma(mu_c + 4.0))
            co_max = max(co_max, v_qc[k] * dt_left * inv_dz[k])
        k_qxbot, dt_left, prt_accum = _generalized_sedimentation(
            k_qxtop, k_qxbot, 0, co_max, dt_left, prt_accum, inv_dz, rho,
            [v_qc], [qc])
        for k in range(nz):
            env["qc_incld"][k] = qc[k]
            env["nc_incld"][k] = nc[k]
    return prt_accum


def rain_sedimentation(dt, rho, inv_dz, vn_table, vm_table, env, qr, nr):
    """(micro_p3.F90:3749-3869.)  Returns precip accumulation."""
    nz = len(qr)
    prt_accum = 0.0
    k_qxtop, k_qxbot = _find_top_bot(qr, nz)
    if k_qxtop is None:
        return 0.0
    dt_left = dt
    while dt_left > 1.0e-4:
        co_max = 0.0
        v_qr = np.zeros(nz)
        v_nr = np.zeros(nz)
        for k in range(k_qxtop, k_qxbot - 1, -1):
            if env["qr_incld"][k] > QSMALL:
                (env["nr_incld"][k], mu_r, lamr, v_qr[k], v_nr[k]) = \
                    compute_rain_fall_velocity(
                        vn_table, vm_table, env["qr_incld"][k],
                        env["rhofacr"][k], env["nr_incld"][k])
                nr[k] = env["nr_incld"][k]
            co_max = max(co_max, v_qr[k] * dt_left * inv_dz[k])
        k_qxbot, dt_left, prt_accum = _generalized_sedimentation(
            k_qxtop, k_qxbot, 0, co_max, dt_left, prt_accum, inv_dz, rho,
            [v_qr, v_nr], [qr, nr])
        for k in range(nz):
            env["qr_incld"][k] = qr[k]
            env["nr_incld"][k] = nr[k]
    return prt_accum


def ice_sedimentation(dt, rho, inv_dz, tables, env, qi, ni, qm, bm):
    """(micro_p3.F90:3911-4065.)  Returns precip accumulation."""
    nz = len(qi)
    prt_accum = 0.0
    ice_table = tables.ice
    k_qxtop, k_qxbot = _find_top_bot(qi, nz)
    if k_qxtop is None:
        return 0.0
    dt_left = dt
    while dt_left > 1.0e-4:
        co_max = 0.0
        v_qit = np.zeros(nz)
        v_nit = np.zeros(nz)
        for k in range(k_qxtop, k_qxbot - 1, -1):
            if env["qi_incld"][k] > QSMALL:
                env["ni_incld"][k] = max(env["ni_incld"][k], NSMALL)
                (env["qm_incld"][k], env["bm_incld"][k], rhop) = \
                    calc_bulk_rho_rime(env["qi_incld"][k],
                                       env["qm_incld"][k],
                                       env["bm_incld"][k])
                qm[k] = env["qm_incld"][k]
                bm[k] = env["bm_incld"][k]
                dumi, dumjj, dumii, dum1, dum4, dum5 = \
                    find_lookup_table_indices_1a(
                        env["qi_incld"][k], env["ni_incld"][k],
                        env["qm_incld"][k], rhop)
                args = (dumjj, dumii, dumi)
                t1 = access_lookup_table(ice_table, *args, 1, dum1, dum4,
                                         dum5)
                t2 = access_lookup_table(ice_table, *args, 2, dum1, dum4,
                                         dum5)
                t7 = access_lookup_table(ice_table, *args, 7, dum1, dum4,
                                         dum5)
                t8 = access_lookup_table(ice_table, *args, 8, dum1, dum4,
                                         dum5)
                env["ni_incld"][k] = min(env["ni_incld"][k],
                                         t7 * env["ni_incld"][k])
                env["ni_incld"][k] = max(env["ni_incld"][k],
                                         t8 * env["ni_incld"][k])
                ni[k] = env["ni_incld"][k]
                v_qit[k] = t2 * env["rhofaci"][k]
                v_nit[k] = t1 * env["rhofaci"][k]
            co_max = max(co_max, v_qit[k] * dt_left * inv_dz[k])
        k_qxbot, dt_left, prt_accum = _generalized_sedimentation(
            k_qxtop, k_qxbot, 0, co_max, dt_left, prt_accum, inv_dz, rho,
            [v_qit, v_nit, v_qit, v_qit], [qi, ni, qm, bm])
        for k in range(nz):
            env["qi_incld"][k] = qi[k]
            env["ni_incld"][k] = ni[k]
            env["qm_incld"][k] = qm[k]
            env["bm_incld"][k] = bm[k]
    return prt_accum


def p3_main_part3(tables, env, exner, rho, qv, th, qc, nc, qr, nr, qi,
                  ni, qm, bm):
    """(micro_p3.F90:977-1137.)  Returns the diagnostic outputs as a dict
    of per-level arrays (the reference wrapper discards them; kept here
    to anchor the scheme's opt-in diagnostics).  Defaults per p3_main
    :1307-1315: eff_radius_qc 10 um, eff_radius_qi 25 um, ze 1e-22."""
    nz = len(qv)
    lv, ls = LATVAP, LATVAP + LATICE
    ice_table = tables.ice
    diag = dict(
        eff_radius_qc=np.full(nz, 10.0e-6), eff_radius_qi=np.full(nz, 25.0e-6),
        diam_qi=np.zeros(nz), rho_qi=np.zeros(nz), vm_qi=np.zeros(nz),
        equiv_reflectivity=np.zeros(nz))
    ze_rain = np.full(nz, 1.0e-22)
    ze_ice = np.full(nz, 1.0e-22)
    for k in range(nz):
        inv_exner = 1.0 / exner[k]
        # cloud
        if qc[k] >= QSMALL:
            nc_incld, mu_c, lamc, _, _ = get_cloud_dsd2(qc[k], nc[k],
                                                        rho[k])
            nc[k] = nc_incld
            diag["eff_radius_qc"][k] = 0.5 * (mu_c + 3.0) / lamc  # :1026
        else:
            qv[k] += qc[k]
            th[k] -= inv_exner * qc[k] * lv * INV_CP
            qc[k] = 0.0
            nc[k] = 0.0
        # rain
        if qr[k] >= QSMALL:
            nr_incld, mu_r, lamr, _, _ = get_rain_dsd2(qr[k], nr[k])
            nr[k] = nr_incld
            # :1046-1048
            ze_rain[k] = (nr[k] * (mu_r + 6.0) * (mu_r + 5.0)
                          * (mu_r + 4.0) * (mu_r + 3.0) * (mu_r + 2.0)
                          * (mu_r + 1.0) / lamr ** 6)
            ze_rain[k] = max(ze_rain[k], 1.0e-22)
        else:
            qv[k] += qr[k]
            th[k] -= inv_exner * qr[k] * lv * INV_CP
            qr[k] = 0.0
            nr[k] = 0.0
        # ice
        if qi[k] >= QSMALL:
            ni[k] = max(ni[k], NSMALL)
            qm[k], bm[k], rhop = calc_bulk_rho_rime(qi[k], qm[k], bm[k])
            ni_incld = impose_max_total_ni(ni[k], env["inv_rho"][k])
            dumi, dumjj, dumii, dum1, dum4, dum5 = \
                find_lookup_table_indices_1a(qi[k], ni_incld, qm[k], rhop)
            args = (dumjj, dumii, dumi)
            t2, t6, t7, t8, t9, t11, t12 = (
                access_lookup_table(ice_table, *args, c, dum1, dum4, dum5)
                for c in (2, 6, 7, 8, 9, 11, 12))
            ni_incld = min(ni_incld, t7 * ni_incld)
            ni_incld = max(ni_incld, t8 * ni_incld)
            ni[k] = ni_incld
            if qm[k] < QSMALL:
                qm[k] = 0.0
                bm[k] = 0.0
            # :1102-1112 diagnostics (rhofaci = (rho_600mb/rho)^0.54)
            rhofaci = (60000.0 / (287.042 * 253.15) / rho[k]) ** 0.54
            diag["vm_qi"][k] = t2 * rhofaci
            diag["eff_radius_qi"][k] = t6
            diag["diam_qi"][k] = t11
            diag["rho_qi"][k] = t12
            ze_ice[k] = max(ze_ice[k] + 0.1892 * t9 * ni_incld * rho[k],
                            1.0e-22)
        else:
            qv[k] += qi[k]
            th[k] -= inv_exner * qi[k] * ls * INV_CP
            qi[k] = 0.0
            ni[k] = 0.0
            qm[k] = 0.0
            bm[k] = 0.0
        if qr[k] < QSMALL:
            nr[k] = 0.0
        # :1127
        diag["equiv_reflectivity"][k] = \
            10.0 * np.log10((ze_rain[k] + ze_ice[k]) * 1.0e18)
    return diag


def p3_main_step(tables, qc, nc, qr, nr, qi, ni, qm, bm, qv, th, exner,
                 pres, rho_d, dz, dt, qv_prev=None, t_prev=None,
                 return_diag=False):
    """One full p3_main step (micro_p3.F90:1141-1506) on a single column,
    bottom-up arrays, the reference wrapper's configuration
    (do_predict_nc = false, do_prescribed_CCN = false, cld_frac = 1).
    Returns (qc, nc, qr, nr, qi, ni, qm, bm, qv, th, precip_liq_surf,
    precip_ice_surf); with ``return_diag`` also part3's diagnostic dict
    (p3_main init values :1307-1315 when part3 is skipped)."""
    qc, nc, qr, nr = (np.array(a, dtype=float) for a in (qc, nc, qr, nr))
    qi, ni, qm, bm = (np.array(a, dtype=float) for a in (qi, ni, qm, bm))
    qv, th = np.array(qv, dtype=float), np.array(th, dtype=float)
    exner = np.asarray(exner, dtype=float)
    pres = np.asarray(pres, dtype=float)
    rho_d = np.asarray(rho_d, dtype=float)
    dz = np.asarray(dz, dtype=float)
    inv_dz = 1.0 / dz
    inv_dt = 1.0 / dt
    # total density: the repo wrapper's definition (physics/p3.py:206);
    # the reference computes it hydrostatically from dpres -- a wrapper
    # choice shared by both sides of the comparison here.
    rho = rho_d * (1.0 + qv + qc + qr + qi)
    qv = np.maximum(qv, 0.0)   # p3_main:1338
    t_begin = th * exner
    if qv_prev is None:
        qv_prev = qv.copy()
    if t_prev is None:
        t_prev = t_begin.copy()

    vn_table, vm_table, revap_table = generate_rain_tables()

    env, is_nucleat_possible, is_hydromet_present = p3_main_part1(
        dt, pres, exner, rho, rho_d, qv, th, qc, nc, qr, nr, qi, ni, qm,
        bm)
    precip_liq_surf = 0.0
    precip_ice_surf = 0.0
    nz = len(qv)
    diag = dict(
        eff_radius_qc=np.full(nz, 10.0e-6),
        eff_radius_qi=np.full(nz, 25.0e-6), diam_qi=np.zeros(nz),
        rho_qi=np.zeros(nz), vm_qi=np.zeros(nz),
        equiv_reflectivity=np.full(nz, -99.0))
    if is_nucleat_possible or is_hydromet_present:
        is_hydromet_present = p3_main_part2(
            tables, vn_table, vm_table, revap_table, dt, pres, exner,
            rho, qv_prev, t_prev, env, qv, th, qc, nc, qr, nr, qi, ni,
            qm, bm)
        if is_hydromet_present:
            prt_liq = cloud_sedimentation(dt, rho, inv_dz, env, qc, nc)
            prt_liq += rain_sedimentation(dt, rho, inv_dz, vn_table,
                                          vm_table, env, qr, nr)
            prt_sol = ice_sedimentation(dt, rho, inv_dz, tables, env,
                                        qi, ni, qm, bm)
            precip_liq_surf = prt_liq / RHO_H2O * inv_dt
            precip_ice_surf = prt_sol / RHO_H2O * inv_dt
            # homogeneous freezing (:1452-1454).  NOTE: the reference
            # passes the t_atm array frozen at the END OF PART1 -- part2's
            # latent heating and sedimentation do not refresh it.
            for k in range(len(qv)):
                (qc[k], nc[k], qr[k], nr[k], qi[k], ni[k], qm[k], bm[k],
                 th[k]) = homogeneous_freezing(
                    env["t_atm"][k], 1.0 / exner[k], LATICE, qc[k],
                    nc[k], qr[k], nr[k], qi[k], ni[k], qm[k], bm[k],
                    th[k])
            diag = p3_main_part3(tables, env, exner, rho, qv, th, qc, nc,
                                 qr, nr, qi, ni, qm, bm)
    out = (qc, nc, qr, nr, qi, ni, qm, bm, qv, th, precip_liq_surf,
           precip_ice_surf)
    return out + (diag,) if return_diag else out
