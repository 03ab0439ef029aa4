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
ratios, latent heats) are ARGUMENTS, not computed here -- the repo scheme's
Magnus-form svp stand-ins (documented deviation from wv_sat_scream) enter
both sides identically, so these oracles pin the process formulas proper.

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
CONS3 = 1.0 / (CONS1 * 25.0e-6 ** 3)      # :175 (25 um drops)
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
