"""P3 external anchor: the production scheme vs the independent NumPy
oracle (tests/oracle_p3.py), transliterated from the vendored SCREAM P3
Fortran in a second, separate pass.

Two layers of cross-check:
  1. Function-level: the table machinery (index finding + interpolation on
     the real v4.1.1 asset), the generated rain tables, and the DSD
     subroutines, compared between the vectorized library implementations
     (physics/p3_tables.py) and the oracle's scalar transliterations.
  2. Process-isolation: single-process column setups where the observed
     p3_scheme tendency equals a known combination of oracle rates (the
     scheme applies all tendencies from pre-update values, so the
     extraction is exact, not first-order).  Thermodynamic inputs
     (Murphy-Koop qv_sat, as the Fortran scheme uses; the Magnus svp
     belongs to the wrapper's pre-adjustment) are fed to the oracle as
     arguments, exactly as the Fortran subroutines receive qv_sat_l/i.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from miniweatherml_tpu.physics import p3 as P
from miniweatherml_tpu.physics import p3_tables as PT
from miniweatherml_tpu.physics.p3 import p3_scheme
from tests import oracle_p3 as O

tables = pytest.importorskip("miniweatherml_tpu.physics.p3_tables")


@pytest.fixture(scope="module")
def tbl():
    return PT.load_p3_tables()


# ---------------------------------------------------------------------------
# 1. function-level cross-checks
# ---------------------------------------------------------------------------
def test_ice_table_interpolation_matches_oracle(tbl):
    """Vectorized index finding + quad-linear interpolation
    (p3_tables.ice_table_indices/interp_ice) vs the oracle transliteration
    of find_lookupTable_indices_1a + access_lookup_table
    (micro_p3.F90:1620-1677, :1508-1545) on the real v4.1.1 asset."""
    rng = np.random.default_rng(0)
    ice_np = np.asarray(tbl.ice, np.float64)
    for _ in range(200):
        qi = 10.0 ** rng.uniform(-12, -2)
        ni = 10.0 ** rng.uniform(-2, 8)
        fr = rng.uniform(0.0, 1.0)
        qm = qi * fr
        rhop = rng.uniform(20.0, 1000.0)
        dumi, dumjj, dumii, dum1, dum4, dum5 = (
            O.find_lookup_table_indices_1a(qi, ni, qm, rhop))
        idx = PT.ice_table_indices(jnp.float64(qi), jnp.float64(ni),
                                   jnp.float64(qm), jnp.float64(rhop))
        for col in (2, 3, 4, 5, 7, 8, 10):
            want = O.access_lookup_table(ice_np, dumjj, dumii, dumi, col,
                                         dum1, dum4, dum5)
            got = float(PT.interp_ice(tbl, col, *idx))
            assert got == pytest.approx(want, rel=1e-12, abs=1e-300), (
                f"col {col}: qi={qi} ni={ni} qm={qm} rhop={rhop}")


def test_collect_table_interpolation_matches_oracle(tbl):
    """interp_collect vs the oracle access_lookup_table_coll +
    find_lookupTable_indices_1b (micro_p3.F90:1547-1605, :1681-1720).
    Note the library returns 10**value (the log10 table exponentiated)."""
    rng = np.random.default_rng(1)
    coll_np = np.asarray(tbl.collect, np.float64)
    for _ in range(100):
        qi = 10.0 ** rng.uniform(-10, -3)
        ni = 10.0 ** rng.uniform(0, 7)
        qm = qi * rng.uniform(0.0, 1.0)
        rhop = rng.uniform(50.0, 900.0)
        qr = 10.0 ** rng.uniform(-10, -3)
        nr = 10.0 ** rng.uniform(0, 7)
        dumi, dumjj, dumii, dum1, dum4, dum5 = (
            O.find_lookup_table_indices_1a(qi, ni, qm, rhop))
        dumj, dum3 = O.find_lookup_table_indices_1b(qr, nr)
        idx = PT.ice_table_indices(jnp.float64(qi), jnp.float64(ni),
                                   jnp.float64(qm), jnp.float64(rhop))
        j0, fj = PT.rain_collection_index(jnp.float64(qr), jnp.float64(nr))
        for col in (1, 2):
            want = 10.0 ** O.access_lookup_table_coll(
                coll_np, dumjj, dumii, dumj, dumi, col, dum1, dum3, dum4,
                dum5)
            got = float(PT.interp_collect(tbl, col, *idx, j0, fj))
            assert got == pytest.approx(want, rel=1e-12), f"col {col}"


def test_rain_tables_match_oracle_generation():
    """p3_tables.generate_rain_tables vs the oracle's direct transliteration
    of the p3_init_b do-loops (micro_p3.F90:236-351)."""
    vn_l, vm_l, revap_l = PT.generate_rain_tables()
    vn_o, vm_o, revap_o = O.generate_rain_tables()
    np.testing.assert_allclose(np.asarray(vn_l), vn_o, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(vm_l), vm_o, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(revap_l), revap_o, rtol=1e-10)


def test_rain_fall_speed_interpolation_matches_oracle():
    """p3_tables rain_size_index + interp_rain vs the oracle
    compute_rain_fall_velocity (find_lookupTable_indices_3 + vn/vm
    interpolation, micro_p3.F90:3872-3908, :1725-1770)."""
    vn, vm, _ = PT.generate_rain_tables()
    vn_np, vm_np = np.asarray(vn), np.asarray(vm)
    rng = np.random.default_rng(2)
    for _ in range(100):
        qr = 10.0 ** rng.uniform(-9, -2)
        nr = 10.0 ** rng.uniform(1, 8)
        nr_o, mu_r, lamr, v_qr_o, v_nr_o = O.compute_rain_fall_velocity(
            vn_np, vm_np, qr, 1.0, nr)
        # library path (physics/p3.py rain_fallspeed at the table tier,
        # after the same get_rain_dsd2 nr adjustment)
        lam = np.cbrt(O.CONS1 * 24.0 * max(nr_o, O.NSMALL) / qr)
        i0, fi = PT.rain_size_index(jnp.float64((O.MU_R_CONSTANT + 1.0)
                                                / lam))
        v_qr_l = float(PT.interp_rain(vm, i0, fi))
        v_nr_l = float(PT.interp_rain(vn, i0, fi))
        assert v_qr_l == pytest.approx(v_qr_o, rel=1e-10)
        assert v_nr_l == pytest.approx(v_nr_o, rel=1e-10)


# ---------------------------------------------------------------------------
# 2. process-isolation checks against p3_scheme
# ---------------------------------------------------------------------------
NZ = 5          # uniform column: middle cell is sedimentation-neutral
MID = 2
DT = 0.1


def _uniform_column(temp, pres, qv, qc=0.0, qr=0.0, nr=0.0, qi=0.0, ni=0.0,
                    qm=0.0, bm=0.0):
    """Vertically uniform (1, NZ, 1, 1) column: interior cells see zero
    sedimentation flux divergence, so mid-cell changes are pure process
    tendencies (+ homogeneous freezing / part3, avoided by construction)."""
    shape = (1, NZ, 1, 1)
    rho_d = pres / (287.042 * temp)
    exner = (pres / 1.0e5) ** (287.042 / 1004.64)
    arr = lambda v: jnp.full(shape, v, jnp.float64)
    return dict(
        qc=arr(qc), nc=arr(0.0), qr=arr(qr), nr=arr(nr), qi=arr(qi),
        ni=arr(ni), qm=arr(qm), bm=arr(bm), qv=arr(qv),
        theta=arr(temp / exner), exner=arr(exner), pres=arr(pres),
        rho_d=arr(rho_d), dz=arr(400.0)), rho_d, exner


def _mid(a):
    return float(np.asarray(a)[0, MID, 0, 0])


def _thermo(temp, pres, rho_d, qv, qcond=0.0):
    """The scheme's thermodynamic inputs, fed to the oracle as arguments
    (Magnus svp is the repo's documented wv_sat stand-in).  ``qcond`` is
    the total condensate qc+qr+qi: the scheme's rho estimate includes it
    (p3_scheme: rho = rho_d * (1 + qv + qc + qr + qi))."""
    rho = rho_d * (1.0 + qv + qcond)
    # scheme-internal saturation is the Murphy-Koop mixing-ratio form
    # (wv_sat_scream qv_sat; the Magnus svp belongs to the wrapper)
    qsl = float(P.p3_qv_sat_liq(jnp.float64(temp), jnp.float64(pres)))
    qsi = float(P.p3_qv_sat_ice(jnp.float64(temp), jnp.float64(pres)))
    lv = 2501000.0
    ls = lv + 333700.0
    mu = 1.496e-6 * temp ** 1.5 / (temp + 120.0)
    dv = 8.794e-5 * temp ** 1.81 / pres
    sc = mu / (rho * dv)
    kap = 1.414e3 * mu
    dqsdt = lv * qsl / (461.505 * temp * temp)
    dqsidt = ls * qsi / (461.505 * temp * temp)
    ab = 1.0 + dqsdt * lv / 1004.64
    abi = 1.0 + dqsidt * ls / 1004.64
    return dict(rho=rho, qsl=qsl, qsi=qsi, lv=lv, ls=ls, mu=mu, dv=dv,
                sc=sc, kap=kap, dqsdt=dqsdt, dqsidt=dqsidt, ab=ab, abi=abi)


def test_autoconversion_rate_matches_oracle():
    """KK2000 autoconversion in isolation (cloud_water_autoconversion,
    micro_p3.F90:2750-2784): warm cloud, no rain/ice; dqr/dt = au,
    dnr/dt = ncautr exactly (pre-update tendencies)."""
    temp, pres, qv = 290.0, 9.0e4, 0.012
    col, rho_d, exner = _uniform_column(temp, pres, qv, qc=1.5e-3)
    th = _thermo(temp, pres, float(rho_d), qv, qcond=1.5e-3)
    out = p3_scheme(**col, dt=DT)
    nc_eff = 200.0e6 / th["rho"]           # prescribed (part1 :436)
    nc_eff, mu_c, lamc, cdist, cdist1 = O.get_cloud_dsd2(1.5e-3, nc_eff,
                                                         th["rho"])
    au, nc2nr, ncautr = O.cloud_water_autoconversion(1.5e-3, nc_eff,
                                                     th["rho"])
    dqr = _mid(out[2]) / DT
    assert dqr == pytest.approx(au, rel=1e-6)
    dnr = _mid(out[3]) / DT
    assert dnr == pytest.approx(ncautr, rel=1e-6)


def test_accretion_rate_matches_oracle():
    """KK2000 accretion (cloud_rain_accretion, micro_p3.F90:2655-2703):
    warm cloud+rain, saturated air (no evap); dqr/dt = au + ac."""
    temp, pres = 290.0, 9.0e4
    rho_d0 = pres / (287.042 * temp)
    qsl = float(P.saturation_vapor_pressure(temp)) / (461.505 * temp
                                                      * rho_d0)
    qv = qsl * 1.0001    # slightly supersaturated: ssat_r > 0 -> no evap
    qc0, qr0, nr0 = 1.0e-3, 5.0e-4, 5.0e7
    col, rho_d, exner = _uniform_column(temp, pres, qv, qc=qc0, qr=qr0,
                                        nr=nr0)
    th = _thermo(temp, pres, float(rho_d), qv, qcond=qc0 + qr0)
    out = p3_scheme(**col, dt=DT)
    nc_eff = 200.0e6 / th["rho"]
    nc_eff, *_ = O.get_cloud_dsd2(qc0, nc_eff, th["rho"])
    nr_eff, mu_r, lamr, cdistr, logn0r = O.get_rain_dsd2(qr0, nr0)
    au, _, ncautr = O.cloud_water_autoconversion(qc0, nc_eff, th["rho"])
    ac, _ = O.cloud_rain_accretion(qc0, nc_eff, qr0)
    nr_self = O.rain_self_collection(th["rho"], qr0, nr_eff)
    dqr = (_mid(out[2]) - qr0) / DT
    assert dqr == pytest.approx(au + ac, rel=1e-6)
    dnr = (_mid(out[3]) - nr_eff) / DT
    assert dnr == pytest.approx(ncautr - nr_self, rel=1e-5)


def test_immersion_freezing_rates_match_oracle():
    """DSD-integrated Bigg freezing of cloud and rain
    (cldliq/rain_immersion_freezing, micro_p3.F90:2504-2573) at -12 C
    (above T_icenuc so no nucleation, no pre-existing ice so no
    collection); big drops so the frozen mass exceeds qsmall within dt
    (otherwise part3's tiny-mass cleanup correctly reverts it):
    dqi/dt = Q_nuc_c + Q_nuc_r, dni/dt = N_nuc_c + N_nuc_r."""
    temp, pres = 261.15, 7.0e4
    qv = 1.0e-3          # subsaturated wrt both phases -> no dep
    qc0, qr0, nr0 = 1.0e-3, 5.0e-4, 1.0e6
    col, rho_d, exner = _uniform_column(temp, pres, qv, qc=qc0, qr=qr0,
                                        nr=nr0)
    th = _thermo(temp, pres, float(rho_d), qv, qcond=qc0 + qr0)
    out = p3_scheme(**col, dt=DT)
    nc_eff = 200.0e6 / th["rho"]
    nc_eff, mu_c, lamc, cdist, cdist1 = O.get_cloud_dsd2(qc0, nc_eff,
                                                         th["rho"])
    nr_eff, mu_r, lamr, cdistr, _ = O.get_rain_dsd2(qr0, nr0)
    qfc, nfc = O.cldliq_immersion_freezing(temp, lamc, mu_c, cdist1, qc0)
    qfr, nfr = O.rain_immersion_freezing(temp, lamr, mu_r, cdistr, qr0)
    dqi = _mid(out[4]) / DT
    assert dqi == pytest.approx(qfc + qfr, rel=1e-6)
    dni = _mid(out[5]) / DT
    assert dni == pytest.approx(nfc + nfr, rel=1e-6)
    # all freezing rimes at rho_rimeMax = 900 (update_prognostic_ice
    # :3180-3186)
    dqm = _mid(out[6]) / DT
    assert dqm == pytest.approx(qfc + qfr, rel=1e-6)
    dbm = _mid(out[7]) / DT
    assert dbm == pytest.approx((qfc + qfr) / 900.0, rel=1e-6)


def test_ice_nucleation_rate_matches_oracle():
    """Cooper 1986 nucleation (ice_nucleation, micro_p3.F90:2576-2618):
    cold ice-supersaturated clean air; dqi/dt = qinuc, dni/dt = ninuc.
    Pins the 100e3/rho cap and the mi0 crystal mass."""
    temp, pres = 250.0, 5.0e4
    rho_d0 = pres / (287.042 * temp)
    qsi = float(P.saturation_vapor_pressure_ice(temp)) / (461.505 * temp
                                                          * rho_d0)
    qv = qsi * 1.10      # 10% ice supersaturation
    col, rho_d, exner = _uniform_column(temp, pres, qv)
    th = _thermo(temp, pres, float(rho_d), qv)
    out = p3_scheme(**col, dt=DT)
    sup_i = qv / th["qsi"] - 1.0
    qinuc, ninuc = O.ice_nucleation(temp, 1.0 / th["rho"], 0.0, sup_i, DT)
    assert ninuc > 0.0
    dni = _mid(out[5]) / DT
    assert dni == pytest.approx(ninuc, rel=1e-6)
    dqi = _mid(out[4]) / DT
    assert dqi == pytest.approx(qinuc, rel=1e-6)


def test_ice_self_collection_rate_matches_oracle(tbl):
    """Table-tier aggregation (ice_self_collection, micro_p3.F90:2159-2207
    + table 3): cold ice at exact ice saturation (dep = sub = 0), no
    liquid; dni/dt = -ni_self."""
    temp, pres = 263.15, 6.0e4
    qv = float(P.p3_qv_sat_ice(jnp.float64(temp),
                               jnp.float64(pres)))  # exactly ice-saturated
    qi0, ni0, qm0, bm0 = 1.0e-3, 1.0e5, 2.0e-4, 5.0e-7
    col, rho_d, exner = _uniform_column(temp, pres, qv, qi=qi0, ni=ni0,
                                        qm=qm0, bm=bm0)
    th = _thermo(temp, pres, float(rho_d), qv, qcond=qi0)
    out = p3_scheme(**col, dt=DT, tables=tbl)
    ni_eff = O.impose_max_total_ni(ni0, 1.0 / th["rho"])
    rhop = min(max(qm0 / bm0, 50.0), 900.0)
    dumi, dumjj, dumii, dum1, dum4, dum5 = (
        O.find_lookup_table_indices_1a(qi0, ni_eff, qm0, rhop))
    ice_np = np.asarray(tbl.ice, np.float64)
    tbl3 = O.access_lookup_table(ice_np, dumjj, dumii, dumi, 3, dum1, dum4,
                                 dum5)
    rho_600mb = 60000.0 / (287.042 * 253.15)
    rhofaci = (rho_600mb / th["rho"]) ** 0.54
    eii = min(max(0.001 + (temp - 253.15) * (0.3 - 0.001) / 20.0, 0.001),
              0.3)
    ni_self = O.ice_self_collection(th["rho"], rhofaci, tbl3, eii, qm0,
                                    qi0, ni_eff)
    dni = (_mid(out[5]) - ni_eff) / DT
    assert -dni == pytest.approx(ni_self, rel=1e-5)


def test_rain_evaporation_matches_oracle(tbl):
    """Analytically-integrated rain evaporation (evaporate_rain,
    micro_p3.F90:3383-3537 + calc_liq_relaxation_timescale :2358-2410):
    warm subsaturated rain, no cloud/ice; dqv/dt = +evap."""
    temp, pres = 293.15, 9.0e4
    qsl = float(P.p3_qv_sat_liq(jnp.float64(temp), jnp.float64(pres)))
    qv = qsl * 0.5
    qr0, nr0 = 5.0e-4, 5.0e7
    col, rho_d, exner = _uniform_column(temp, pres, qv, qr=qr0, nr=nr0)
    th = _thermo(temp, pres, float(rho_d), qv, qcond=qr0)
    out = p3_scheme(**col, dt=DT, tables=tbl,
                    qv_prev=col["qv"], t_prev=col["theta"] * col["exner"])
    nr_eff, mu_r, lamr, cdistr, _ = O.get_rain_dsd2(qr0, nr0)
    _, _, revap = O.generate_rain_tables()
    epsr = O.calc_liq_relaxation_timescale(
        revap, th["rho"], th["dv"], th["mu"], th["sc"], mu_r, lamr, cdistr,
        qr0)
    ev, nr_ev = O.evaporate_rain(
        qr0, 0.0, nr_eff, 0.0, qv, qv, th["qsl"], th["qsi"], th["ab"],
        th["abi"], epsr, 0.0, temp, temp, th["ls"], th["dqsdt"], DT)
    assert ev > 0.0
    dqv = (_mid(out[8]) - qv) / DT
    assert dqv == pytest.approx(ev, rel=1e-6)
    # nr also loses to self-collection (rain_self_collection,
    # micro_p3.F90:2705-2747) in the same step
    nr_self = O.rain_self_collection(th["rho"], qr0, nr_eff)
    dnr = (_mid(out[3]) - nr_eff) / DT
    assert -dnr == pytest.approx(nr_ev + nr_self, rel=1e-6)


def test_ice_supersat_conservation_matches_oracle(tbl):
    """ice_supersat_conservation (micro_p3.F90:2856-2886): cold ice-
    supersaturated cell with enough ice surface that deposition hits the
    1/dt cap, so the unlimited tendency is exactly (qv-qsi)/dt and the
    limiter must scale it down to the psychrometrically-corrected
    qv_avail.  Supersaturation kept below 5% so Cooper nucleation stays
    off; no liquid, no rain -> dqi/dt is the limited deposition alone."""
    temp, pres = 250.0, 5.0e4
    qsi0 = float(P.p3_qv_sat_ice(jnp.float64(temp), jnp.float64(pres)))
    qv = qsi0 * 1.04
    qi0, ni0, qm0, bm0 = 1.0e-3, 1.0e6, 2.0e-4, 5.0e-7
    dt_l = 60.0
    col, rho_d, exner = _uniform_column(temp, pres, qv, qi=qi0, ni=ni0,
                                        qm=qm0, bm=bm0)
    th = _thermo(temp, pres, float(rho_d), qv, qcond=qi0)
    out = p3_scheme(**col, dt=dt_l, tables=tbl)
    dep_unl = (qv - th["qsi"]) / dt_l
    dep_lim, _ = O.ice_supersat_conservation(
        dep_unl, 0.0, qv, th["qsi"], th["ls"], temp, dt_l, 0.0, 0.0)
    assert dep_lim < dep_unl * 0.999   # the limiter must actually engage
    dqi = (_mid(out[4]) - qi0) / dt_l
    assert dqi == pytest.approx(dep_lim, rel=1e-6)


def test_homogeneous_freezing_matches_oracle():
    """homogeneous_freezing (micro_p3.F90:4145-4200) cell arithmetic: run
    the scheme on a -45 C liquid cell and compare the full glaciated state
    against the oracle's transliterated update (process rates at -45 C are
    dwarfed by the instantaneous freeze over a tiny dt)."""
    temp, pres = 228.15, 3.0e4
    qv = 1.0e-5
    qc0, qr0, nr0 = 2.0e-4, 1.0e-4, 1.0e7
    dt = 1.0e-3
    col, rho_d, exner = _uniform_column(temp, pres, qv, qc=qc0, qr=qr0,
                                        nr=nr0)
    th = _thermo(temp, pres, float(rho_d), qv, qcond=qc0 + qr0)
    out = p3_scheme(**col, dt=dt)
    nc_eff = 200.0e6 / th["rho"]
    nc_eff, *_ = O.get_cloud_dsd2(qc0, nc_eff, th["rho"])
    nr_eff, *_ = O.get_rain_dsd2(qr0, nr0)
    ex = float(np.asarray(exner))
    th0 = temp / ex
    qc1, nc1, qr1, nr1, qi1, ni1, qm1, bm1, th1 = O.homogeneous_freezing(
        temp, 1.0 / ex, 333700.0, qc0, nc_eff, qr0, nr_eff, 0.0, 0.0, 0.0,
        0.0, th0)
    assert _mid(out[0]) == 0.0 and _mid(out[2]) == 0.0
    assert _mid(out[4]) == pytest.approx(qi1, rel=1e-3)   # + tiny rates
    assert _mid(out[6]) == pytest.approx(qm1, rel=1e-3)
    assert _mid(out[7]) == pytest.approx(bm1, rel=1e-3)
    assert _mid(out[9]) == pytest.approx(th1, rel=1e-9)


# ---------------------------------------------------------------------------
# 3. full-step composition parity: p3_scheme vs the oracle's complete
#    p3_main transliteration (part1 -> part2 -> sedimentation ->
#    homogeneous freezing -> part3, micro_p3.F90:1141-1506)
# ---------------------------------------------------------------------------
NZ_FULL = 24


def _column_profile(kind):
    """Canned single columns (bottom-up, NZ_FULL levels) for the
    full-step oracle comparison.  Values are chosen so the DSD lambda
    limiters stay unbound, the in-cloud magnitude caps don't fire, and
    all sedimentation Courant numbers stay < 0.9 (both discretizations
    then take exactly one upwind substep)."""
    z = (np.arange(NZ_FULL) + 0.5) * 500.0
    if kind == "warm":
        temp = 295.0 - 6.0e-3 * z
        pres = 1.0e5 * (temp / 295.0) ** (9.80616 / (287.042 * 6.0e-3))
        rho_d = pres / (287.042 * temp)
        qsl = np.array([float(P.saturation_vapor_pressure(t))
                        / (461.505 * t * r) for t, r in zip(temp, rho_d)])
        qv = 0.85 * qsl
        qc = np.where((z > 1500) & (z < 5000), 8.0e-4, 0.0)
        qr = np.where((z > 500) & (z < 4000), 5.0e-4, 0.0)
        nr = np.where(qr > 0, 8.0e4, 0.0)
        qi = ni = qm = bm = np.zeros(NZ_FULL)
    elif kind == "cold":
        temp = 260.0 - 4.0e-3 * z
        pres = 6.0e4 * (temp / 260.0) ** (9.80616 / (287.042 * 4.0e-3))
        rho_d = pres / (287.042 * temp)
        qsi = np.array([float(P.saturation_vapor_pressure_ice(t))
                        / (461.505 * t * r) for t, r in zip(temp, rho_d)])
        qv = 1.10 * qsi          # ice-supersaturated: deposition + nucleation
        qc = qr = nr = np.zeros(NZ_FULL)
        qi = np.where((z > 2000) & (z < 9000), 2.0e-4, 0.0)
        ni = np.where(qi > 0, 8.0e4, 0.0)
        qm = 0.3 * qi
        bm = qm / 400.0
    elif kind == "mixed":  # supercooled liquid + rain + rimed ice
        temp = 271.0 - 5.0e-3 * z
        pres = 8.0e4 * (temp / 271.0) ** (9.80616 / (287.042 * 5.0e-3))
        rho_d = pres / (287.042 * temp)
        qsl = np.array([float(P.saturation_vapor_pressure(t))
                        / (461.505 * t * r) for t, r in zip(temp, rho_d)])
        qv = 0.95 * qsl
        qc = np.where((z > 1000) & (z < 6000), 6.0e-4, 0.0)
        qr = np.where(z < 3000, 4.0e-4, 0.0)
        nr = np.where(qr > 0, 6.0e4, 0.0)
        qi = np.where(z > 3500, 3.0e-4, 0.0)
        ni = np.where(qi > 0, 1.0e5, 0.0)
        qm = 0.5 * qi
        bm = qm / 300.0
    elif kind == "wetgrowth":
        # heavy riming: big supercooled liquid + rain + dense ice so the
        # collected mass exceeds the wet-growth heat-balance limit qwgrth
        # (ice_cldliq_wet_growth, micro_p3.F90:2259-2319): shedding, the
        # collection scale-back, AND the log_wetgrowth densification
        # (update_prognostic_ice :3196-3200) all fire.  Also exercises the
        # out-of-range rime density rebound (bm too big -> rho_rime < 50,
        # calc_bulkRhoRime :1904-1943).
        temp = 268.0 - 4.0e-3 * z
        pres = 8.5e4 * (temp / 268.0) ** (9.80616 / (287.042 * 4.0e-3))
        rho_d = pres / (287.042 * temp)
        qsl = np.array([float(P.saturation_vapor_pressure(t))
                        / (461.505 * t * r) for t, r in zip(temp, rho_d)])
        qv = 1.0 * qsl            # saturated: wet-growth limit small
        qc = np.where((z > 500) & (z < 8000), 2.5e-3, 0.0)
        qr = np.where(z < 6000, 2.0e-3, 0.0)
        nr = np.where(qr > 0, 2.0e5, 0.0)
        qi = np.where((z > 1000) & (z < 9000), 4.0e-3, 0.0)
        ni = np.where(qi > 0, 4.0e5, 0.0)
        qm = 0.8 * qi
        bm = np.where(z < 5000, qm / 20.0, qm / 300.0)  # rho_rime 20 -> 50
    elif kind == "clearsky":
        # no hydrometeors anywhere: cold ice-supersaturated aloft (pure
        # Cooper nucleation through the 444 path) over a dry, cold,
        # subsaturated mid-layer (the 555 level skip) over warm moist air
        temp = 284.0 - 6.5e-3 * z
        pres = 9.8e4 * (temp / 284.0) ** (9.80616 / (287.042 * 6.5e-3))
        rho_d = pres / (287.042 * temp)
        qsl = np.array([float(P.saturation_vapor_pressure(t))
                        / (461.505 * t * r) for t, r in zip(temp, rho_d)])
        qsi = np.array([float(P.p3_qv_sat_ice(jnp.float64(t),
                                              jnp.float64(p)))
                        for t, p in zip(temp, pres)])
        qv = np.where(z > 8000, 1.2 * qsi,          # nucleation aloft
                      np.where(z > 4000, 0.3 * qsi,  # 555-skip layer
                               0.7 * qsl))
        qc = qr = nr = qi = ni = qm = bm = np.zeros(NZ_FULL)
    else:  # "capped": in-cloud magnitude caps + warm ice (melt, no sublim)
        temp = 287.0 - 5.0e-3 * z
        pres = 9.5e4 * (temp / 287.0) ** (9.80616 / (287.042 * 5.0e-3))
        rho_d = pres / (287.042 * temp)
        qsl = np.array([float(P.saturation_vapor_pressure(t))
                        / (461.505 * t * r) for t, r in zip(temp, rho_d)])
        qv = 0.9 * qsl
        qc = np.where((z > 1000) & (z < 5000), 7.0e-3, 0.0)   # > 5.1 g/kg
        qr = np.where(z < 4000, 2.0e-2, 0.0)                  # > 10 g/kg
        nr = np.where(qr > 0, 2.0e6, 0.0)
        qi = np.where(z < 2500, 5.0e-4, 0.0)   # warm ice: melts, must
        ni = np.where(qi > 0, 2.0e5, 0.0)      # NOT sublimate (epsi T<0)
        qm = 0.4 * qi
        bm = qm / 500.0
    exner = (pres / 1.0e5) ** (287.042 / 1004.64)
    return dict(temp=temp, pres=pres, rho_d=rho_d, qv=qv, qc=qc, qr=qr,
                nr=nr, qi=qi, ni=ni, qm=qm, bm=bm, exner=exner)


@pytest.mark.parametrize("kind", ["warm", "cold", "mixed", "wetgrowth",
                                  "capped", "clearsky"])
def test_full_step_matches_oracle(tbl, kind):
    """ONE COMPLETE p3_main step: the vectorized scheme at the table tier
    vs the oracle's straight-line column transliteration of
    p3_main_part1/part2/sedimentation/homogeneous_freezing/part3 --
    pinning the process COMPOSITION (sequencing, conservation coupling,
    update order), not just the individual rates."""
    c = _column_profile(kind)
    dt = 10.0
    shape = (1, NZ_FULL, 1, 1)
    col = lambda a: jnp.asarray(a, jnp.float64).reshape(shape)
    theta = c["temp"] / c["exner"]
    qv_prev = 0.98 * c["qv"]
    t_prev = c["temp"] - 0.1
    out = p3_scheme(
        qc=col(c["qc"]), nc=col(np.zeros(NZ_FULL)), qr=col(c["qr"]),
        nr=col(c["nr"]), qi=col(c["qi"]), ni=col(c["ni"]),
        qm=col(c["qm"]), bm=col(c["bm"]), qv=col(c["qv"]),
        theta=col(theta), exner=col(c["exner"]), pres=col(c["pres"]),
        rho_d=col(c["rho_d"]), dz=col(np.full(NZ_FULL, 500.0)), dt=dt,
        tables=tbl, qv_prev=col(qv_prev), t_prev=col(t_prev))

    ora = O.p3_main_step(
        tbl, c["qc"], np.zeros(NZ_FULL), c["qr"], c["nr"], c["qi"],
        c["ni"], c["qm"], c["bm"], c["qv"], theta, c["exner"], c["pres"],
        c["rho_d"], np.full(NZ_FULL, 500.0), dt, qv_prev=qv_prev,
        t_prev=t_prev)

    names = ["qc", "nc", "qr", "nr", "qi", "ni", "qm", "bm", "qv",
             "theta"]
    scales = dict(qc=1e-3, nc=1e8, qr=1e-3, nr=1e5, qi=1e-3, ni=1e5,
                  qm=1e-3, bm=1e-6, qv=1e-2, theta=300.0)
    for i, name in enumerate(names):
        got = np.asarray(out[i]).reshape(NZ_FULL)
        want = np.asarray(ora[i])
        np.testing.assert_allclose(
            got, want, rtol=1e-9, atol=1e-9 * scales[name],
            err_msg=f"{kind}: {name}")
    # surface precipitation rates (m/s liquid-equivalent)
    assert float(np.asarray(out[10]).reshape(())) == pytest.approx(
        ora[10], rel=1e-9, abs=1e-18)
    assert float(np.asarray(out[11]).reshape(())) == pytest.approx(
        ora[11], rel=1e-9, abs=1e-18)


@pytest.mark.parametrize("kind", ["warm", "mixed", "clearsky"])
def test_part3_diagnostics_match_oracle(tbl, kind):
    """p3_scheme(diagnostics=True)'s part3 diagnostic outputs (effective
    radii, mean ice diameter/density/fall speed, equivalent reflectivity
    in dBZ -- micro_p3.F90:1026,:1046-1048,:1102-1127 with the p3_main
    init defaults :1307-1315) vs the oracle transliteration.  The
    reference wrapper discards these; the scheme offers them opt-in.
    clearsky pins the skipped-column defaults (dBZ -99)."""
    c = _column_profile(kind)
    dt = 10.0
    shape = (1, NZ_FULL, 1, 1)
    col = lambda a: jnp.asarray(a, jnp.float64).reshape(shape)
    theta = c["temp"] / c["exner"]
    out = p3_scheme(
        qc=col(c["qc"]), nc=col(np.zeros(NZ_FULL)), qr=col(c["qr"]),
        nr=col(c["nr"]), qi=col(c["qi"]), ni=col(c["ni"]),
        qm=col(c["qm"]), bm=col(c["bm"]), qv=col(c["qv"]),
        theta=col(theta), exner=col(c["exner"]), pres=col(c["pres"]),
        rho_d=col(c["rho_d"]), dz=col(np.full(NZ_FULL, 500.0)), dt=dt,
        tables=tbl, diagnostics=True)
    assert len(out) == 13
    diag = out[12]

    *_, odiag = O.p3_main_step(
        tbl, c["qc"], np.zeros(NZ_FULL), c["qr"], c["nr"], c["qi"],
        c["ni"], c["qm"], c["bm"], c["qv"], theta, c["exner"], c["pres"],
        c["rho_d"], np.full(NZ_FULL, 500.0), dt, return_diag=True)

    for name in ("eff_radius_qc", "eff_radius_qi", "diam_qi", "rho_qi",
                 "vm_qi", "equiv_reflectivity"):
        got = np.asarray(diag[name]).reshape(NZ_FULL)
        np.testing.assert_allclose(
            got, odiag[name], rtol=1e-9, atol=1e-12,
            err_msg=f"{kind}: {name}")


def test_part3_diagnostics_skipped_column_defaults(tbl):
    """A warm bone-dry column (no hydrometeors, no ice nucleation) skips
    p3_main's whole body in the reference, so the diagnostics keep their
    init values (:1307-1315) -- notably equiv_reflectivity = -99 dBZ, NOT
    the -37 a part3 pass over empty cells would produce.  Pins the
    scheme's per-column is_hydromet_present gate."""
    nz = 8
    shape = (1, nz, 1, 1)
    col = lambda v: jnp.full(shape, v, jnp.float64)
    zero = col(0.0)
    out = p3_scheme(
        qc=zero, nc=zero, qr=zero, nr=zero, qi=zero, ni=zero, qm=zero,
        bm=zero, qv=col(1.0e-3), theta=col(300.0), exner=col(1.0),
        pres=col(1.0e5), rho_d=col(1.1), dz=col(500.0), dt=10.0,
        tables=tbl, diagnostics=True)
    diag = out[12]
    assert np.all(np.asarray(diag["equiv_reflectivity"]) == -99.0)
    assert np.all(np.asarray(diag["eff_radius_qc"]) == 10.0e-6)
    assert np.all(np.asarray(diag["eff_radius_qi"]) == 25.0e-6)
    assert np.all(np.asarray(diag["vm_qi"]) == 0.0)


def test_two_consecutive_steps_match_oracle(tbl):
    """Two chained p3_main calls with the wrapper's qv_prev/t_prev history
    threading (microphysics_p3.h:297-301: first call passes the current
    qv/T, later calls the previous call's post-micro values) -- pins the
    rain-evaporation A_c history coupling (evaporate_rain,
    micro_p3.F90:3383-3537) across steps, not just within one."""
    c = _column_profile("mixed")
    dt = 10.0
    shape = (1, NZ_FULL, 1, 1)
    col = lambda a: jnp.asarray(a, jnp.float64).reshape(shape)
    theta = c["temp"] / c["exner"]

    # step 1: first-call sentinel (qv_prev = qv, t_prev = T)
    s = dict(qc=c["qc"], nc=np.zeros(NZ_FULL), qr=c["qr"], nr=c["nr"],
             qi=c["qi"], ni=c["ni"], qm=c["qm"], bm=c["bm"], qv=c["qv"],
             theta=theta)
    o = dict(s)
    qvp_s, tp_s = c["qv"].copy(), c["temp"].copy()
    qvp_o, tp_o = c["qv"].copy(), c["temp"].copy()
    names = ["qc", "nc", "qr", "nr", "qi", "ni", "qm", "bm", "qv",
             "theta"]
    for step in range(2):
        out = p3_scheme(
            **{k: col(v) for k, v in s.items()},
            exner=col(c["exner"]), pres=col(c["pres"]),
            rho_d=col(c["rho_d"]), dz=col(np.full(NZ_FULL, 500.0)), dt=dt,
            tables=tbl, qv_prev=col(qvp_s), t_prev=col(tp_s))
        ora = O.p3_main_step(
            tbl, o["qc"], o["nc"], o["qr"], o["nr"], o["qi"], o["ni"],
            o["qm"], o["bm"], o["qv"], o["theta"], c["exner"], c["pres"],
            c["rho_d"], np.full(NZ_FULL, 500.0), dt, qv_prev=qvp_o,
            t_prev=tp_o)
        s = {k: np.asarray(out[i]).reshape(NZ_FULL)
             for i, k in enumerate(names)}
        o = {k: np.asarray(ora[i]) for i, k in enumerate(names)}
        # wrapper history: previous call's post-micro qv and T
        qvp_s, tp_s = s["qv"], s["theta"] * c["exner"]
        qvp_o, tp_o = o["qv"], o["theta"] * c["exner"]
        for k in names:
            np.testing.assert_allclose(
                s[k], o[k], rtol=2e-9, atol=2e-9,
                err_msg=f"step {step}: {k}")
