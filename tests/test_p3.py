"""P3-class microphysics tests: saturation adjustment, process invariants,
module integration (reference model/modules/microphysics_p3.h +
helpers/microphysics_p3/micro_p3.F90)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.core.coupler import Grid, make_coupler_state
from miniweatherml_tpu.dycore.euler import Dycore
from miniweatherml_tpu.physics.p3 import (MicrophysicsP3, R_V,
                                          compute_adjusted_state, p3_scheme,
                                          saturation_vapor_pressure)


def test_saturation_adjustment_condenses_to_saturation():
    """Supersaturated air must condense until pv == svp (reference
    microphysics_p3.h:476-508)."""
    rho_d = jnp.asarray([1.0, 1.0])
    temp = jnp.asarray([285.0, 285.0])
    svp = saturation_vapor_pressure(temp)
    rho_v_sat = svp / (R_V * temp)
    rho_v = rho_v_sat * jnp.asarray([1.5, 3.0])   # 50% / 200% supersaturated
    rho_c = jnp.zeros(2)
    rho = rho_d + rho_v + rho_c
    rv, rc, t = compute_adjusted_state(rho, rho_d, rho_v, rho_c, temp)
    pv = np.asarray(rv * R_V * t)
    svp_new = np.asarray(saturation_vapor_pressure(t))
    np.testing.assert_allclose(pv, svp_new, rtol=1e-4)
    # mass conserved, condensation warms
    np.testing.assert_allclose(np.asarray(rv + rc),
                               np.asarray(rho_v + rho_c), rtol=1e-12)
    assert (np.asarray(t) > 285.0).all()


def test_saturation_adjustment_evaporates_cloud():
    """Subsaturated air with cloud evaporates toward saturation
    (microphysics_p3.h:510-545)."""
    rho_d = jnp.asarray([1.0])
    temp = jnp.asarray([290.0])
    svp = saturation_vapor_pressure(temp)
    rho_v = 0.3 * svp / (R_V * temp)
    rho_c = jnp.asarray([0.002])
    rho = rho_d + rho_v + rho_c
    rv, rc, t = compute_adjusted_state(rho, rho_d, rho_v, rho_c, temp)
    assert float(rv[0]) > float(rho_v[0])     # vapor increased
    assert float(rc[0]) < float(rho_c[0])     # cloud decreased
    assert float(t[0]) < 290.0                # evaporative cooling
    np.testing.assert_allclose(float((rv + rc)[0]), float((rho_v + rho_c)[0]),
                               rtol=1e-12)


def test_saturation_adjustment_noop_when_unsaturated_dry():
    rho_d = jnp.asarray([1.0])
    temp = jnp.asarray([290.0])
    rho_v = jnp.asarray([1e-4])
    rho_c = jnp.asarray([0.0])
    rv, rc, t = compute_adjusted_state(rho_d + rho_v, rho_d, rho_v, rho_c, temp)
    np.testing.assert_allclose(float(rv[0]), 1e-4, rtol=1e-12)
    assert float(rc[0]) == 0.0
    np.testing.assert_allclose(float(t[0]), 290.0, rtol=1e-12)


def _column(nz=30, tsurf=300.0, qv0=0.012, qc0=0.0, qr0=0.0, qi0=0.0):
    """Idealized column, bottom-up, shape (1, nz, 1, 1)."""
    z = (np.arange(nz) + 0.5) * 400.0
    temp = tsurf - 7.0e-3 * z
    pres = 1.0e5 * (temp / tsurf) ** 6.0
    rho_d = pres / (287.042 * temp)
    shape = (1, nz, 1, 1)
    arr = lambda v: jnp.asarray(np.broadcast_to(
        np.asarray(v, np.float64).reshape(1, nz, 1, 1), shape))
    exner = jnp.asarray((pres / 1e5) ** (287.042 / 1004.64)).reshape(shape)
    theta = arr(temp) / exner
    z3 = lambda c: jnp.full(shape, c, jnp.float64)
    return dict(
        qc=z3(qc0), nc=z3(100e6) / arr(rho_d), qr=z3(qr0), nr=z3(qr0 * 1e8),
        qi=z3(qi0), ni=z3(qi0 * 1e6), qm=z3(0.0), bm=z3(0.0), qv=z3(qv0),
        theta=theta, exner=exner, pres=arr(pres), rho_d=arr(rho_d),
        dz=z3(400.0))


def test_p3_scheme_preserves_f32_dtype_under_x64():
    """With x64 enabled (this suite's global config) the gather-path table
    lookups return f64; every lookup site must cast back to the state dtype
    so an f32 run never silently promotes a prognostic field (a promoted
    field breaks lax.scan carries and shard_map out-avals).  Regression for
    the part3 ni lambda-limiter site, which once skipped the cast."""
    from miniweatherml_tpu.physics.p3_tables import load_p3_tables
    col = {k: (v.astype(jnp.float32) if hasattr(v, "astype") else v)
           for k, v in _column(tsurf=290.0, qc0=2e-3, qr0=5e-4, qi0=2e-4,
                               qv0=0.01).items()}
    out = p3_scheme(**col, dt=10.0, tables=load_p3_tables())
    names = ("qc", "nc", "qr", "nr", "qi", "ni", "qm", "bm", "qv", "theta",
             "precip_liq", "precip_ice")
    for name, a in zip(names, out):
        assert a.dtype == jnp.float32, (name, a.dtype)


def test_p3_scheme_warm_rain_forms():
    """A cloud-heavy column must autoconvert cloud to rain (KK2000) and rain
    must fall out as surface precip."""
    col = _column(qc0=2e-3, qv0=0.017)
    out = p3_scheme(**col, dt=20.0)
    qc, nc, qr, nr, qi, ni, qm, bm, qv, theta, pl, pi_ = out
    assert float(jnp.max(qr)) > 0.0          # rain formed
    assert float(jnp.min(qc)) >= 0.0
    assert np.isfinite(np.asarray(theta)).all()


def test_p3_scheme_ice_forms_when_cold():
    """A cold supersaturated column must nucleate/deposit ice."""
    col = _column(tsurf=260.0, qv0=2.5e-3, qc0=5e-4)
    out = p3_scheme(**col, dt=20.0)
    qi = out[4]
    assert float(jnp.max(qi)) > 0.0


def test_p3_bergeron_grows_ice_from_liquid():
    """Wegener-Bergeron-Findeisen (qc2qi_berg_tend,
    micro_p3.F90:3326-3328): in a supercooled mixed-phase cell at liquid
    saturation, ice grows at the expense of cloud water (the liquid-vs-ice
    saturation excess deposits), while vapor deposition is suppressed for
    the liquid-covered fraction of the step (:3051-3058)."""
    from miniweatherml_tpu.physics.p3 import (
        saturation_vapor_pressure as svp_l)

    col = _column(tsurf=268.0, qc0=1e-3, qi0=2e-4, qv0=1e-3)
    # set qv exactly at liquid saturation -> zero liquid supersaturation,
    # positive ice supersaturation: only Bergeron can grow ice mass from
    # the liquid reservoir
    temp = np.asarray(col["theta"] * col["exner"])
    qsl = np.asarray(svp_l(temp)) / (461.505 * temp * np.asarray(col["rho_d"]))
    col["qv"] = jnp.asarray(qsl)
    out = p3_scheme(**col, dt=5.0)
    qc1, qi1, qv1 = out[0], out[4], out[8]
    cold = temp < 273.15
    # ice grew, cloud shrank in the supercooled levels
    assert (np.asarray(qi1)[cold] > np.asarray(col["qi"])[cold]).all()
    assert (np.asarray(qc1)[cold] < np.asarray(col["qc"])[cold]).all()


def test_p3_rain_evap_uses_qv_history():
    """evaporate_rain's analytic integration (micro_p3.F90:3383-3537)
    consumes the previous call's qv/T through the A_c source term: a drying
    history (qv_prev > qv) must increase the equilibrium evaporation."""
    from miniweatherml_tpu.physics.p3_tables import load_p3_tables
    tables = load_p3_tables()  # history term lives in the table-tier evap
    col = _column(tsurf=295.0, qr0=1e-3, qv0=4e-3)  # subsaturated, rainy
    base = p3_scheme(**col, dt=30.0, tables=tables,
                     qv_prev=col["qv"], t_prev=col["theta"] * col["exner"])
    drying = p3_scheme(**col, dt=30.0, tables=tables,
                       qv_prev=col["qv"] + 2e-3,
                       t_prev=col["theta"] * col["exner"])
    qr_base, qr_dry = np.asarray(base[2]), np.asarray(drying[2])
    assert float(qr_base.sum()) < float(np.asarray(col["qr"]).sum())  # evap
    # qv dropped by 2e-3 over the last step (A_c < 0) -> more evaporation
    # needed to hold equilibrium -> less rain remains
    assert float(qr_dry.sum()) < float(qr_base.sum())


def test_p3_predicted_droplet_number():
    """do_predict_nc (micro_p3.F90 p3_main nc branches): predicted nc is
    consumed by autoconversion/accretion instead of being reset to
    nccnst/rho each call (update_prognostic_liquid :3251-3255)."""
    col = _column(qc0=2e-3, qv0=0.017)
    out_presc = p3_scheme(**col, dt=20.0, do_predict_nc=False)
    out_pred = p3_scheme(**col, dt=20.0, do_predict_nc=True)
    rho = np.asarray(col["rho_d"]) * (1 + np.asarray(col["qv"])
                                      + np.asarray(col["qc"]))
    # prescribed: nc == nccnst / rho wherever cloud survives; part3 zeroes
    # nc where qc < qsmall (micro_p3.F90:1030-1034)
    qc1 = np.asarray(out_presc[0])
    nc1p = np.asarray(out_presc[1])
    cloudy = qc1 >= 1e-14
    np.testing.assert_allclose(nc1p[cloudy], (200.0e6 / rho)[cloudy],
                               rtol=1e-2)
    assert (nc1p[~cloudy] == 0.0).all()
    # predicted: nc decreased from its initial value where rain formed
    nc0 = np.asarray(col["nc"])
    nc1 = np.asarray(out_pred[1])
    assert (nc1 <= nc0 + 1e-9).all() and (nc1 < nc0).any()


def test_p3_freezing_rimes_ice():
    """All freezing paths add rime mass/volume (update_prognostic_ice dum
    term, micro_p3.F90:3180-3186): a supercooled rainy/cloudy column must
    grow qm and bm with rime density <= 900."""
    col = _column(tsurf=258.0, qc0=1e-3, qr0=1e-3, qi0=1e-4, qv0=1e-3)
    out = p3_scheme(**col, dt=20.0)
    qm1, bm1 = np.asarray(out[6]), np.asarray(out[7])
    assert qm1.max() > 0.0 and bm1.max() > 0.0
    rhop = qm1[qm1 > 1e-12] / np.maximum(bm1[qm1 > 1e-12], 1e-30)
    assert (rhop <= 900.0 + 1e-6).all()


def test_p3_scheme_water_mass_conserved_without_sedimentation():
    """Total water (qv+qc+qr+qi) is conserved by process exchanges; only
    sedimentation removes mass through the surface."""
    col = _column(qc0=1e-3, qr0=5e-4, qv0=0.015)
    tot0 = sum(np.asarray(col[k]) for k in ("qc", "qr", "qi", "qv"))
    out = p3_scheme(**col, dt=10.0)
    qc, nc, qr, nr, qi, ni, qm, bm, qv = out[:9]
    pl, pi_ = out[10], out[11]
    tot1 = np.asarray(qc + qr + qi + qv)
    rho_d = np.asarray(col["rho_d"])
    dz = np.asarray(col["dz"])
    # column-integrated dry-mass-weighted water, before vs after + precip out
    m0 = (tot0 * rho_d * dz).sum()
    m1 = (tot1 * rho_d * dz).sum()
    # surface precip in kg/m^2 over the step (precl is m/s of liquid)
    rho = rho_d * (1 + np.asarray(col["qv"]))
    precip_mass = float((pl + pi_).sum()) * 10.0 * 1000.0
    np.testing.assert_allclose(m1 + precip_mass, m0, rtol=0.05)


def _p3_supercell_state(nx=24, nz=16):
    g = Grid(nx=nx, ny=1, nz=nz, xlen=50000.0, ylen=50000.0, zlen=16000.0)
    st = make_coupler_state(g, dtype="float64",
                            options={"init_data": "supercell",
                                     "out_freq": -1.0})
    micro = MicrophysicsP3()
    dy = Dycore()
    st = micro.init(st)
    st = dy.init(st)
    return st, dy, micro


@pytest.mark.slow
@pytest.mark.xslow
def test_p3_module_integration_with_dycore():
    """P3's 9 tracers ride through dycore + micro steps; state stays valid
    (the reference's supercell-with-P3 configuration)."""
    st, dy, micro = _p3_supercell_state()
    assert st.meta.num_tracers == 9
    assert st.meta.idWV == 8   # water_vapor registered last (p3 ordering)
    dt = dy.compute_time_step(st)
    step = jax.jit(lambda s: micro.time_step(dy.time_step(s, dt), dt))
    for _ in range(3):
        st = step(st)
    assert st.validate() == {}
    # qv_prev/t_prev updated
    np.testing.assert_allclose(
        np.asarray(st["t_prev"]), np.asarray(st["temp"]), rtol=1e-12)


def test_p3_wrapper_diagnostics_fields():
    """MicrophysicsP3(diagnostics=True) registers part3's diagnostic
    fields and fills them each step (eff radii / reflectivity, an opt-in
    strict superset of the reference wrapper, which computes-then-drops
    them in micro_p3.F90 part3)."""
    g = Grid(nx=8, ny=1, nz=12, xlen=20000.0, ylen=20000.0, zlen=16000.0)
    st = make_coupler_state(g, dtype="float64",
                            options={"init_data": "supercell",
                                     "out_freq": -1.0})
    micro = MicrophysicsP3(diagnostics=True)
    dy = Dycore()
    st = micro.init(st)
    st = dy.init(st)
    for name in MicrophysicsP3.DIAG_FIELDS:
        assert name in st.fields
    # seed some cloud so the diagnostics have something to report
    st = st.replace_fields(cloud_water=jnp.full_like(
        st["cloud_water"], 1.0e-3))
    st = micro.time_step(st, 10.0)
    dbz = np.asarray(st["equiv_reflectivity"])
    effc = np.asarray(st["eff_radius_qc"])
    assert np.all(np.isfinite(dbz)) and dbz.min() >= -99.0
    assert effc.min() > 0.0
    # native backend mirrors the reference wrapper: no diag support
    with pytest.raises(ValueError):
        MicrophysicsP3(backend="native", diagnostics=True)


def test_p3_adds_mass_flags():
    """Number/rime tracers must not add mass (microphysics_p3.h:103-112):
    the dycore conversion counts only qc/qr/qi/qv into total density."""
    st, dy, micro = _p3_supercell_state(nx=8, nz=8)
    adds = {t.name: t.adds_mass for t in st.meta.tracers}
    assert adds == {
        "cloud_water": True, "cloud_water_num": False, "rain": True,
        "rain_num": False, "ice": True, "ice_num": False,
        "ice_rime": False, "ice_rime_vol": False, "water_vapor": True}


@pytest.mark.slow
@pytest.mark.xslow
def test_p3_module_f32_supercell_no_nan():
    """f32 regression guard: the wet-growth shed fraction must not produce
    0/0 NaN on the all-ice-free initial supercell (1e-300 floors underflow
    to zero in f32)."""
    g = Grid(nx=24, ny=1, nz=16, xlen=60000.0, ylen=60000.0, zlen=16000.0)
    st = make_coupler_state(g, dtype="float32",
                            options={"init_data": "supercell",
                                     "out_freq": -1.0})
    micro = MicrophysicsP3()
    dy = Dycore()
    st = micro.init(st)
    st = dy.init(st)
    dt = dy.compute_time_step(st)
    step = jax.jit(lambda s: micro.time_step(dy.time_step(s, dt), dt))
    for _ in range(3):
        st = step(st)
    assert st.validate() == {}


def test_p3_homogeneous_freezing_glaciates_below_233K():
    """Below T_homogfrz = 233.15 K all cloud and rain freeze instantly into
    rimed ice with latent heating (homogeneous_freezing,
    micro_p3.F90:4145-4200, called after sedimentation at :1452-1454).
    A cold-top column (anvil analog) must be fully glaciated aloft."""
    col = _column(tsurf=290.0, qc0=5e-4, qr0=5e-4, qv0=1e-3)
    temp0 = np.asarray(col["theta"] * col["exner"])
    out = p3_scheme(**col, dt=10.0)
    qc1, _, qr1, nr1, qi1, ni1, qm1, bm1 = (np.asarray(a) for a in out[:8])
    theta1 = np.asarray(out[9])
    cold = temp0 < 233.15 - 0.5       # margin for latent warming in-step
    assert cold.any(), "column must reach below T_homogfrz"
    assert (qc1[cold] == 0.0).all()
    assert (qr1[cold] == 0.0).all()
    assert (qi1[cold] > 0.0).all()       # liquid became ice
    assert (qm1[cold] > 0.0).all()       # ... as rime
    assert (bm1[cold] > 0.0).all()
    # latent heating: theta rose in glaciated cells relative to input
    theta0 = np.asarray(col["theta"])
    assert (theta1[cold] >= theta0[cold]).all()
    assert (theta1[cold] > theta0[cold]).any()


def test_p3_rain_number_weighted_fall_speed_slower():
    """nr sediments with the number-weighted V_nr, which is strictly slower
    than the mass-weighted V_qr for a gamma DSD (compute_rain_fall_velocity,
    micro_p3.F90:3872-3908; sedimentation speeds at :3785-3791)."""
    from miniweatherml_tpu.physics.p3_tables import generate_rain_tables
    vn, vm, _ = generate_rain_tables()
    assert (vn <= vm + 1e-12).all()
    # strictly slower over the mid-size range (not degenerate/equal tables)
    assert (vn[5:250] < vm[5:250]).any()
    assert vn.shape == vm.shape == (300,)


def test_p3_rain_number_sediments_slower_than_mass():
    """Behavioral check of V_nr: for a rain shaft aloft, the center of mass
    of qr must descend farther than that of nr in one step (table tier)."""
    from miniweatherml_tpu.physics.p3_tables import load_p3_tables
    tables = load_p3_tables()
    col = _column(nz=20, qv0=0.012)
    # rain shaft at WARM mid-levels (aloft it would homogeneously freeze);
    # big drops (low nr) spread the vm/vn gap
    z_idx = np.arange(20).reshape(1, 20, 1, 1)
    qr = jnp.asarray(np.where((z_idx >= 6) & (z_idx < 12), 2e-3, 0.0))
    col["qr"] = qr
    col["nr"] = qr * 1e5   # big drops
    zc = (np.arange(20) + 0.5) * 400.0
    def com(a):
        w = np.asarray(a)[0, :, 0, 0]
        return (w * zc).sum() / max(w.sum(), 1e-300)
    com_q0, com_n0 = com(col["qr"]), com(col["nr"])
    out = p3_scheme(**col, dt=60.0, tables=tables)
    qr1, nr1 = out[2], out[3]
    drop_q = com_q0 - com(qr1)
    drop_n = com_n0 - com(nr1)
    assert drop_q > 0.0 and drop_n > 0.0
    assert drop_q > drop_n * 1.05  # mass falls measurably faster


def test_p3_max_total_ni_capped():
    """Total ice number is capped at max_total_ni = 500e3 m^-3
    (impose_max_total_ni, micro_p3.F90:1947-1969, applied in part1/2/3 at
    :637/:924/:1073)."""
    col = _column(tsurf=260.0, qv0=2e-3, qi0=1e-4)
    col["ni"] = jnp.full_like(col["ni"], 1.0e9)   # grossly over the cap
    rho = np.asarray(col["rho_d"]) * (1 + np.asarray(col["qv"])
                                      + np.asarray(col["qi"]))
    out = p3_scheme(**col, dt=10.0)   # table-less: part3 cap is final op
    ni1 = np.asarray(out[5])
    assert (ni1 * rho <= 500.0e3 * (1.0 + 1e-10)).all()
    assert (ni1 > 0.0).any()


def test_p3_part3_small_mass_cleanup():
    """p3_main_part3 (micro_p3.F90:977-1137): sub-qsmall hydrometeors return
    to vapor with latent cooling and their numbers are zeroed."""
    # warm shallow column: no level reaches the Cooper-nucleation regime
    # (tc < -15), so no new ice can grow past qsmall in-step
    col = _column(nz=10, tsurf=300.0, qv0=1e-3)
    tiny = 1e-16   # < qsmall = 1e-14
    for k in ("qc", "qr", "qi"):
        col[k] = jnp.full_like(col[k], tiny)
    col["nr"] = jnp.full_like(col["nr"], 1e3)
    col["ni"] = jnp.full_like(col["ni"], 1e3)
    qv0 = np.asarray(col["qv"])
    out = p3_scheme(**col, dt=10.0)
    qc1, nc1, qr1, nr1, qi1, ni1, qm1, bm1, qv1 = (
        np.asarray(a) for a in out[:9])
    assert (qc1 == 0.0).all() and (qr1 == 0.0).all() and (qi1 == 0.0).all()
    assert (nc1 == 0.0).all() and (nr1 == 0.0).all() and (ni1 == 0.0).all()
    assert (qm1 == 0.0).all() and (bm1 == 0.0).all()
    np.testing.assert_allclose(qv1, qv0 + 3 * tiny, rtol=1e-6)


def test_p3_part3_rain_lambda_limiter():
    """get_rain_dsd2's lambda limiters adjust nr for consistency in part3
    (micro_p3.F90:1841-1893 via :1043): a DSD with absurdly few drops for
    its mass (lamr < lammin) must have nr raised to the 2 mm bound."""
    col = _column(tsurf=285.0, qv0=0.012)
    qr = jnp.full_like(col["qr"], 1e-3)
    col["qr"] = qr
    col["nr"] = jnp.full_like(col["nr"], 1e-2)    # ~0 drops: giant raindrops
    out = p3_scheme(**col, dt=1e-3)   # tiny dt: processes negligible
    qr1, nr1 = np.asarray(out[2]), np.asarray(out[3])
    # nr was raised to match lamr = lammin = (mu_r+1)*500; assert at WARM
    # levels only (aloft, giant supercooled drops freeze fast even over a
    # tiny dt, shifting the post-freezing DSD that part3 then re-limits)
    cons1 = np.pi / 6.0 * 1000.0
    lamr1 = np.cbrt(cons1 * nr1 * 24.0 / np.maximum(qr1, 1e-14))
    temp0 = np.asarray(col["theta"] * col["exner"])
    ok = (qr1 >= 1e-14) & (temp0 > 270.0)
    assert ok.any()
    np.testing.assert_allclose(lamr1[ok], 1000.0, rtol=2e-2)


def test_p3_prevent_liq_supersaturation():
    """prevent_liq_supersaturation (micro_p3.F90:2888-2955): just above
    freezing, ice saturation sits ABOVE liquid saturation, so unchecked
    sublimation of a large ice load would relax qv past liquid saturation;
    the limiter scales the vapor sources so end-of-step qv stays at/below
    qsl (to the linearization's accuracy)."""
    from miniweatherml_tpu.physics.p3 import (
        saturation_vapor_pressure as svp_l)
    from miniweatherml_tpu.physics.p3_tables import load_p3_tables

    col = _column(nz=8, tsurf=276.5, qi0=3.0e-3)
    col["ni"] = jnp.full_like(col["ni"], 1.0e6)
    col["qm"] = col["qi"] * 0.3
    col["bm"] = col["qm"] / 400.0
    temp0 = np.asarray(col["theta"] * col["exner"])
    rho_d = np.asarray(col["rho_d"])
    qsl0 = np.asarray(svp_l(jnp.asarray(temp0))) / (461.505 * temp0 * rho_d)
    col["qv"] = jnp.asarray(0.9 * qsl0)           # 90% RH at every level
    out = p3_scheme(**col, dt=120.0, tables=load_p3_tables())
    qv1 = np.asarray(out[8])
    t1 = np.asarray(out[9] * col["exner"])
    qsl1 = np.asarray(svp_l(jnp.asarray(t1))) / (461.505 * t1 * rho_d)
    # end-of-step vapor must not exceed liquid saturation (1% slack for
    # the limiter's linearization + the scheme's other couplings)
    assert (qv1 <= qsl1 * 1.01).all()


@pytest.mark.xslow
def test_p3_part2_ni_lambda_limiter_bounds_aggregation():
    """part2's table 7/8 lambda limiter (micro_p3.F90:662-678) bounds ni
    BEFORE any process rate: an absurdly high ni for the ice mass must be
    pulled down so the mean size stays on the table."""
    from miniweatherml_tpu.physics.p3_tables import load_p3_tables
    tbl = load_p3_tables()
    col = _column(tsurf=265.0, qv0=1.0e-3, qi0=1.0e-4)
    col["ni"] = jnp.full_like(col["ni"], 1.0e3)
    out_lo = p3_scheme(**col, dt=1e-2, tables=tbl)
    # tiny crystals: qi/ni below the table's smallest size -> ni reduced
    col["ni"] = jnp.full_like(col["ni"], 1.0e12)
    out_hi = p3_scheme(**col, dt=1e-2, tables=tbl)
    ni_hi = np.asarray(out_hi[5])
    rho = np.asarray(col["rho_d"]) * (1 + np.asarray(col["qv"])
                                      + np.asarray(col["qi"]))
    # the ni cap (500e3 m^-3) and lambda limiter combine: far below 1e12
    assert ni_hi.max() < 1.0e7
    assert np.isfinite(np.asarray(out_hi[4])).all()


def test_adjust_state_f32_default_is_fixed_point():
    """The f32 default (35 halvings) reaches the bisection's floating-point
    fixed point: running the reference-grade 60 halvings changes nothing,
    so the dtype-adaptive default is exact, not an approximation."""
    rng = np.random.default_rng(5)
    n = 4096
    rho_d = jnp.asarray(1.0 + 0.2 * rng.random(n), jnp.float32)
    rho_v = jnp.asarray(0.02 * rng.random(n), jnp.float32)
    rho_c = jnp.asarray(0.005 * rng.random(n), jnp.float32)
    temp = jnp.asarray(230.0 + 70.0 * rng.random(n), jnp.float32)
    rho = rho_d + rho_v + rho_c
    a35 = compute_adjusted_state(rho, rho_d, rho_v, rho_c, temp, iters=35)
    a60 = compute_adjusted_state(rho, rho_d, rho_v, rho_c, temp, iters=60)
    for x35, x60 in zip(a35, a60):
        np.testing.assert_array_equal(np.asarray(x35), np.asarray(x60))


@pytest.mark.parametrize("dtype,tol", [(jnp.float64, 1e-12),
                                       (jnp.float32, 2e-5)])
def test_adjust_state_newton_matches_bisection(dtype, tol):
    """The default guarded-Newton solver converges to the same root as the
    reference-form bisection (microphysics_p3.h:467-550) at machine
    precision, over random mixes of condensing / evaporating / inactive
    cells spanning the full temperature range."""
    rng = np.random.default_rng(17)
    n = 8192
    rho_d = jnp.asarray(0.3 + 1.0 * rng.random(n), dtype)
    rho_v = jnp.asarray(0.03 * rng.random(n), dtype)
    # mix: half the cells carry cloud (can evaporate), half are dry
    rho_c = jnp.asarray(np.where(rng.random(n) < 0.5,
                                 0.01 * rng.random(n), 0.0), dtype)
    temp = jnp.asarray(200.0 + 120.0 * rng.random(n), dtype)
    rho = rho_d + rho_v + rho_c
    newton = compute_adjusted_state(rho, rho_d, rho_v, rho_c, temp)
    ref_iters = 60 if dtype == jnp.float64 else 35
    bisect = compute_adjusted_state(rho, rho_d, rho_v, rho_c, temp,
                                    iters=ref_iters)
    for xn, xb in zip(newton, bisect):
        np.testing.assert_allclose(np.asarray(xn), np.asarray(xb),
                                   rtol=tol, atol=tol * 1e-2)


def _seeded_mixed_state(dtype):
    """Supercell state with hydrometeors injected across regimes so every
    process family (warm, riming, collection, freezing, melting, wet
    growth, evap) is active somewhere."""
    g = Grid(nx=24, ny=2, nz=16, xlen=50000.0, ylen=50000.0, zlen=16000.0)
    st = make_coupler_state(g, dtype=dtype,
                            options={"init_data": "supercell",
                                     "out_freq": -1.0})
    micro = MicrophysicsP3()
    dy = Dycore()
    st = micro.init(st)
    st = dy.init(st)
    rng = np.random.default_rng(3)
    rho_d = np.asarray(st["density_dry"], np.float64)
    shape = rho_d.shape

    def fld(scale, frac):
        v = rng.random(shape) * scale
        v = np.where(rng.random(shape) < frac, v, 0.0)
        return jnp.asarray(v * rho_d, st["temp"].dtype)

    st = st.replace_fields(
        cloud_water=fld(2e-3, 0.5), cloud_water_num=fld(1e8, 0.5),
        rain=fld(1e-3, 0.4), rain_num=fld(1e5, 0.4),
        ice=fld(1e-3, 0.4), ice_num=fld(1e5, 0.4),
        ice_rime=fld(3e-4, 0.3), ice_rime_vol=fld(1e-6, 0.3),
        temp=st["temp"] + jnp.asarray(
            rng.uniform(-20.0, 20.0, shape), st["temp"].dtype))
    return st, micro


@pytest.mark.parametrize("dtype,rtol", [("float64", 1e-12),
                                        ("float32", 2e-5)])
def test_p3_fused_cellwise_matches_plain(monkeypatch, dtype, rtol):
    """The fused Pallas execution of the per-cell phases (MWML_P3_FUSED=1,
    interpret mode on CPU) must match the plain XLA path: both run the
    SAME physics functions, the flag only changes the schedule."""
    st, micro = _seeded_mixed_state(dtype)
    dt = 2.0
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("MWML_P3_FUSED", mode)
        outs[mode] = jax.jit(lambda s: micro.time_step(s, dt))(st)
    for name in list(st.fields):
        a = np.asarray(outs["0"][name])
        b = np.asarray(outs["1"][name])
        scale = max(float(np.abs(a).max()), 1e-30)
        np.testing.assert_allclose(b / scale, a / scale, rtol=0,
                                   atol=rtol, err_msg=name)
