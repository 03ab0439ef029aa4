"""Dycore integration tests (the reference has no automated tests; these
implement SURVEY.md section 4's strictly-better plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.core.coupler import Grid, make_coupler_state
from miniweatherml_tpu.dycore.euler import Dycore
from miniweatherml_tpu.physics.kessler import MicrophysicsKessler
from miniweatherml_tpu.physics.perturb import perturb_temperature


def _setup(init_data="thermal", nx=32, ny=1, nz=16, nens=1, dtype="float64",
           xlen=20000.0, ylen=20000.0, zlen=10000.0, ord=5, **opts):
    g = Grid(nx=nx, ny=ny, nz=nz, nens=nens, xlen=xlen, ylen=ylen, zlen=zlen)
    st = make_coupler_state(g, dtype=dtype,
                            options={"init_data": init_data, "out_freq": -1.0,
                                     **opts})
    micro = MicrophysicsKessler()
    dy = Dycore(ord=ord)
    st = micro.init(st)
    st = dy.init(st)
    return st, dy, micro


def test_conversion_roundtrip():
    """coupler -> dynamics -> coupler must be the identity
    (reference dynamics...h:1891-2015)."""
    st, dy, _ = _setup("supercell", nx=16, nz=12, xlen=100000.0, zlen=20000.0)
    st = perturb_temperature(st)
    s, tr = dy.convert_coupler_to_dynamics(st)
    fields = dy._dyn_to_coupler_fields(st, s, tr)
    for name, v in fields.items():
        np.testing.assert_allclose(np.asarray(v), np.asarray(st[name]),
                                   rtol=1e-12, atol=1e-12, err_msg=name)


@pytest.mark.slow
def test_supercell_hydrostatic_balance():
    """Unperturbed supercell init must stay nearly motionless: the GLL
    quadrature hydrostatic integration (dynamics...h:1725-1840) balances the
    discrete gravity/pressure terms."""
    st, dy, _ = _setup("supercell", nx=50, nz=40, xlen=100000.0, zlen=20000.0)
    dt = dy.compute_time_step(st)
    step = jax.jit(lambda s: dy.time_step(s, dt))
    for _ in range(10):
        st = step(st)
    assert float(jnp.abs(st["wvel"]).max()) < 1e-4
    assert not st.validate()


@pytest.mark.slow
def test_thermal_symmetry_and_conservation():
    """x-symmetric thermal bubble stays x-symmetric; total mass conserved
    under periodic-x/wall-z BCs."""
    st, dy, _ = _setup("thermal", nx=32, nz=16)
    s0_mass = float(jnp.sum(st["density_dry"]) +
                    jnp.sum(st["water_vapor"]))
    dt = dy.compute_time_step(st)
    step = jax.jit(lambda s: dy.time_step(s, dt))
    for _ in range(20):
        st = step(st)
    w = np.asarray(st["wvel"])[0, :, 0, :]
    # Bubble centered at xlen/2 = between cells nx/2-1 and nx/2.  The upwind
    # tie-break at exactly-zero normal momentum (reference dynamics...h:408)
    # seeds O(truncation) ~1e-6 asymmetry on the first step (the reference
    # scheme shares this); an indexing bug would give O(1).
    np.testing.assert_allclose(w, w[:, ::-1], atol=1e-4)
    u = np.asarray(st["uvel"])[0, :, 0, :]
    np.testing.assert_allclose(u, -u[:, ::-1], atol=1e-4)
    mass = float(jnp.sum(st["density_dry"]) + jnp.sum(st["water_vapor"]))
    assert abs(mass - s0_mass) / s0_mass < 1e-11
    assert float(jnp.abs(st["wvel"]).max()) > 0.1  # bubble actually rises


@pytest.mark.slow
def test_thermal_bubble_rises():
    st, dy, _ = _setup("thermal", nx=32, nz=16)
    dt = dy.compute_time_step(st)
    step = jax.jit(lambda s: dy.time_step(s, dt))
    for _ in range(30):
        st = step(st)
    w = np.asarray(st["wvel"])[0, :, 0, :]
    k_peak, i_peak = np.unravel_index(np.argmax(w), w.shape)
    # strongest updraft above the initial bubble center (z0=2000 m, k=3.2/16)
    assert w.max() > 0.3
    assert 2 <= k_peak <= 10


@pytest.mark.parametrize("ord", [3, 7])
def test_other_orders_run(ord):
    st, dy, _ = _setup("thermal", nx=16, nz=8, ord=ord, dtype="float32")
    dt = dy.compute_time_step(st)
    st = jax.jit(lambda s: dy.time_step(s, dt))(st)
    assert not st.validate()


def test_tracer_positivity_fct():
    """FCT keeps positive tracers non-negative even with sharp gradients
    (dynamics...h:498-516 + per-stage clamps)."""
    st, dy, _ = _setup("thermal", nx=32, nz=16)
    # inject a hard box of vapor
    wv = np.zeros(st.grid.field_shape)
    wv[:, 4:8, :, 10:16] = 0.01
    st = st.replace_fields(water_vapor=jnp.asarray(wv, st.meta.jdtype))
    dt = dy.compute_time_step(st)
    step = jax.jit(lambda s: dy.time_step(s, dt))
    for _ in range(20):
        st = step(st)
    assert float(st["water_vapor"].min()) >= 0.0
    assert float(st["cloud_liquid"].min()) >= 0.0


def test_3d_runs_and_2d_consistency():
    """A 3-D run with y-uniform initial data keeps y-uniformity (the
    degenerate consistency between the sim2d path and the 3-D path,
    reference coupler.h:127-131)."""
    st3, dy, _ = _setup("supercell", nx=16, ny=8, nz=12,
                        xlen=100000.0, ylen=50000.0, zlen=20000.0)
    dt = dy.compute_time_step(st3)
    step = jax.jit(lambda s: dy.time_step(s, dt))
    for _ in range(5):
        st3 = step(st3)
    for name in ("wvel", "temp", "density_dry"):
        a = np.asarray(st3[name])
        np.testing.assert_allclose(a, np.broadcast_to(a[:, :, :1], a.shape),
                                   atol=1e-8, err_msg=name)
    assert float(jnp.abs(st3["vvel"]).max()) < 1e-8


@pytest.mark.slow
def test_building_immersed_blocks_flow():
    """Immersed boundary damps velocity inside the building box
    (dynamics...h:534-550)."""
    st, dy, _ = _setup("building", nx=32, ny=16, nz=10, dtype="float32",
                       xlen=2000.0, ylen=1000.0, zlen=300.0,
                       enable_gravity=False)
    dt = dy.compute_time_step(st)
    step = jax.jit(lambda s: dy.time_step(s, dt))
    for _ in range(20):
        st = step(st)
    imm = np.asarray(st["immersed_proportion"])[0] > 0.5
    u = np.asarray(st["uvel"])[0]
    assert imm.any()
    # The immersed relaxation time scale is tau = 1e3*dt (dynamics...h:536):
    # ~0.1% velocity reduction per step, so after 20 steps the interior has
    # measurably slowed while the free flow has not.
    assert np.abs(u[imm]).mean() < 19.6
    assert np.abs(u[~imm]).mean() > 19.9
    assert not st.validate()


def test_ord3_hydrostatic_and_step():
    """The dycore at order 3 (the reference's benchmark-build -DMW_ORD=3)
    holds hydrostatic balance and steps a thermal bubble cleanly."""
    st, dy, _ = _setup("supercell", nx=32, nz=24, xlen=100000.0,
                       zlen=20000.0, ord=3)
    dt = dy.compute_time_step(st)
    step = jax.jit(lambda s: dy.time_step(s, dt))
    for _ in range(5):
        st = step(st)
    # order-3 quadrature balances less tightly than order 5 (the 1e-4
    # bound of the ord-5 test); a few cm/s of residual w is expected
    assert float(jnp.abs(st["wvel"]).max()) < 0.05
    assert not st.validate()


@pytest.mark.slow
def test_open_bc_uniform_flow_invariance():
    """BC_OPEN end-to-end: a uniform flow through open x boundaries is an
    exact steady state (edge replication reproduces the uniform stencil, so
    fluxes are divergence-free).  Covers ops/stencil.py pad_bc BC_OPEN,
    euler._apply_edge_bcs open branch, and the open halo path
    (reference open-BC extrapolation, dynamics...h:772-779, :1021-1038)."""
    from miniweatherml_tpu.ops.stencil import BC_OPEN

    st, dy, _ = _setup("building", nx=32, ny=8, nz=12, xlen=2000.0,
                       ylen=500.0, zlen=500.0, enable_gravity=False)
    st = st.set_options(bc_x=BC_OPEN, use_immersed_boundaries=False)
    dt = dy.compute_time_step(st)
    u0 = np.asarray(st["uvel"]).copy()
    step = jax.jit(lambda s: dy.time_step(s, dt))
    for _ in range(5):
        st = step(st)
    np.testing.assert_allclose(np.asarray(st["uvel"]), u0, rtol=0,
                               atol=1e-10)
    assert float(jnp.abs(st["wvel"]).max()) < 1e-10
    assert not st.validate()


def test_open_bc_disturbance_exits():
    """A localized momentum bump advects OUT through the open boundary and
    leaves the domain (total perturbation energy decays), instead of
    wrapping around as with periodic BCs."""
    from miniweatherml_tpu.ops.stencil import BC_OPEN

    st, dy, _ = _setup("building", nx=48, ny=1, nz=8, xlen=2000.0,
                       ylen=500.0, zlen=300.0, enable_gravity=False)
    st = st.set_options(bc_x=BC_OPEN, use_immersed_boundaries=False)
    # temperature bump near the outflow edge
    temp = np.asarray(st["temp"]).copy()
    temp[:, :, :, 40:44] += 2.0
    st = st.replace_fields(temp=jnp.asarray(temp))
    dt = dy.compute_time_step(st)
    dev0 = float(jnp.abs(st["temp"] - temp.mean()).sum())

    def many(s):
        def body(s, _):
            return dy.time_step(s, dt), None
        return jax.lax.scan(body, s, None, length=40)[0]

    step40 = jax.jit(many)
    # bump advects at u=20 + radiates acoustically at ~350 m/s; ~15 s of
    # simulated time clears the 2 km domain through the open ends
    for _ in range(8):
        st = step40(st)
    dev1 = float(jnp.abs(st["temp"] - temp.mean()).sum())
    assert dev1 < 0.5 * dev0     # the bump left the domain
    assert not st.validate()
