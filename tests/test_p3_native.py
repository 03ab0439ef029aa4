"""C++ native P3 twin must agree with the JAX path (the framework's
native-language tier, mirroring the reference's Fortran P3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miniweatherml_tpu.native import native_available
from miniweatherml_tpu.physics.p3 import (R_V, compute_adjusted_state,
                                          p3_scheme,
                                          saturation_vapor_pressure)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="C++ toolchain unavailable")


def test_native_adjust_matches_jax():
    from miniweatherml_tpu.native import p3_adjust_state_native

    rng = np.random.default_rng(0)
    n = 256
    temp = rng.uniform(250.0, 305.0, n)
    rho_d = rng.uniform(0.4, 1.2, n)
    qsat = saturation_vapor_pressure(temp) / (R_V * temp)
    rho_v = np.asarray(qsat) * rng.uniform(0.2, 2.5, n)
    rho_c = np.where(rng.uniform(size=n) < 0.5, rng.uniform(0, 3e-3, n), 0.0)
    rho = rho_d + rho_v + rho_c

    jv, jc, jt = compute_adjusted_state(
        jnp.asarray(rho), jnp.asarray(rho_d), jnp.asarray(rho_v),
        jnp.asarray(rho_c), jnp.asarray(temp))
    nv, ncl, nt = p3_adjust_state_native(rho, rho_d, rho_v, rho_c, temp)
    np.testing.assert_allclose(np.asarray(jv), nv, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(jc), ncl, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(jt), nt, rtol=1e-12)


def _mixed_column(nz=24, ncol=8, seed=1):
    rng = np.random.default_rng(seed)
    z = (np.arange(nz) + 0.5) * 450.0
    temp = 300.0 - 7.5e-3 * z
    pres = 1.0e5 * (temp / 300.0) ** 6.0
    rho_d = pres / (287.042 * temp)
    shape = (1, nz, 1, ncol)
    tile = lambda v: np.broadcast_to(v.reshape(1, nz, 1, 1), shape).copy()
    rand = lambda hi: rng.uniform(0, hi, shape)
    exner = tile((pres / 1e5) ** (287.042 / 1004.64))
    d = dict(
        qc=rand(2e-3), nc=tile(100e6 / rho_d), qr=rand(1e-3),
        nr=rand(1e5), qi=rand(1e-3), ni=rand(1e5), qm=rand(2e-4),
        bm=rand(1e-6), qv=rand(0.015),
        theta=tile(temp) / exner, exner=exner, pres=tile(pres),
        rho_d=tile(rho_d), dz=np.full(shape, 450.0))
    return {k: jnp.asarray(v) for k, v in d.items()}


def test_native_scheme_matches_jax():
    """The C++ twin runs the SAME fidelity tier as the JAX path: with the
    v4.1.1 lookup-table asset available both sides run the table-driven
    scheme (p3_set_tables mirrors p3_init_a/p3_init_b); without it both
    fall back to the continuous tier."""
    from miniweatherml_tpu.native import load_p3_library
    from miniweatherml_tpu.physics.p3 import _p3_scheme_native_callback
    from miniweatherml_tpu.physics.p3_tables import (default_table_path,
                                                     load_p3_tables)

    tables = None
    if load_p3_library().p3_has_tables():
        tables = load_p3_tables(default_table_path())

    col = _mixed_column()
    dt = 15.0
    jax_out = p3_scheme(**col, dt=dt, z_axis=1, tables=tables)
    native_out = _p3_scheme_native_callback(
        col["qc"], col["nc"], col["qr"], col["nr"], col["qi"], col["ni"],
        col["qm"], col["bm"], col["qv"], col["theta"], col["exner"],
        col["pres"], col["rho_d"], col["dz"], dt)
    names = ["qc", "nc", "qr", "nr", "qi", "ni", "qm", "bm", "qv", "theta",
             "precip_liq", "precip_ice"]
    for name, a, b in zip(names, jax_out, native_out):
        a = np.asarray(a)
        # atol scaled to each field's magnitude: differences at denormal
        # levels (1e-280) are FP noise, not scheme disagreement.
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            a, np.asarray(b).reshape(a.shape),
            rtol=1e-9, atol=1e-12 * scale, err_msg=name)


@pytest.mark.slow
def test_native_backend_in_module():
    """MicrophysicsP3(backend='native') runs inside jit via pure_callback."""
    from tests.test_p3 import _p3_supercell_state
    from miniweatherml_tpu.physics.p3 import MicrophysicsP3
    from miniweatherml_tpu.core.coupler import Grid, make_coupler_state
    from miniweatherml_tpu.dycore.euler import Dycore

    g = Grid(nx=16, ny=1, nz=12, xlen=50000.0, ylen=50000.0, zlen=16000.0)
    st = make_coupler_state(g, dtype="float64",
                            options={"init_data": "supercell",
                                     "out_freq": -1.0})
    micro = MicrophysicsP3(backend="native")
    dy = Dycore()
    st = micro.init(st)
    st = dy.init(st)
    dt = dy.compute_time_step(st)
    step = jax.jit(lambda s: micro.time_step(dy.time_step(s, dt), dt))
    st = step(st)
    assert st.validate() == {}


@pytest.mark.xslow
def test_native_matches_jax_on_oracle_columns():
    """The twin over the five canned full-step oracle columns (warm, cold,
    mixed, heavy-riming/wet-growth, capped extreme -- the same states that
    pin p3_scheme against the Fortran transliteration), so the composition
    paths those columns exercise (wet-growth densification, in-cloud caps,
    sedimentation-time limiters, Murphy-Koop saturation) are twin-covered
    too, not just a single random state."""
    from miniweatherml_tpu.native import load_p3_library
    from miniweatherml_tpu.physics.p3 import _p3_scheme_native_callback
    from miniweatherml_tpu.physics.p3_tables import (default_table_path,
                                                     load_p3_tables)
    from tests.test_p3_oracle import NZ_FULL, _column_profile

    tables = None
    if load_p3_library().p3_has_tables():
        tables = load_p3_tables(default_table_path())

    dt = 10.0
    shape = (1, NZ_FULL, 1, 1)
    names = ["qc", "nc", "qr", "nr", "qi", "ni", "qm", "bm", "qv", "theta",
             "precip_liq", "precip_ice"]
    for kind in ("warm", "cold", "mixed", "wetgrowth", "capped"):
        c = _column_profile(kind)
        col = lambda a: jnp.asarray(a, jnp.float64).reshape(shape)
        args = dict(
            qc=col(c["qc"]), nc=col(np.zeros(NZ_FULL)), qr=col(c["qr"]),
            nr=col(c["nr"]), qi=col(c["qi"]), ni=col(c["ni"]),
            qm=col(c["qm"]), bm=col(c["bm"]), qv=col(c["qv"]),
            theta=col(c["temp"] / c["exner"]), exner=col(c["exner"]),
            pres=col(c["pres"]), rho_d=col(c["rho_d"]),
            dz=col(np.full(NZ_FULL, 500.0)))
        jax_out = p3_scheme(**args, dt=dt, z_axis=1, tables=tables)
        native_out = _p3_scheme_native_callback(
            args["qc"], args["nc"], args["qr"], args["nr"], args["qi"],
            args["ni"], args["qm"], args["bm"], args["qv"], args["theta"],
            args["exner"], args["pres"], args["rho_d"], args["dz"], dt)
        for name, a, b in zip(names, jax_out, native_out):
            a = np.asarray(a)
            scale = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(
                a, np.asarray(b).reshape(a.shape),
                rtol=1e-9, atol=1e-12 * scale,
                err_msg=f"{kind}: {name}")
