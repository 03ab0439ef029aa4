"""Kessler microphysics unit tests (reference microphysics_kessler.h)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from miniweatherml_tpu.physics.kessler import kessler_column
from miniweatherml_tpu.physics.perturb import perturb_temperature


def _column(nz=40, ncol=3, dz=500.0, dtype=jnp.float64):
    """A moist unstable column."""
    rng = np.random.default_rng(0)
    z = ((np.arange(nz) + 0.5) * dz)[:, None] * np.ones((1, ncol))
    rho = 1.2 * np.exp(-z / 8000.0)
    p = 1e5 * np.exp(-z / 8000.0)
    exner = (p / 1e5) ** (287.0 / 1003.0)
    theta = 300.0 + 10.0 * z / 20000.0 + rng.uniform(0, 1, (nz, ncol))
    qv = 0.016 * np.exp(-z / 3000.0)
    qc = np.where(z < 5000.0, 1e-4, 0.0) * np.ones((1, ncol))
    qr = np.where(z < 3000.0, 5e-4, 0.0) * np.ones((1, ncol))
    to = lambda a: jnp.asarray(a, dtype)
    return tuple(map(to, (theta, qv, qc, qr, rho, z, exner)))


def test_positivity_and_finiteness():
    theta, qv, qc, qr, rho, z, pk = _column()
    th2, qv2, qc2, qr2, precl = kessler_column(
        theta, qv, qc, qr, rho, z, pk, dt=10.0, Rd=287.0, cp=1003.0, p0=1e5)
    for a in (th2, qv2, qc2, qr2, precl):
        assert np.isfinite(np.asarray(a)).all()
    assert float(qv2.min()) >= 0
    assert float(qc2.min()) >= 0
    assert float(qr2.min()) >= 0
    assert float(precl.min()) >= 0


def test_water_conservation_without_sedimentation():
    """With zero rain there is no sedimentation/precip, so total water
    qv+qc+qr is conserved exactly by the adjustment terms
    (microphysics_kessler.h:302-328 move mass only between categories)."""
    theta, qv, qc, qr, rho, z, pk = _column()
    qr = jnp.zeros_like(qr)
    th2, qv2, qc2, qr2, precl = kessler_column(
        theta, qv, qc, qr, rho, z, pk, dt=5.0, Rd=287.0, cp=1003.0, p0=1e5)
    tot0 = np.asarray(qv + qc + qr)
    tot1 = np.asarray(qv2 + qc2 + qr2)
    np.testing.assert_allclose(tot1, tot0, rtol=1e-12, atol=1e-15)


def test_saturation_adjustment_direction():
    """Supersaturated moist cells must condense (qc up, qv down, theta up)."""
    theta, qv, qc, qr, rho, z, pk = _column()
    qv = qv * 3.0  # force strong supersaturation at low levels
    th2, qv2, qc2, qr2, _ = kessler_column(
        theta, qv, qc, qr, rho, z, pk, dt=5.0, Rd=287.0, cp=1003.0, p0=1e5)
    low = np.s_[0:4]
    assert (np.asarray(qc2)[low] > np.asarray(qc)[low]).all()
    assert (np.asarray(qv2)[low] < np.asarray(qv)[low]).all()
    assert (np.asarray(th2)[low] > np.asarray(theta)[low]).all()


def test_rain_falls_and_precipitates():
    """Rain aloft sediments downward and produces surface precip."""
    theta, qv, qc, qr, rho, z, pk = _column(nz=20)
    qr = jnp.zeros_like(qr).at[10:12].set(2e-3)
    qv = jnp.zeros_like(qv)   # dry: no new rain formation
    qc = jnp.zeros_like(qc)
    th2, qv2, qc2, qr2, precl = kessler_column(
        theta, qv, qc, qr, rho, z, pk, dt=60.0, Rd=287.0, cp=1003.0, p0=1e5)
    qr_prof0 = np.asarray(qr).mean(1)
    qr_prof1 = np.asarray(qr2).mean(1)
    # center of mass moved down
    zc = np.asarray(z)[:, 0]
    com0 = (qr_prof0 * zc).sum() / qr_prof0.sum()
    com1 = (qr_prof1 * zc).sum() / max(qr_prof1.sum(), 1e-30)
    assert com1 < com0


def test_subcycling_stability_large_dt():
    """A big dt forces rainsplit > 1 via the while_loop; results stay finite
    (reference CFL subcycling, microphysics_kessler.h:276-285)."""
    theta, qv, qc, qr, rho, z, pk = _column(nz=30)
    qr = qr + 5e-3
    th2, qv2, qc2, qr2, precl = kessler_column(
        theta, qv, qc, qr, rho, z, pk, dt=300.0, Rd=287.0, cp=1003.0, p0=1e5)
    for a in (th2, qv2, qc2, qr2, precl):
        assert np.isfinite(np.asarray(a)).all()
    assert float(precl.max()) > 0


def test_jit_and_vectorized_shapes():
    """Works under jit on 4-D (nens, nz, ny, nx) with z_axis=1."""
    nz, ny, nx = 10, 3, 4
    rng = np.random.default_rng(1)
    shape = (2, nz, ny, nx)
    z = ((np.arange(nz) + 0.5) * 500.0)[None, :, None, None] * np.ones(shape)
    theta = jnp.asarray(300 + rng.uniform(0, 5, shape))
    qv = jnp.asarray(0.01 * np.ones(shape))
    qc = jnp.asarray(1e-4 * np.ones(shape))
    qr = jnp.asarray(1e-4 * np.ones(shape))
    rho = jnp.asarray(np.ones(shape))
    pk = jnp.asarray(0.9 * np.ones(shape))
    f = jax.jit(lambda *a: kessler_column(*a, dt=5.0, Rd=287.0, cp=1003.0,
                                          p0=1e5, z_axis=1))
    th2, qv2, qc2, qr2, precl = f(theta, qv, qc, qr, rho, jnp.asarray(z), pk)
    assert th2.shape == shape
    assert precl.shape == (2, ny, nx)


@pytest.mark.slow
def test_kessler_pallas_matches_xla():
    """The VMEM-resident Pallas sub-cycle kernel (physics/kessler_pallas.py)
    reproduces the while_loop path's arithmetic (interpret mode on CPU;
    same comparison runs on hardware via bench/verify)."""
    from tests.test_dycore import _setup

    st, dy, micro = _setup("supercell", nx=24, ny=4, nz=12,
                           xlen=100000.0, ylen=100000.0, zlen=20000.0)
    st = perturb_temperature(st)
    dt = 6.0
    from miniweatherml_tpu.physics.kessler import MicrophysicsKessler

    m_x = MicrophysicsKessler(impl="xla")
    m_p = MicrophysicsKessler(impl="pallas")
    out_x = jax.jit(lambda s: m_x.time_step(s, dt))(st)
    out_p = jax.jit(lambda s: m_p.time_step(s, dt))(st)
    for name in ("temp", "water_vapor", "cloud_liquid", "precip_liquid",
                 "precl"):
        np.testing.assert_allclose(
            np.asarray(out_p[name]), np.asarray(out_x[name]),
            rtol=1e-12, atol=1e-14, err_msg=name)


def test_kessler_matches_independent_oracle():
    """EXTERNAL anchor: the vectorized kessler_column vs a straight-line
    NumPy transliteration of the reference kernel written in a second
    pass from microphysics_kessler.h:234-339 (tests/oracle_kessler.py) --
    the oracle_dycore/oracle_p3 move applied to the warm-rain scheme.
    Multi-subcycle (rainsplit > 1), f64, every output + precl."""
    from tests.oracle_kessler import kessler_oracle

    theta, qv, qc, qr, rho, z, pk = _column(nz=32, ncol=4)
    dt, Rd, cp, p0 = 40.0, 287.0, 1003.0, 1e5   # big dt: forces subcycling
    th2, qv2, qc2, qr2, precl = kessler_column(
        theta, qv, qc, qr, rho, z, pk, dt=dt, Rd=Rd, cp=cp, p0=p0)
    tho, qvo, qco, qro, preclo = kessler_oracle(
        np.asarray(theta), np.asarray(qv), np.asarray(qc), np.asarray(qr),
        np.asarray(rho), np.asarray(z), np.asarray(pk), dt, Rd, cp, p0)

    np.testing.assert_allclose(np.asarray(th2), tho, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(qv2), qvo, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(np.asarray(qc2), qco, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(np.asarray(qr2), qro, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(np.asarray(precl), preclo, rtol=1e-12,
                               atol=1e-20)
