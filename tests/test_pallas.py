"""Pallas fused recon+Riemann megakernel vs the XLA path (interpret mode on
CPU; the same comparison runs on real TPU hardware via bench/verify)."""

import jax
import numpy as np
import pytest

from miniweatherml_tpu.dycore.euler import Dycore
from tests.test_dycore import _setup


@pytest.mark.parametrize("case,nx,ny,nz", [
    ("thermal", 24, 1, 12),          # 2-D: x periodic, z wall
    ("supercell", 16, 8, 10),        # 3-D: x/y periodic, z wall
])
@pytest.mark.slow
def test_pallas_step_matches_xla(case, nx, ny, nz):
    """opt_algebra=False reproduces the XLA path's exact operation order, so
    the comparison pins the Pallas plumbing at near-bitwise tolerance."""
    st, dy_x, _ = _setup(case, nx=nx, ny=ny, nz=nz,
                         xlen=40000.0, ylen=40000.0, zlen=10000.0)
    dy_p = Dycore(ord=5, riemann_impl="pallas", opt_algebra=False)
    dt = dy_x.compute_time_step(st)
    out_x = jax.jit(lambda s: dy_x.time_step(s, dt))(st)
    out_p = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    for name in ("density_dry", "uvel", "vvel", "wvel", "temp",
                 "water_vapor"):
        np.testing.assert_allclose(
            np.asarray(out_p[name]), np.asarray(out_x[name]),
            rtol=1e-9, atol=1e-11, err_msg=name)


@pytest.mark.slow
def test_pallas_opt_algebra_close_to_reference_order():
    """The reduced-operation limiter algebra (opt_algebra=True, the default)
    produces the same weights up to floating-point rounding; after one f64
    step the fields stay within ~1e-10 relative of the reference-ordered
    algebra (the residual is weight rounding amplified through the step)."""
    st, dy_x, _ = _setup("supercell", nx=16, ny=8, nz=10,
                         xlen=40000.0, ylen=40000.0, zlen=10000.0)
    dy_p = Dycore(ord=5, riemann_impl="pallas", opt_algebra=True)
    dt = dy_x.compute_time_step(st)
    out_x = jax.jit(lambda s: dy_x.time_step(s, dt))(st)
    out_p = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    for name in ("density_dry", "uvel", "wvel", "temp", "water_vapor"):
        a = np.asarray(out_x[name])
        scale = np.abs(a).max() + 1e-300
        np.testing.assert_allclose(np.asarray(out_p[name]) / scale,
                                   a / scale, rtol=0, atol=1e-9,
                                   err_msg=name)


@pytest.mark.slow
def test_pallas_multi_step_stays_valid():
    st, dy_x, _ = _setup("thermal", nx=24, ny=1, nz=12)
    dy_p = Dycore(ord=5, riemann_impl="pallas")
    dt = dy_p.compute_time_step(st)
    step = jax.jit(lambda s: dy_p.time_step(s, dt))
    for _ in range(3):
        st = step(st)
    assert st.validate() == {}


@pytest.mark.slow
def test_pallas_fast_weights_close_to_exact():
    """fast_weights (approx reciprocal in weight normalization) stays within
    loose tolerance of the exact path (bit-identical on real TPU; interpret
    mode emulates the approximation)."""
    st, _, _ = _setup("thermal", nx=24, ny=1, nz=12, dtype="float32")
    dy_e = Dycore(ord=5, riemann_impl="pallas")
    dy_f = Dycore(ord=5, riemann_impl="pallas", fast_weights=True)
    dt = dy_e.compute_time_step(st)
    out_e = jax.jit(lambda s: dy_e.time_step(s, dt))(st)
    out_f = jax.jit(lambda s: dy_f.time_step(s, dt))(st)
    # Interpret mode emulates the approximate reciprocal much more
    # coarsely than the hardware (on the real chip the supercell step was
    # bit-identical); this guards the plumbing, not the precision.
    for name in ("uvel", "wvel", "temp"):
        a = np.asarray(out_e[name])
        np.testing.assert_allclose(np.asarray(out_f[name]), a,
                                   rtol=0.05, atol=0.05, err_msg=name)
    assert out_f.validate() == {}
