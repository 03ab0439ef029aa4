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
def test_pallas_step_matches_xla(case, nx, ny, nz):
    st, dy_x, _ = _setup(case, nx=nx, ny=ny, nz=nz,
                         xlen=40000.0, ylen=40000.0, zlen=10000.0)
    dy_p = Dycore(ord=5, riemann_impl="pallas")
    dt = dy_x.compute_time_step(st)
    out_x = jax.jit(lambda s: dy_x.time_step(s, dt))(st)
    out_p = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    for name in ("density_dry", "uvel", "vvel", "wvel", "temp",
                 "water_vapor"):
        np.testing.assert_allclose(
            np.asarray(out_p[name]), np.asarray(out_x[name]),
            rtol=1e-9, atol=1e-11, err_msg=name)


def test_pallas_multi_step_stays_valid():
    st, dy_x, _ = _setup("thermal", nx=24, ny=1, nz=12)
    dy_p = Dycore(ord=5, riemann_impl="pallas")
    dt = dy_p.compute_time_step(st)
    step = jax.jit(lambda s: dy_p.time_step(s, dt))
    for _ in range(3):
        st = step(st)
    assert st.validate() == {}
