"""Fused (shifted-slice) WENO path must match the dense oracle exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miniweatherml_tpu.dycore.euler import Dycore
from miniweatherml_tpu.ops.stencil import BC_PERIODIC, gather_stencils, pad_bc
from miniweatherml_tpu.ops.weno import reconstruct_edges, weno_matrices
from miniweatherml_tpu.ops.weno_fused import reconstruct_edges_shifted


@pytest.mark.parametrize("ord_", [3, 5, 7, 9])
@pytest.mark.parametrize("cutoff", [0.0, 1e-2])
def test_fused_matches_dense(ord_, cutoff):
    mats = weno_matrices(ord_)
    hs = (ord_ - 1) // 2
    rng = np.random.default_rng(ord_)
    x = jnp.asarray(rng.normal(0, 1, (3, 40)).cumsum(axis=1))  # rough field
    n = 40 - 2 * hs

    sten = gather_stencils(x, -1, n, ord_)
    dense = reconstruct_edges(sten, mats, cutoff)
    fl, fr = reconstruct_edges_shifted(x, -1, n, mats, cutoff)
    np.testing.assert_allclose(np.asarray(fl), np.asarray(dense[..., 0]),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fr), np.asarray(dense[..., 1]),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.slow
def test_dycore_fused_matches_dense_step():
    """A full dycore step must be identical (to fp tolerance) under both
    reconstruction implementations."""
    from tests.test_dycore import _setup

    st_f, dy_f, _ = _setup("thermal", nx=24, nz=12)
    dy_d = Dycore(ord=5, recon_impl="dense")
    dt = dy_f.compute_time_step(st_f)
    out_f = jax.jit(lambda s: dy_f.time_step(s, dt))(st_f)
    out_d = jax.jit(lambda s: dy_d.time_step(s, dt))(st_f)
    for name in ("density_dry", "uvel", "wvel", "temp", "water_vapor"):
        np.testing.assert_allclose(
            np.asarray(out_f[name]), np.asarray(out_d[name]),
            rtol=1e-10, atol=1e-10, err_msg=name)
