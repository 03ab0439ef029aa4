"""Tests for the simple_city experiment chain: immersed-boundary init cases,
horizontal sponge, time averager (reference experiments/simple_city/)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.experiments.simple_city import build
from miniweatherml_tpu.physics.horizontal_sponge import HorizontalSponge
from miniweatherml_tpu.physics.time_averager import TimeAverager


def _building_config(**kw):
    d = dict(
        sim_time=5.0, nens=1, nx_glob=48, ny_glob=16, nz=16,
        xlen=2000.0, ylen=2000.0, zlen=500.0,
        init_data="building", out_prefix="test_building",
        dt_phys=0.0, out_freq=-1.0, enable_gravity=False,
    )
    d.update(kw)
    return config_from_dict(d)


def test_building_init_immersed():
    state, mods, dycore, _ = build(_building_config())
    imm = np.asarray(state["immersed_proportion"])
    # A single box exists (reference dynamics...h:1549-1652): ~20% of nz tall.
    assert imm.max() == 1.0
    assert imm.min() == 0.0
    # Building occupies the lower levels only.
    assert imm[0, -1].max() == 0.0
    # Uniform inflow u=20 outside the building.
    u = np.asarray(state["uvel"])
    assert np.allclose(u[imm == 0], 20.0)


def test_city_init_random_buildings():
    cfg = _building_config(init_data="city", nx_glob=64, ny_glob=64, nens=2)
    state, mods, dycore, _ = build(cfg)
    imm = np.asarray(state["immersed_proportion"])
    # Many distinct buildings with varying heights.
    heights = imm.sum(axis=1)  # (nens, ny, nx) columns
    assert (heights > 0).sum() > 10
    assert len(np.unique(heights)) >= 3


def test_city_heights_match_reference_rng():
    """The shipped height stream is the reference's exact RNG sequence:
    std::mt19937{17} + std::normal_distribution<>{60,10} under libstdc++
    (dynamics...h:1441-1452).  First values pinned from an independent run
    of that exact C++ expression."""
    from miniweatherml_tpu.dycore.init_cases import _city_height_stream

    expected = np.array([63.728571591396367, 56.553173412840039,
                         61.199638244368671, 61.520419472859963,
                         51.152126899262427])
    got = _city_height_stream(5)
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-13)
    # Statistics sanity over the full stream.
    full = _city_height_stream(65536)
    assert abs(full.mean() - 60.0) < 0.2 and abs(full.std() - 10.0) < 0.2


@pytest.mark.slow
def test_simple_city_step_runs_and_is_finite():
    state, mods, dycore, _ = build(_building_config())
    dt = dycore.compute_time_step(state)
    for m in mods:
        state = m(state, dt)
    assert state.validate() == {}
    # Time averager saw exactly one step.
    assert float(state["time_avg_etime"]) == pytest.approx(dt)
    assert np.allclose(np.asarray(state["time_avg_uvel"]),
                       np.asarray(state["uvel"]), atol=1e-5)


def test_horizontal_sponge_pulls_walls_to_column():
    state, mods, dycore, _ = build(_building_config())
    hs = HorizontalSponge(sponge_cells=5, time_scale=1.0)
    state = hs.init(state)
    # Perturb the whole uvel field, then apply with a huge dt so the sponge
    # fully restores the wall cells to the stored column.
    state = state.replace_fields(uvel=state["uvel"] + 7.0)
    out = hs.apply(state, dt=1.0, x1=True, x2=True, y1=False, y2=False)
    u = np.asarray(out["uvel"])
    col = np.asarray(state["horiz_sponge_column"][1])  # uvel column (nens, nz)
    # Wall cells (i=0) fully relaxed (weight = time_factor = 1 at the wall).
    assert np.allclose(u[:, :, :, 0], col[:, :, None], atol=1e-5)
    assert np.allclose(u[:, :, :, -1], col[:, :, None], atol=1e-5)
    # Interior (beyond sponge band) untouched.
    assert np.allclose(u[:, :, :, 10:-10], np.asarray(state["uvel"])[:, :, :, 10:-10])


def test_time_averager_inertia_weighting():
    state, mods, dycore, _ = build(_building_config())
    ta = TimeAverager()
    # Two accumulations of constant fields a then b with equal dt -> mean.
    s1 = state.replace_fields(temp=jnp.full_like(state["temp"], 10.0))
    s1 = ta.accumulate(s1, 2.0)
    s2 = s1.replace_fields(temp=jnp.full_like(state["temp"], 20.0))
    s2 = ta.accumulate(s2, 2.0)
    assert np.allclose(np.asarray(s2["time_avg_temp"]), 15.0, atol=1e-5)


def test_time_averager_finalize_writes(tmp_path):
    state, mods, dycore, ta = build(_building_config())
    dt = dycore.compute_time_step(state)
    state = ta.accumulate(state, dt)
    path = ta.finalize(state, str(tmp_path / "time_averaged_fields.nc"))
    assert os.path.exists(path)
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        assert set(nc.variables) >= {"x", "y", "z", "density_dry", "uvel",
                                     "vvel", "wvel", "temp", "water_vapor"}
        assert nc.variables["uvel"].shape == (16, 16, 48)
