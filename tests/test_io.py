"""I/O tests: single-file and per-shard NetCDF writers (reference
file_per_process vs PNetCDF collective output, dynamics...h:2019-2191)."""

import os

import jax
import numpy as np
import pytest

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.experiments.supercell_example import build
from miniweatherml_tpu.io.netcdf import ShardedStateWriter, StateWriter
from miniweatherml_tpu.parallel.mesh import make_mesh, shard_state


def _state(nx=32, ny=16):
    cfg = config_from_dict(dict(
        sim_time=1.0, nens=1, nx_glob=nx, ny_glob=ny, nz=8,
        xlen=32000.0, ylen=16000.0, zlen=8000.0,
        init_data="supercell", out_prefix="t", dt_phys=0.0, out_freq=-1.0))
    state, mods, dycore = build(cfg)
    return state


def test_single_file_writer(tmp_path):
    state = _state()
    w = StateWriter(str(tmp_path / "out"), state)
    w.write(state, 0.0)
    w.write(state, 10.0)
    w.close()
    from scipy.io import netcdf_file
    with netcdf_file(str(tmp_path / "out.nc"), "r") as nc:
        assert nc.variables["temp"].shape == (2, 8, 16, 32)
        np.testing.assert_allclose(nc.variables["t"][:], [0.0, 10.0])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_stitch_round_trip_bitwise(tmp_path):
    """Shard-write a state on the virtual mesh, stitch, and compare the
    result bit-for-bit against what StateWriter writes from the gathered
    global state -- the PNetCDF collective-single-file capability
    (dynamics...h:2019-2191) restored offline."""
    from scipy.io import netcdf_file

    from miniweatherml_tpu.io.stitch import stitch_sharded

    state = _state()
    # two snapshots so the time axis is exercised; evolve trivially between
    mesh = make_mesh(devices=jax.devices()[:8], ens=1)  # y=2, x=4
    st = shard_state(state, mesh)
    sw = ShardedStateWriter(str(tmp_path / "sharded"), st)
    sw.write(st, 0.0)
    sw.write(st, 10.0)
    sw.close()

    gw = StateWriter(str(tmp_path / "global"), state)
    gw.write(state, 0.0)
    gw.write(state, 10.0)
    gw.close()

    out = stitch_sharded(str(tmp_path / "sharded"))
    with netcdf_file(out, "r", mmap=False) as got, \
            netcdf_file(str(tmp_path / "global.nc"), "r", mmap=False) as want:
        assert set(got.variables) == set(want.variables)
        for name in want.variables:
            a, b = got.variables[name][:], want.variables[name][:]
            assert a.shape == b.shape, name
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_stitch_rejects_bad_tilings(tmp_path):
    """Gap and overlap detection: a missing or duplicated shard file must
    fail loudly, not produce a silently-wrong global file."""
    from miniweatherml_tpu.io.stitch import stitch_sharded

    state = _state()
    w = StateWriter(str(tmp_path / "s_task_0"), state,
                    offsets=(0, 0, state.grid.dx, state.grid.dy))
    w.write(state, 0.0)
    w.close()
    w = StateWriter(str(tmp_path / "s_task_1"), state,
                    offsets=(16, 0, state.grid.dx, state.grid.dy))
    w.write(state, 0.0)
    w.close()
    with pytest.raises(ValueError, match="overlap"):
        stitch_sharded(str(tmp_path / "s"))
    os.remove(str(tmp_path / "s_task_1.nc"))
    with pytest.raises(FileNotFoundError):
        stitch_sharded(str(tmp_path / "missing"))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_per_shard_writer(tmp_path):
    state = _state()
    mesh = make_mesh(devices=jax.devices()[:8], ens=1)  # y=2, x=4
    st = shard_state(state, mesh)
    w = ShardedStateWriter(str(tmp_path / "out"), st)
    w.write(st, 0.0)
    w.close()
    files = sorted(p for p in os.listdir(tmp_path) if p.endswith(".nc"))
    assert len(files) == 8
    from scipy.io import netcdf_file
    total = 0
    for fp in files:
        with netcdf_file(str(tmp_path / fp), "r") as nc:
            shp = nc.variables["temp"].shape
            assert shp == (1, 8, 8, 8)  # (t, z, ny/2, nx/4)
            total += np.prod(shp[1:])
    assert total == 8 * 16 * 32
