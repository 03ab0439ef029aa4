"""Explicit shard_map + ppermute halo-exchange step: must match the
single-device and auto-SPMD results (shard-count invariance the reference
cannot test without a cluster -- SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.experiments.supercell_example import build
from miniweatherml_tpu.parallel.mesh import make_mesh, shard_state
from miniweatherml_tpu.parallel.spmd import make_spmd_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _build(nx=64, ny=32, nz=16, nens=2):
    cfg = config_from_dict(dict(
        sim_time=10.0, nens=nens, nx_glob=nx, ny_glob=ny, nz=nz,
        xlen=100000.0, ylen=100000.0, zlen=20000.0,
        init_data="supercell", out_prefix="t", dt_phys=0.0, out_freq=-1.0))
    return build(cfg)


_CHECK = ("density_dry", "uvel", "vvel", "wvel", "temp", "water_vapor",
          "cloud_liquid", "precip_liquid", "precl")


@pytest.mark.slow
@pytest.mark.xslow
def test_spmd_step_matches_single_device():
    state, mods, dycore = _build()
    from miniweatherml_tpu.physics.kessler import MicrophysicsKessler
    from miniweatherml_tpu.physics.column_nudging import ColumnNudger
    micro = MicrophysicsKessler()
    nudger = ColumnNudger()
    dt = dycore.compute_time_step(state)

    # single-device reference chain (same modules as make_spmd_step)
    def ref_step(s):
        s = dycore.time_step(s, dt)
        s = micro.time_step(s, dt)
        from miniweatherml_tpu.physics.sponge import sponge_layer
        s = sponge_layer(s, dt)
        return nudger.nudge_to_column(s, dt)

    ref = jax.jit(ref_step)(state)
    for _ in range(1):
        pass

    # explicit shard_map step over a (2, 2, 2) mesh
    mesh = make_mesh(devices=jax.devices()[:8], ens=2)
    assert mesh.shape == {"ens": 2, "y": 2, "x": 2}
    st = shard_state(state, mesh)
    step = make_spmd_step(state, mesh, dycore, micro=micro, nudger=nudger)
    out = jax.jit(lambda s: step(s, dt))(st)

    for name in _CHECK:
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(ref[name]),
            rtol=5e-5, atol=1e-7, err_msg=name)


@pytest.mark.slow
@pytest.mark.xslow
def test_spmd_step_multiple_steps_stay_valid():
    state, mods, dycore = _build(nx=32, ny=16, nz=12, nens=1)
    from miniweatherml_tpu.physics.kessler import MicrophysicsKessler
    micro = MicrophysicsKessler()
    dt = dycore.compute_time_step(state)
    mesh = make_mesh(devices=jax.devices()[:8], ens=1)  # y=2, x=4
    st = shard_state(state, mesh)
    step = jax.jit(lambda s: make_spmd_step(state, mesh, dycore,
                                            micro=micro)(s, dt))
    for _ in range(3):
        st = step(st)
    assert st.validate() == {}
    # output stays sharded on the mesh
    assert "x" in str(st["temp"].sharding.spec) or \
        st["temp"].sharding.spec == ("ens", None, "y", "x")


@pytest.mark.slow
@pytest.mark.xslow
def test_spmd_step_with_p3():
    """P3 (9 tracers, global sedimentation sub-cycle count via pmax/pmin)
    under the explicit shard_map path matches the single-device chain."""
    from miniweatherml_tpu.core.coupler import Grid, make_coupler_state
    from miniweatherml_tpu.dycore.euler import Dycore
    from miniweatherml_tpu.physics.p3 import MicrophysicsP3

    g = Grid(nx=32, ny=16, nz=12, nens=1,
             xlen=64000.0, ylen=32000.0, zlen=16000.0)
    st = make_coupler_state(g, dtype="float64",
                            options={"init_data": "supercell",
                                     "out_freq": -1.0})
    micro = MicrophysicsP3()
    dy = Dycore()
    st = micro.init(st)
    st = dy.init(st)
    dt = dy.compute_time_step(st)

    ref = jax.jit(lambda s: micro.time_step(dy.time_step(s, dt), dt))(st)

    mesh = make_mesh(devices=jax.devices()[:8], ens=1)  # y=2, x=4
    sharded = shard_state(st, mesh)
    step = make_spmd_step(st, mesh, dy, micro=micro, sponge_time_scale=None)
    out = jax.jit(lambda s: step(s, dt))(sharded)
    for name in ("temp", "wvel", "water_vapor", "ice", "rain", "precl"):
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(ref[name]),
            rtol=1e-8, atol=1e-11, err_msg=name)


def test_horizontal_sponge_spmd_matches_global():
    """HorizontalSponge wall bands use global indices inside shard_map."""
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from miniweatherml_tpu.dycore.euler import SpmdCtx
    from miniweatherml_tpu.experiments.simple_city import build as build_city
    from miniweatherml_tpu.physics.horizontal_sponge import HorizontalSponge

    cfg = config_from_dict(dict(
        sim_time=1.0, nens=1, nx_glob=48, ny_glob=16, nz=8,
        xlen=2000.0, ylen=2000.0, zlen=500.0, init_data="building",
        out_prefix="t", dt_phys=0.0, out_freq=-1.0, enable_gravity=False))
    state, mods, dycore, _ = build_city(cfg)
    hs = HorizontalSponge(sponge_cells=5, time_scale=1.0)
    state = state.replace_fields(uvel=state["uvel"] + 3.0)

    ref = hs.apply(state, 0.5, x1=True, x2=True, y1=False, y2=False)

    mesh = make_mesh(devices=jax.devices()[:4], ens=1, y=1, x=4)
    ctx = SpmdCtx(axes={-1: ("x", 4)})
    names = ("uvel", "horiz_sponge_column", "density_dry", "vvel", "wvel",
             "temp", "water_vapor")
    import dataclasses
    local_meta = dataclasses.replace(
        state.meta, grid=dataclasses.replace(state.grid, nx=12, xlen=500.0))

    def local(*arrs):
        from miniweatherml_tpu.core.coupler import CouplerState
        s = CouplerState(fields=dict(zip(names, arrs)), meta=local_meta)
        out = hs.apply(s, 0.5, x1=True, x2=True, y1=False, y2=False,
                       spmd=ctx)
        return out["uvel"]

    specs = tuple(P(None, "ens") if n == "horiz_sponge_column"
                  else P("ens", None, "y", "x") for n in names)
    sm = jax.shard_map(local, mesh=mesh, in_specs=specs,
                       out_specs=P("ens", None, "y", "x"))
    out_u = sm(*[state[n] for n in names])
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref["uvel"]),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.slow
@pytest.mark.xslow
def test_spmd_step_with_pallas_kernels():
    """The Pallas megakernels run per shard inside shard_map (ppermute
    halos feed the kernels); result matches the single-device XLA chain."""
    from miniweatherml_tpu.dycore.euler import Dycore
    from miniweatherml_tpu.physics.kessler import MicrophysicsKessler

    state, mods, dycore_x = _build(nx=32, ny=16, nz=12, nens=1)
    micro = MicrophysicsKessler()
    dt = dycore_x.compute_time_step(state)
    ref = jax.jit(lambda s: micro.time_step(dycore_x.time_step(s, dt), dt))(state)

    dy_p = Dycore(riemann_impl="pallas")
    mesh = make_mesh(devices=jax.devices()[:8], ens=1)  # y=2, x=4
    st = shard_state(state, mesh)
    step = make_spmd_step(state, mesh, dy_p, micro=micro,
                          sponge_time_scale=None)
    out = jax.jit(lambda s: step(s, dt))(st)
    # f32 run: the WENO weights amplify roundoff-level differences between
    # the interpret-mode pallas arithmetic and XLA in a handful of
    # near-discontinuity cells (the f64 single-device parity test pins the
    # math at 1e-9); assert physical-level agreement here.
    for name in ("temp", "uvel", "wvel", "water_vapor", "precl"):
        a = np.asarray(ref[name])
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(out[name]), a,
            rtol=1e-4, atol=1e-4 * scale, err_msg=name)


@pytest.mark.xslow
def test_spmd_pallas_open_and_wall_bc_on_sharded_axis():
    """In-kernel boundary conditions under shard_map: with bc_x=BC_OPEN on
    an x-sharded mesh, only the boundary shards apply the edge fixup (SMEM
    boundary-mode scalars gated by lax.axis_index).  The sharded Pallas
    result must match the single-device XLA path."""
    from miniweatherml_tpu.core.coupler import Grid, make_coupler_state
    from miniweatherml_tpu.dycore.euler import Dycore
    from miniweatherml_tpu.ops.stencil import BC_OPEN
    from miniweatherml_tpu.physics.kessler import MicrophysicsKessler

    g = Grid(nx=48, ny=8, nz=10, nens=1, xlen=2000.0, ylen=500.0,
             zlen=400.0)
    st = make_coupler_state(g, dtype="float64",
                            options={"init_data": "building",
                                     "out_freq": -1.0,
                                     "enable_gravity": False})
    micro = MicrophysicsKessler()
    dy_x = Dycore(ord=5)
    st = micro.init(st)
    st = dy_x.init(st)
    st = st.set_options(bc_x=BC_OPEN, use_immersed_boundaries=False)
    # non-uniform field so the open-edge handling actually matters
    temp = np.asarray(st["temp"]).copy()
    temp[:, :, :, 20:28] += 1.5
    st = st.replace_fields(temp=jnp.asarray(temp))

    dt = dy_x.compute_time_step(st)
    ref = jax.jit(lambda s: dy_x.time_step(s, dt))(st)

    dy_p = Dycore(ord=5, riemann_impl="pallas", opt_algebra=False)
    mesh = make_mesh(devices=jax.devices()[:4], ens=1)  # y=2, x=2 spatial
    sst = shard_state(st, mesh)
    step = make_spmd_step(st, mesh, dy_p, micro=None,
                          sponge_time_scale=None)
    out = jax.jit(lambda s: step(s, dt))(sst)
    for name in ("temp", "uvel", "wvel", "water_vapor"):
        a = np.asarray(ref[name])
        scale = np.abs(a).max() + 1e-30
        np.testing.assert_allclose(np.asarray(out[name]) / scale, a / scale,
                                   rtol=0, atol=1e-11, err_msg=name)


@pytest.mark.slow
@pytest.mark.xslow
@pytest.mark.parametrize("impl,dtype,rtol,atol", [
    ("matmul", "float64", 1e-8, 1e-11),
    # the Pallas lookup kernels are f32-only (interpret mode on CPU);
    # f32 sharding reorders dycore reductions, hence the looser tol
    pytest.param("pallas", "float32", 2e-4, 1e-6,
                 marks=pytest.mark.xslow),
])
def test_spmd_p3_lookups_shard_local(monkeypatch, impl, dtype, rtol, atol):
    """The TPU table-lookup paths (MWML_P3_TABLES=matmul and the
    VMEM-resident pallas kernels) are purely shard-local: under shard_map
    the cell chunking/blocking operates on the local block, so the
    8-shard step matches the single-device step."""
    from miniweatherml_tpu.core.coupler import Grid, make_coupler_state
    from miniweatherml_tpu.dycore.euler import Dycore
    from miniweatherml_tpu.physics.p3 import MicrophysicsP3

    monkeypatch.setenv("MWML_P3_TABLES", impl)
    g = Grid(nx=32, ny=16, nz=12, nens=1,
             xlen=64000.0, ylen=32000.0, zlen=16000.0)
    st = make_coupler_state(g, dtype=dtype,
                            options={"init_data": "supercell",
                                     "out_freq": -1.0})
    micro = MicrophysicsP3()
    dy = Dycore()
    st = micro.init(st)
    st = dy.init(st)
    dt = dy.compute_time_step(st)

    ref = jax.jit(lambda s: micro.time_step(dy.time_step(s, dt), dt))(st)

    mesh = make_mesh(devices=jax.devices()[:8], ens=1)  # y=2, x=4
    sharded = shard_state(st, mesh)
    step = make_spmd_step(st, mesh, dy, micro=micro, sponge_time_scale=None)
    out = jax.jit(lambda s: step(s, dt))(sharded)
    for name in ("temp", "wvel", "water_vapor", "ice", "rain", "precl"):
        a = np.asarray(ref[name])
        np.testing.assert_allclose(
            np.asarray(out[name]), a,
            rtol=rtol, atol=atol * max(float(np.abs(a).max()), 1.0),
            err_msg=name)
