"""Auxiliary physics modules vs straight-line transliterations of their
reference kernels: sponge_layer (model/modules/sponge_layer.h), the column
nudger (column_nudging.h), and the deterministic thermal perturbation
(perturb_temperature.h).  With these, every physics module in the
framework is anchored against an independent reading of the reference
(dycore/Kessler/P3 have full oracle modules; these three are small enough
to transliterate inline).  Note the reference sponge comment advertises a
SQUARED cosine profile but the code applies it unsquared
(sponge_layer.h:68-71) -- the transliteration follows the code.
"""

import numpy as np
import jax.numpy as jnp

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.experiments.supercell_example import build
from miniweatherml_tpu.physics.column_nudging import ColumnNudger
from miniweatherml_tpu.physics.perturb import perturb_temperature
from miniweatherml_tpu.physics.sponge import sponge_layer


def _state():
    cfg = config_from_dict(dict(
        sim_time=10.0, nens=2, nx_glob=16, ny_glob=8, nz=24,
        xlen=40000.0, ylen=20000.0, zlen=20000.0,
        init_data="supercell", out_prefix="t", dt_phys=0.0, out_freq=-1.0,
        dtype="float64"))
    state, mods, dycore = build(cfg)
    # perturb so horizontal means are non-trivial
    rng = np.random.default_rng(3)
    upd = {}
    for n in ("density_dry", "uvel", "vvel", "wvel", "temp", "water_vapor",
              "cloud_liquid", "precip_liquid"):
        f = np.asarray(state[n])
        upd[n] = jnp.asarray(f * (1.0 + 0.01 * rng.uniform(-1, 1, f.shape))
                             + 0.001 * rng.uniform(-1, 1, f.shape))
    return state.replace_fields(**upd)


def test_sponge_layer_matches_reference_kernel():
    """sponge_layer.h:8-75: 10 top layers relax toward the horizontal
    mean (w toward 0) with space_factor = (cos(pi*rel_dist)+1)/2 --
    UNSQUARED, per the code, not the comment -- times dt/time_scale."""
    state = _state()
    dt, ts, num_layers = 7.0, 60.0, 10
    out = sponge_layer(state, dt, time_scale=ts)

    g = state.grid
    names = ["density_dry", "uvel", "vvel", "wvel", "temp"] + \
        list(state.meta.tracer_names)
    time_factor = dt / ts
    for name in names:
        f = np.array(np.asarray(state[name]), dtype=float)
        for kloc in range(num_layers):
            k = g.nz - 1 - kloc
            z = (k + 0.5) * g.dz
            rel_dist = (g.zlen - z) / (num_layers * g.dz)
            space_factor = (np.cos(np.pi * rel_dist) + 1.0) / 2.0
            factor = space_factor * time_factor
            havg = (0.0 if name == "wvel"
                    else f[:, k].mean(axis=(1, 2), keepdims=True))
            f[:, k] += (havg - f[:, k]) * factor
        np.testing.assert_allclose(np.asarray(out[name]), f, rtol=1e-12,
                                   atol=1e-14, err_msg=name)


def test_column_nudger_matches_reference_kernel():
    """column_nudging.h:39-66: state += dt*(column - column_avg)/900 for
    {rho_d, u, v, T, rho_v}, with the stored column from set_column."""
    state0 = _state()
    nudger = ColumnNudger()
    state0 = nudger.set_column(state0)
    # evolve the state so column != current average
    rng = np.random.default_rng(4)
    upd = {n: jnp.asarray(np.asarray(state0[n])
                          * (1.0 + 0.02 * rng.uniform(-1, 1,
                                                      state0[n].shape)))
           for n in ("density_dry", "uvel", "vvel", "temp", "water_vapor")}
    state = state0.replace_fields(**upd)
    dt = 5.0
    out = nudger.nudge_to_column(state, dt)

    col = np.asarray(state0["nudging_column"])  # (5, nens, nz)
    for l, name in enumerate(("density_dry", "uvel", "vvel", "temp",
                              "water_vapor")):
        f = np.asarray(state[name])
        avg = f.mean(axis=(2, 3), keepdims=True)
        want = f + dt * (col[l][:, :, None, None] - avg) / 900.0
        np.testing.assert_allclose(np.asarray(out[name]), want, rtol=1e-12,
                                   atol=1e-14, err_msg=name)


def test_thermal_perturbation_matches_reference_kernel():
    """perturb_temperature.h:42-66: +5 K * cos(pi*rad/2)^2 inside the
    normalized ellipsoid (10 km, 10 km, 1.5 km) centered at
    (xlen/2, ylen/2, 1500 m)."""
    state = _state()
    out = perturb_temperature(state, thermal=True, random=False)
    g = state.grid
    t0 = np.asarray(state["temp"])
    want = t0.copy()
    for k in range(g.nz):
        for j in range(g.ny):
            for i in range(g.nx):
                xloc = (i + 0.5) * g.dx
                yloc = (j + 0.5) * g.dy
                zloc = (k + 0.5) * g.dz
                xn = (xloc - g.xlen / 2) / 10000.0
                yn = (yloc - g.ylen / 2) / 10000.0
                zn = (zloc - 1500.0) / 1500.0
                rad = np.sqrt(xn * xn + yn * yn + zn * zn)
                if rad < 1:
                    want[:, k, j, i] += 5.0 * np.cos(np.pi * rad / 2) ** 2
    np.testing.assert_allclose(np.asarray(out["temp"]), want, rtol=1e-12,
                               atol=1e-12)


def test_horizontal_sponge_matches_reference_kernel():
    """horizontal_sponge.h:100-193: per-wall sequential cosine blends
    toward the stored column -- overlapping corner bands compose (the
    later wall blends the earlier wall's OUTPUT), which the closed-form
    weight 1 - prod(1-w_k) must reproduce exactly.  All four walls on, a
    grid small enough that the bands overlap."""
    from miniweatherml_tpu.physics.horizontal_sponge import HorizontalSponge

    state = _state()   # 16 x 8 horizontal: 5-cell bands overlap in y
    hs = HorizontalSponge(sponge_cells=5, time_scale=2.0)
    state = hs.init(state)
    dt = 0.7
    out = hs.apply(state, dt, x1=True, x2=True, y1=True, y2=True)

    g = state.grid
    names = ("density_dry", "uvel", "vvel", "wvel", "temp", "water_vapor")
    col = np.asarray(state["horiz_sponge_column"])  # (6, nens, nz)
    n_sp, tf = 5, dt / 2.0
    fields = [np.array(np.asarray(state[n]), dtype=float) for n in names]

    def blend(weight_of_ij):
        for l in range(len(names)):
            f = fields[l]
            c = col[l][:, :, None, None]
            for j in range(g.ny):
                for i in range(g.nx):
                    w = weight_of_ij(i, j) * tf
                    f[:, :, j, i] = (w * c[:, :, 0, 0]
                                     + (1 - w) * f[:, :, j, i])

    # the reference's four sequential kernels
    blend(lambda i, j: ((np.cos(np.pi * i / (n_sp - 1)) + 1) / 2
                        if i < n_sp else 0.0))
    blend(lambda i, j: ((np.cos(np.pi * (g.nx - 1 - i) / (n_sp - 1)) + 1) / 2
                        if g.nx - 1 - i < n_sp else 0.0))
    blend(lambda i, j: ((np.cos(np.pi * j / (n_sp - 1)) + 1) / 2
                        if j < n_sp else 0.0))
    blend(lambda i, j: ((np.cos(np.pi * (g.ny - 1 - j) / (n_sp - 1)) + 1) / 2
                        if g.ny - 1 - j < n_sp else 0.0))

    for l, name in enumerate(names):
        np.testing.assert_allclose(np.asarray(out[name]), fields[l],
                                   rtol=1e-12, atol=1e-13, err_msg=name)


def test_time_averager_matches_reference_kernel():
    """time_averager.h:60-73: tavg = inertia*tavg + (1-inertia)*f with
    inertia = etime/(etime+dt), over three unequal steps."""
    from miniweatherml_tpu.physics.time_averager import TimeAverager

    state = _state()
    ta = TimeAverager()
    state = ta.init(state)
    names = ("density_dry", "uvel", "vvel", "wvel", "temp", "water_vapor")
    tavg = {n: np.zeros_like(np.asarray(state[n]), dtype=float)
            for n in names}
    etime = 0.0
    rng = np.random.default_rng(5)
    for dt in (0.5, 1.25, 2.0):
        state = state.replace_fields(
            uvel=state["uvel"] + 0.1 * dt,
            temp=state["temp"] * (1.0 + 1e-4 * dt))
        inertia = etime / (etime + dt)
        for n in names:
            tavg[n] = inertia * tavg[n] + (1 - inertia) * np.asarray(state[n])
        etime += dt
        state = ta.accumulate(state, dt)
    for n in names:
        np.testing.assert_allclose(np.asarray(state["time_avg_" + n]),
                                   tavg[n], rtol=1e-12, atol=1e-14,
                                   err_msg=n)
