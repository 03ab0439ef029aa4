"""Attribute the P3 chain's on-TPU step time to its pieces: full
time_step, saturation bisection, and each family of table lookups
(trilinear ice, quad-linear ice-rain collection, 1-D rain rows).

The table lookups are full-grid gathers -- the suspected TPU slow path
(XLA lowers generic gathers to slow scalar-ish loops on TPU).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.experiments.supercell_p3 import build
from miniweatherml_tpu.physics.p3 import compute_adjusted_state
from miniweatherml_tpu.physics.p3_tables import (
    default_table_path, generate_rain_tables, ice_table_indices,
    interp_collect, interp_ice, interp_rain, load_p3_tables,
    rain_collection_index, rain_size_index)


def _sync(out):
    """Fetch ONE scalar: on the axon platform block_until_ready returns
    early, so a value fetch is the only honest sync; fetching a single
    leaf keeps the host round-trip out of the per-rep cost."""
    leaves = [a for a in jax.tree_util.tree_leaves(out) if hasattr(a, "dtype")]
    if leaves:
        float(jnp.max(leaves[0]))


def timeit(name, f, *args, reps=3, inner=4):
    """Median-free best-of-reps with ``inner`` back-to-back async calls
    per rep and one sync at the end: the tunnel's ~0.4 s dispatch latency
    pipelines across the inner calls instead of being counted ``inner``
    times (the numbers recorded before this change carried that latency)."""
    out = f(*args)
    _sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = f(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    print(f"{name:34s} {best * 1e3:9.2f} ms", flush=True)
    return best


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    nx = int(os.environ.get("MWML_P3_NX", 256 if on_tpu else 48))
    ny = int(os.environ.get("MWML_P3_NY", 256 if on_tpu else 48))
    nz = int(os.environ.get("MWML_P3_NZ", 64 if on_tpu else 24))
    if os.environ.get("MWML_P3_LOOKUPS_ONLY", "0") == "1":
        # standalone lookup micro-bench only (skips the chain/phase
        # compiles -- minutes of tunnel time when only the table
        # implementations are being A/B'd)
        _lookups_only(nx, ny, nz)
        return
    cfg = config_from_dict(dict(
        sim_time=1e9, nens=1, nx_glob=nx, ny_glob=ny, nz=nz,
        xlen=400.0 * nx, ylen=400.0 * ny, zlen=200.0 * nz,
        init_data="supercell", out_prefix="p3prof", dt_phys=0.0,
        out_freq=-1.0))
    state, mods, dycore = build(cfg)
    dt = float(dycore.compute_time_step(state))
    micro = [m for m in mods]
    print(f"grid {nx}x{ny}x{nz} = {nx*ny*nz/1e6:.1f}M cells, dt={dt:.3f}")

    if os.environ.get("MWML_P3_PROFILE_ACTIVE", "0") == "1":
        # all-cells-active attribution: the same hydrometeor seeding as
        # bench.py's MWML_BENCH_P3_ACTIVE mode, so every presence gate and
        # lookup family fires in the phases below (throughput analysis
        # only -- see the bench.py NOTE on the seeded state's physics)
        seeds = {"cloud_water": 1.0e-4, "cloud_water_num": 1.0e7,
                 "rain": 1.0e-4, "rain_num": 1.0e5,
                 "ice": 1.0e-4, "ice_num": 1.0e5,
                 "ice_rime": 5.0e-5, "ice_rime_vol": 1.0e-7}
        state = state.replace_fields(**{
            k: jnp.maximum(state[k], v) for k, v in seeds.items()})
        print("all-cells-active seeding ON")

    # one dycore step first so the micro sees a realistic state
    state = jax.jit(lambda s: mods[0](s, dt))(state)

    timeit("full P3 time_step", jax.jit(lambda s: micro[1](s, dt)), state)

    # -- phase attribution: time successive p3_scheme PREFIXES from the
    # exact wrapper inputs; XLA dead-code-eliminates everything after each
    # checkpoint, so differences between consecutive rows are per-phase
    # costs (part1+DSD | process rates+lookups | conservation+update |
    # sedimentation | homog freeze+part3).
    from miniweatherml_tpu.physics.p3 import p3_scheme, p3_wrapper_inputs
    micro_obj = micro[1].__self__ if hasattr(micro[1], "__self__") else None
    tables_obj = getattr(micro_obj, "tables", None)
    inp = jax.jit(p3_wrapper_inputs)(state)
    sched_args = (*inp[:12], state["density_dry"], inp[12], inp[13], inp[14])

    def phase_fn(stop):
        @jax.jit
        def f(qc, nc, qr, nr, qi, ni, qm, bm, qv, theta, exner, pres,
              rho_d_, dz, qvp, tp):
            return p3_scheme(qc, nc, qr, nr, qi, ni, qm, bm, qv, theta,
                             exner, pres, rho_d_, dz, dt, z_axis=1,
                             tables=tables_obj, qv_prev=qvp, t_prev=tp,
                             profile_stop=stop)
        return f

    prev, prev_name = 0.0, "(wrapper inputs)"
    for stop in ("part1", "rates", "update", "sed", None):
        t = timeit(f"p3_scheme prefix [{stop or 'full'}]",
                   phase_fn(stop), *sched_args)
        print(f"    -> phase [{prev_name} .. {stop or 'full'}] "
              f"{(t - prev) * 1e3:9.2f} ms", flush=True)
        prev, prev_name = t, stop or "full"

    rho_d = state["density_dry"]
    rho_v = state["water_vapor"]
    rho_c = state["cloud_water"]
    temp = state["temp"]
    rho = rho_d + rho_v + rho_c
    timeit("saturation bisection (dtype-adaptive iters)",
           jax.jit(lambda *a: compute_adjusted_state(*a)),
           rho, rho_d, rho_v, rho_c, temp)

    _lookups_only(nx, ny, nz)


def _lookups_only(nx, ny, nz):
    tables = load_p3_tables(default_table_path())
    n = nx * ny * nz
    key = jax.random.PRNGKey(0)
    qi = jax.random.uniform(key, (n,), minval=1e-6, maxval=1e-3)
    ni = jnp.full((n,), 1e4)
    qm = qi * 0.3
    rhop = jnp.full((n,), 400.0)
    qr = jax.random.uniform(key, (n,), minval=1e-6, maxval=1e-3)
    nr = jnp.full((n,), 1e4)

    from miniweatherml_tpu.physics.p3_tables import (
        interp_collect_multi, interp_ice_multi, interp_rain_multi)
    vn_row, vm_row, revap_row = generate_rain_tables()
    # MWML_P3_IMPLS picks the implementations to time (comma-separated);
    # on TPU prefer "matmul,pallas" -- the gather path is ~100x slower and
    # long gather steps can trip the TPU watchdog.
    impls = os.environ.get("MWML_P3_IMPLS", "gather,matmul").split(",")
    for impl in impls:
        os.environ["MWML_P3_TABLES"] = impl

        @jax.jit
        def ice12(qi, ni, qm, rhop):
            idx = ice_table_indices(qi, ni, qm, rhop)
            return sum(interp_ice_multi(tables, tuple(range(1, 13)), *idx))

        timeit(f"12x trilinear ice lookups [{impl}]", ice12, qi, ni, qm,
               rhop)

        @jax.jit
        def coll2(qi, ni, qm, rhop, qr, nr):
            idx = ice_table_indices(qi, ni, qm, rhop)
            j0, fj = rain_collection_index(qr, nr)
            return sum(interp_collect_multi(tables, (1, 2), *idx, j0, fj))

        timeit(f"2x quad-linear collect lookups [{impl}]", coll2, qi, ni,
               qm, rhop, qr, nr)

        @jax.jit
        def rain3(qr, nr):
            dm = jnp.cbrt(6.0 * qr / (jnp.pi * 997.0
                                      * jnp.maximum(nr, 1.0)))
            i0, fi = rain_size_index(dm)
            return sum(interp_rain_multi((vn_row, vm_row, revap_row),
                                         i0, fi))

        timeit(f"3x 1-D rain-row lookups [{impl}]", rain3, qr, nr)
    os.environ.pop("MWML_P3_TABLES", None)


if __name__ == "__main__":
    main()
