"""On-chip timing breakdown of the benchmark step (axon TPU).

Times each piece of the physics chain separately (scan-fused, value-fetch
synced) so perf work targets the real wall, not a guess:

  full        -- the bench.py step (dycore + Kessler + sponge + nudging)
  dycore      -- dycore.time_step only
  tendencies  -- one RHS evaluation (3 direction fluxes + FCT + div)
  dir_x/y/z   -- one direction's fused recon+Riemann megakernel
  kessler     -- microphysics only

Usage: python scripts/profile_step.py  (env: MWML_BENCH_NX/NY/NZ, MWML_PROF_INNER)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.experiments.supercell_example import build
from miniweatherml_tpu.dycore.euler import Dycore, IDR, _AX_X, _AX_Y, _AX_Z, IDU, IDV, IDW


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    nx = int(os.environ.get("MWML_BENCH_NX", 512 if on_tpu else 64))
    ny = int(os.environ.get("MWML_BENCH_NY", 512 if on_tpu else 64))
    nz = int(os.environ.get("MWML_BENCH_NZ", 64 if on_tpu else 32))
    inner = int(os.environ.get("MWML_PROF_INNER", 10 if on_tpu else 2))

    config = config_from_dict(dict(
        sim_time=1.0e9, nens=1, nx_glob=nx, ny_glob=ny, nz=nz,
        xlen=400.0 * nx, ylen=400.0 * ny, zlen=200.0 * nz,
        init_data="supercell", out_prefix="prof", dt_phys=0.0, out_freq=-1.0,
    ))
    state, mods, dycore = build(config)
    dy = Dycore(ord=int(os.environ.get("MWML_BENCH_ORD", 5)),
                riemann_impl="pallas" if on_tpu else "xla",
                fast_weights=on_tpu)
    mods = [dy.time_step] + list(mods[1:])
    dt = dy.compute_time_step(state)

    g = state.grid
    consts = dy._consts(state)
    hy = dy._hy(state)
    immersed = state["immersed_proportion"]
    positive = np.array([t.positive for t in state.meta.tracers])
    s0, tr0 = jax.jit(dy.convert_coupler_to_dynamics)(state)

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)                      # compile + run
        val = float(jnp.max(jax.tree.leaves(out)[0]))  # sync via value fetch
        t0 = time.perf_counter()
        out = f(*args)
        val = float(jnp.max(jax.tree.leaves(out)[0]))
        el = (time.perf_counter() - t0) / inner * 1e3
        print(f"{name:14s} {el:8.2f} ms/iter   (sync={val:.3e})")
        return el

    def scan_wrap(body):
        def fn(s, tr):
            def step(carry, _):
                s, tr = carry
                s2, tr2 = body(s, tr)
                return (s2, tr2), None
            (s, tr), _ = jax.lax.scan(step, (s, tr), None, length=inner)
            return s, tr
        return fn

    # --- full chain (state-level) ---
    def full_body(st):
        def step(st, _):
            for m in mods:
                st = m(st, dt)
            return st, None
        st, _ = jax.lax.scan(step, st, None, length=inner)
        return st

    f = jax.jit(full_body)
    st = f(state); _ = float(jnp.max(st.fields["temp"]))
    t0 = time.perf_counter(); st = f(state)
    _ = float(jnp.max(st.fields["temp"]))
    t_full = (time.perf_counter() - t0) / inner * 1e3
    print(f"{'full':14s} {t_full:8.2f} ms/iter")

    def dyc_body(st):
        def step(st, _):
            return dy.time_step(st, dt), None
        st, _ = jax.lax.scan(step, st, None, length=inner)
        return st
    fd = jax.jit(dyc_body)
    st = fd(state); _ = float(jnp.max(st.fields["temp"]))
    t0 = time.perf_counter(); st = fd(state)
    _ = float(jnp.max(st.fields["temp"]))
    print(f"{'dycore':14s} {(time.perf_counter() - t0) / inner * 1e3:8.2f} ms/iter")

    # --- tendencies: one RHS eval ---
    def tend(s, tr):
        st_, tt_ = dy._tendencies(g, consts, hy, immersed, positive, None,
                                  s, tr, dt)
        return s + 1e-30 * st_, tr + 1e-30 * tt_
    timeit("tendencies", scan_wrap(tend), s0, tr0)

    # --- single directions ---
    hyc = hy[0][:, :, None, None]
    full_r0 = s0[IDR] + hyc

    def mkdir(axis, n, bc, nid, label):
        def one(s, tr):
            full_r = s[IDR] + hyc
            prim = jnp.concatenate(
                [s[IDR:IDU], s[IDU:4] / full_r, s[4:5], tr / full_r])
            SF, TF = dy._direction_fluxes(g, consts, hy, prim,
                                          axis, n, bc, nid, None)
            ds = jax.lax.slice_in_dim(SF, 0, s.shape[axis + 5] if False else None, axis=0)
            # fold a flux dependency back into the carry (keeps scan honest)
            s2 = s + 1e-30 * (jax.lax.slice_in_dim(SF, 0, n, axis=axis)
                              - 0.0)
            tr2 = tr + 1e-30 * jax.lax.slice_in_dim(TF, 0, n, axis=axis)
            return s2, tr2
        timeit(label, scan_wrap(one), s0, tr0)

    mkdir(_AX_X, g.nx, consts.bc_x, IDU, "dir_x")
    mkdir(_AX_Z, g.nz, consts.bc_z, IDW, "dir_z")
    if not g.sim2d:
        mkdir(_AX_Y, g.ny, consts.bc_y, IDV, "dir_y")

    # --- glue pieces ---
    def prim_only(s, tr):
        full_r = s[IDR] + hyc
        prim = jnp.concatenate(
            [s[IDR:IDU], s[IDU:4] / full_r, s[4:5], tr / full_r])
        return s + 1e-30 * prim[:5], tr + 1e-30 * prim[5:]
    timeit("prim", scan_wrap(prim_only), s0, tr0)

    positive_np = positive

    def fct_div(s, tr):
        def faces(axis):
            pad = [(0, 0)] * tr.ndim
            pad[axis] = (0, 1)
            return jnp.pad(tr, pad) + 1e-6
        TFx = faces(-1)
        TFz = faces(-3)
        TFy = None if g.sim2d else faces(-2)
        TFx, TFy, TFz = dy._fct(g, tr, positive_np, TFx, TFy, TFz, dt, None)
        def div(F, axis, n, dxi):
            return -(jax.lax.slice_in_dim(F, 1, n + 1, axis=axis)
                     - jax.lax.slice_in_dim(F, 0, n, axis=axis)) / dxi
        t_tend = (div(TFx, -1, g.nx, g.dx) + div(TFz, -3, g.nz, g.dz))
        if TFy is not None:
            t_tend = t_tend + div(TFy, -2, g.ny, g.dy)
        return s, tr + 1e-30 * t_tend
    timeit("fct+div(t)", scan_wrap(fct_div), s0, tr0)

    def rk_combine(s, tr):
        # one SSPRK3 stage-2-style combine over state+tracers
        s2 = 0.75 * s + 0.25 * s + 0.25 * dt * (1e-30 * s)
        t2 = jnp.maximum(0.75 * tr + 0.25 * tr + 0.25 * dt * (1e-30 * tr),
                         0.0)
        return s2, t2
    timeit("rk_combine", scan_wrap(rk_combine), s0, tr0)

    # --- dir_z A/B: self-halo (default) vs explicit strips ---
    from miniweatherml_tpu.ops.stencil import halo_strips as _hstrips
    from miniweatherml_tpu.ops import pallas_recon as PR

    def dirz_strips(s, tr):
        full_r = s[IDR] + hyc
        prim = jnp.concatenate(
            [s[IDR:IDU], s[IDU:4] / full_r, s[4:5], tr / full_r])
        hp = dy.hs + 1
        lo, hi = _hstrips(prim, _AX_Z, hp, consts.bc_z, zero_var=IDW)
        nvar = prim.shape[0]
        resh = prim.reshape(nvar, g.nens, g.nz, g.ny * g.nx)
        lo_r = lo.reshape(nvar, g.nens, hp, g.ny * g.nx)
        hi_r = hi.reshape(nvar, g.nens, hp, g.ny * g.nx)
        SF, TF = PR.direction_fluxes_pallas_sub(
            resh, lo_r, hi_r, hy[2], hy[3], g.nz, dy.mats, dy.cutoff, 3,
            consts.C0, consts.gamma, fast_weights=dy.fast_weights,
            div_scale=1.0 / g.dz, bc=(jnp.int32(1), jnp.int32(1)))
        s2 = s + 1e-30 * SF.reshape(5, g.nens, g.nz, g.ny, g.nx)
        tr2 = tr + 1e-30 * jax.lax.slice_in_dim(
            TF.reshape(3, g.nens, g.nz + 1, g.ny, g.nx), 0, g.nz, axis=2)
        return s2, tr2
    timeit("dir_z strips", scan_wrap(dirz_strips), s0, tr0)

    # --- microphysics ---
    micro = mods[1]
    def kes_body(st):
        def step(st, _):
            return micro(st, dt), None
        st, _ = jax.lax.scan(step, st, None, length=inner)
        return st
    fk = jax.jit(kes_body)
    st = fk(state); _ = float(jnp.max(st.fields["temp"]))
    t0 = time.perf_counter(); st = fk(state)
    _ = float(jnp.max(st.fields["temp"]))
    print(f"{'kessler':14s} {(time.perf_counter() - t0) / inner * 1e3:8.2f} ms/iter")


if __name__ == "__main__":
    main()
