"""A/B timings for the FCT + tracer-divergence glue (the largest
non-kernel cost in the step: ~13 ms/eval of the 55 ms RHS at 512x512x64).

Variants:
  A. current: dy._fct (scaled faces materialized) + separate divergence
  B. fused expression: per-direction scaled-flux divergence written as one
     expression over F and a halo-padded mult (no scaled-face arrays)
  C. B + mult computed in the same expression (no separate mult pass)

Run on the TPU: python scripts/bench_fct.py  (env MWML_BENCH_NX/NY/NZ)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from miniweatherml_tpu.dycore.euler import (Dycore, _AX_X, _AX_Y, _AX_Z,
                                            _slice_axis)
from miniweatherml_tpu.core.coupler import Grid

NX = int(os.environ.get("MWML_BENCH_NX", 512))
NY = int(os.environ.get("MWML_BENCH_NY", 512))
NZ = int(os.environ.get("MWML_BENCH_NZ", 64))
NTR = 3
INNER = 10

g = Grid(nx=NX, ny=NY, nz=NZ, xlen=400.0 * NX, ylen=400.0 * NY,
         zlen=200.0 * NZ)
dy = Dycore()
positive = np.array([True] * NTR)

rng = np.random.default_rng(0)
dt_ = jnp.float32
shape = (NTR, 1, NZ, NY, NX)
tr0 = jnp.asarray(rng.uniform(0.0, 1e-3, shape), dt_)
Fx0 = jnp.asarray(rng.normal(size=(NTR, 1, NZ, NY, NX + 1)) * 1e-3, dt_)
Fy0 = jnp.asarray(rng.normal(size=(NTR, 1, NZ, NY + 1, NX)) * 1e-3, dt_)
Fz0 = jnp.asarray(rng.normal(size=(NTR, 1, NZ + 1, NY, NX)) * 1e-3, dt_)
DT = 0.7


def scan_wrap(body):
    def fn(tr, Fx, Fy, Fz):
        def step(tr, _):
            t = body(tr, Fx, Fy, Fz)
            return tr + 1e-30 * t, None
        tr, _ = jax.lax.scan(step, tr, None, length=INNER)
        return tr
    return fn


def timeit(name, fn):
    f = jax.jit(scan_wrap(fn))
    out = f(tr0, Fx0, Fy0, Fz0)
    float(jnp.max(out))
    t0 = time.perf_counter()
    out = f(tr0, Fx0, Fy0, Fz0)
    float(jnp.max(out))
    el = (time.perf_counter() - t0) / INNER * 1e3
    print(f"{name:28s} {el:8.2f} ms/eval", flush=True)


def div(F, axis, n, dxi):
    return -(_slice_axis(F, axis, 1, n + 1) - _slice_axis(F, axis, 0, n)) / dxi


# --- A: current path -------------------------------------------------------
def variant_a(tr, Fx, Fy, Fz):
    Fx, Fy, Fz = dy._fct(g, tr, positive, Fx, Fy, Fz, DT, None)
    return (div(Fx, _AX_X, NX, g.dx) + div(Fz, _AX_Z, NZ, g.dz)
            + div(Fy, _AX_Y, NY, g.dy))


# --- shared mult -----------------------------------------------------------
def compute_mult(tr, Fx, Fy, Fz):
    dx, dyy, dz = g.dx, g.dy, g.dz
    vol = dx * dyy * dz
    mass_avail = jnp.maximum(tr, 0.0) * vol
    fo = (jnp.maximum(_slice_axis(Fx, _AX_X, 1, NX + 1), 0.0)
          - jnp.minimum(_slice_axis(Fx, _AX_X, 0, NX), 0.0)) / dx
    fo = fo + (jnp.maximum(_slice_axis(Fz, _AX_Z, 1, NZ + 1), 0.0)
               - jnp.minimum(_slice_axis(Fz, _AX_Z, 0, NZ), 0.0)) / dz
    fo = fo + (jnp.maximum(_slice_axis(Fy, _AX_Y, 1, NY + 1), 0.0)
               - jnp.minimum(_slice_axis(Fy, _AX_Y, 0, NY), 0.0)) / dyy
    mass_out = fo * DT * vol
    need = mass_out > mass_avail
    return jnp.where(need, mass_avail / jnp.maximum(mass_out, 1e-30), 1.0)


def dir_term(F, mult, axis, n, dxi):
    ones_shape = list(mult.shape)
    ones_shape[axis] = 1
    one = jnp.ones(ones_shape, mult.dtype)
    mpad = jnp.concatenate([one, mult, one], axis=axis)
    ml = _slice_axis(mpad, axis, 0, n + 1)
    mr = _slice_axis(mpad, axis, 1, n + 2)
    Fs = F * jnp.where(F > 0, ml, jnp.where(F < 0, mr, 1.0))
    return -(_slice_axis(Fs, axis, 1, n + 1)
             - _slice_axis(Fs, axis, 0, n)) / dxi


# --- B: fused scaled-divergence -------------------------------------------
def variant_b(tr, Fx, Fy, Fz):
    mult = compute_mult(tr, Fx, Fy, Fz)
    return (dir_term(Fx, mult, _AX_X, NX, g.dx)
            + dir_term(Fz, mult, _AX_Z, NZ, g.dz)
            + dir_term(Fy, mult, _AX_Y, NY, g.dy))


# --- C: B with mult behind a checkpoint barrier to force one materialize ---
def variant_c(tr, Fx, Fy, Fz):
    mult = jax.lax.optimization_barrier(compute_mult(tr, Fx, Fy, Fz))
    return (dir_term(Fx, mult, _AX_X, NX, g.dx)
            + dir_term(Fz, mult, _AX_Z, NZ, g.dz)
            + dir_term(Fy, mult, _AX_Y, NY, g.dy))


def variant_mult_only(tr, Fx, Fy, Fz):
    return compute_mult(tr, Fx, Fy, Fz)


def variant_scale_div_only(tr, Fx, Fy, Fz):
    # mult stands in as a cheap elementwise function of tr so only the
    # scale+div side is timed
    mult = jnp.minimum(tr * 1e3, 1.0)
    return (dir_term(Fx, mult, _AX_X, NX, g.dx)
            + dir_term(Fz, mult, _AX_Z, NZ, g.dz)
            + dir_term(Fy, mult, _AX_Y, NY, g.dy))


def variant_div_only(tr, Fx, Fy, Fz):
    return (div(Fx, _AX_X, NX, g.dx) + div(Fz, _AX_Z, NZ, g.dz)
            + div(Fy, _AX_Y, NY, g.dy))


def main():
    timeit("A current fct+div", variant_a)
    timeit("B fused scaled-div", variant_b)
    timeit("C fused + mult barrier", variant_c)
    timeit("D mult only", variant_mult_only)
    timeit("E scale+div only", variant_scale_div_only)
    timeit("F plain div only", variant_div_only)


if __name__ == "__main__":
    main()
