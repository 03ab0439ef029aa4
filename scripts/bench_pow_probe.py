"""Probe: cost of the Riemann pressure pow (C0 * rt**gamma) in the
sublane step-config kernel, by timing gamma=1.4 vs gamma=1.0 (XLA
strength-reduces x**1.0, removing the transcendental) and a
two-EUP exp2/log2 formulation for comparison.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from miniweatherml_tpu.ops.weno import weno_matrices
from miniweatherml_tpu.ops import pallas_recon as PR

NENS, NZ, NY, NX = 1, 64, 512, 512
INNER = 20


def scan_wrap(body):
    def fn(x):
        def step(x, _):
            sf, tf = body(x)
            return x + 0.0 * jnp.sum(sf[0]) / sf[0].size, None
        x, _ = jax.lax.scan(step, x, None, length=INNER)
        return jnp.max(x)
    return fn


def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = float(f(*args))
    t0 = time.perf_counter()
    _ = float(f(*args))
    el = (time.perf_counter() - t0) / INNER * 1e3
    print(f"{name:44s} {el:8.2f} ms", flush=True)


def main():
    mats = weno_matrices(5)
    rng = np.random.default_rng(0)
    dt = jnp.float32
    prim_z = jnp.asarray(rng.normal(size=(8, NENS, NZ, NY * NX)), dt) + 2.0
    hye = jnp.ones((NENS, NZ + 1), dt)
    hyte = jnp.full((NENS, NZ + 1), 300.0, dt)

    for gamma in (1.4, 1.0):
        fn = lambda x, gm=gamma: PR.direction_fluxes_pallas_sub(
            x, None, None, hye, hyte, NZ, mats, 0.0, 3, 27.5, gm,
            row_block=1, lane_block=128, fast_weights=True,
            div_scale=0.005, self_bc=1, bc=(1, 1))
        timeit(f"z step-config gamma={gamma}", scan_wrap(fn), prim_z)


if __name__ == "__main__":
    main()
