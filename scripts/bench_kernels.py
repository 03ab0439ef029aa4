"""On-chip block-size sweep for the direction megakernels.

Times direction_fluxes_pallas (lane-stencil, x) and
direction_fluxes_pallas_sub (sublane-stencil, y/z) on bench-shaped synthetic
data across block sizes, to pick VMEM tiles that maximize VPU utilization.
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
NVAR = 8
ORD = 5
HS = (ORD - 1) // 2
HP = HS + 1
INNER = 20


def timeit(name, fn, *args):
    try:
        f = jax.jit(fn)
        out = f(*args)
        _ = float(jnp.max(out))
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jnp.max(out))
        el = (time.perf_counter() - t0) / INNER * 1e3
        cells = NENS * NZ * NY * NX
        print(f"{name:44s} {el:8.2f} ms   ({cells/el/1e3:.0f} Mcell/s)",
              flush=True)
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:120]}", flush=True)


def scan_wrap(body):
    def fn(x):
        def step(x, _):
            sf, tf = body(x)
            return x + 0.0 * jnp.sum(sf[0]) / sf[0].size, None
        x, _ = jax.lax.scan(step, x, None, length=INNER)
        return jnp.max(x)
    return fn


def main():
    mats = weno_matrices(ORD)
    rng = np.random.default_rng(0)
    dt = jnp.float32

    # ---- x-direction shapes ----
    B = NENS * NZ * NY
    prim = jnp.asarray(rng.normal(size=(NVAR, B, NX)), dt) + 2.0
    lo = jnp.asarray(rng.normal(size=(NVAR, B, HP)), dt) + 2.0
    hi = jnp.asarray(rng.normal(size=(NVAR, B, HP)), dt) + 2.0
    # The lane kernel's hy BlockSpec requires full face arrays (Bt, NX+1)
    # (euler._direction_fluxes_pallas broadcasts the same way).
    hyr = jnp.ones((B, NX + 1), dt)
    hyt = jnp.full((B, NX + 1), 300.0, dt)

    for bt in (8, 16):
        fn = lambda x, bt=bt: PR.direction_fluxes_pallas(
            x, lo, hi, hyr, hyt, NX, mats, 0.0, 1, 27.5, 1.4,
            block_rows=bt, fast_weights=True)
        timeit(f"x lane-kernel block_rows={bt}", scan_wrap(fn), prim)
    fn = lambda x: PR.direction_fluxes_pallas(
        x, lo, hi, hyr, hyt, NX, mats, 0.0, 1, 27.5, 1.4,
        block_rows=8, fast_weights=True, opt=False)
    timeit("x lane-kernel ref-algebra (opt=0)", scan_wrap(fn), prim)

    # ---- z-direction shapes ----
    prim_z = jnp.asarray(rng.normal(size=(NVAR, NENS, NZ, NY * NX)), dt) + 2.0
    lo_z = jnp.asarray(rng.normal(size=(NVAR, NENS, HP, NY * NX)), dt) + 2.0
    hi_z = jnp.asarray(rng.normal(size=(NVAR, NENS, HP, NY * NX)), dt) + 2.0
    hye = jnp.ones((NENS, NZ + 1), dt)
    hyte = jnp.full((NENS, NZ + 1), 300.0, dt)

    for lb, budget in ((128, 24000), (256, 24000), (512, 48000)):
        os.environ["MWML_PALLAS_BUDGET"] = str(budget)
        fn = lambda x, lb=lb: PR.direction_fluxes_pallas_sub(
            x, lo_z, hi_z, hye, hyte, NZ, mats, 0.0, 3, 27.5, 1.4,
            row_block=1, lane_block=lb, fast_weights=True)
        timeit(f"z sub-kernel lane_block={lb}", scan_wrap(fn), prim_z)
    os.environ.pop("MWML_PALLAS_BUDGET", None)

    # the step's actual z configuration: self-halo (wall BC) + in-kernel
    # state divergence, no strip inputs
    fn = lambda x: PR.direction_fluxes_pallas_sub(
        x, None, None, hye, hyte, NZ, mats, 0.0, 3, 27.5, 1.4,
        row_block=1, lane_block=128, fast_weights=True,
        div_scale=0.005, self_bc=1, bc=(1, 1))
    timeit("z sub-kernel step-config (selfbc+div)", scan_wrap(fn), prim_z)
    fn = lambda x: PR.direction_fluxes_pallas_sub(
        x, lo_z, hi_z, hye, hyte, NZ, mats, 0.0, 3, 27.5, 1.4,
        row_block=1, lane_block=128, fast_weights=True, div_scale=0.005)
    timeit("z sub-kernel strips+div", scan_wrap(fn), prim_z)

    # ---- y-direction via chunked sublane kernel (what the step does) ----
    for cn in (64, 128):
        C = NY // cn
        prim_y = jnp.asarray(
            rng.normal(size=(NVAR, NENS * NZ * C, cn, NX)), dt) + 2.0
        lo_y = jnp.asarray(
            rng.normal(size=(NVAR, NENS * NZ * C, HP, NX)), dt) + 2.0
        hi_y = jnp.asarray(
            rng.normal(size=(NVAR, NENS * NZ * C, HP, NX)), dt) + 2.0
        hyr_y = jnp.ones((NENS * NZ * C, 1), dt)
        hyt_y = jnp.full((NENS * NZ * C, 1), 300.0, dt)
        fn = lambda x, cn=cn, C=C, l=lo_y, h=hi_y, hr=hyr_y, ht=hyt_y: \
            PR.direction_fluxes_pallas_sub(
                x, l, h, hr, ht, cn, mats, 0.0, 2, 27.5, 1.4,
                fast_weights=True, nchunk=C)
        timeit(f"y chunked sub-kernel cn={cn}", scan_wrap(fn), prim_y)


if __name__ == "__main__":
    main()
