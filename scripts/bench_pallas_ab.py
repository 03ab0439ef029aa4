"""A/B benchmark: XLA vs Pallas dycore on the real chip.

Run in background (never timeout-kill a TPU client: the axon chip wedges
for ~5 min per kill).  Compiles at a tiny grid first so a pathological
Pallas compile is caught cheaply.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from miniweatherml_tpu.core.coupler import Grid, make_coupler_state
from miniweatherml_tpu.dycore.euler import Dycore
from miniweatherml_tpu.physics.kessler import MicrophysicsKessler


def setup(nx, ny, nz):
    g = Grid(nx=nx, ny=ny, nz=nz, xlen=400.0 * nx, ylen=400.0 * ny,
             zlen=200.0 * nz)
    st = make_coupler_state(g, dtype="float32",
                            options={"init_data": "supercell",
                                     "out_freq": -1.0})
    st = MicrophysicsKessler().init(st)
    dy = Dycore()
    st = dy.init(st)
    return st, dy


def sync(s):
    return float(jnp.max(s.fields["temp"]))


def main():
    print("=== tiny grid compile check (64x64x16) ===", flush=True)
    st, dy_x = setup(64, 64, 16)
    dy_p = Dycore(riemann_impl="pallas")
    dt = dy_x.compute_time_step(st)
    t0 = time.perf_counter()
    op = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    sync(op)
    print(f"tiny pallas compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    ox = jax.jit(lambda s: dy_x.time_step(s, dt))(st)
    sync(ox)
    for name in ("uvel", "wvel", "temp", "water_vapor"):
        d = float(jnp.max(jnp.abs(ox[name] - op[name])))
        print(f"tiny {name}: maxabs diff {d:.3e}", flush=True)

    print("=== bench grid (512x512x64) ===", flush=True)
    st, dy_x = setup(512, 512, 64)
    dt = dy_x.compute_time_step(st)
    cells = 512 * 512 * 64
    for label, dy in (("xla", dy_x), ("pallas", dy_p)):
        f = jax.jit(lambda s, _dy=dy: _dy.time_step(s, dt))
        t0 = time.perf_counter()
        s2 = f(st)
        sync(s2)
        print(f"[{label}] compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            s2 = f(s2)
        sync(s2)
        el = (time.perf_counter() - t0) / 3
        print(f"[{label}] {el*1000:.1f} ms/step -> {cells/el/1e6:.1f} "
              f"Mcellups", flush=True)


if __name__ == "__main__":
    main()
