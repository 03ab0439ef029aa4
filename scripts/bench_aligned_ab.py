"""A/B the aligned x tracer-flux FCT path (euler._ALIGNED_TFX) in one
process: step the bench configuration with both settings, assert the
results match bitwise (the aligned form performs the identical arithmetic
on a re-laid-out array), then time fused 10-step scans for each.
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
from miniweatherml_tpu.dycore import euler as E


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    nx = int(os.environ.get("MWML_BENCH_NX", 512 if on_tpu else 64))
    ny = int(os.environ.get("MWML_BENCH_NY", 512 if on_tpu else 64))
    nz = int(os.environ.get("MWML_BENCH_NZ", 64 if on_tpu else 32))
    inner = 10 if on_tpu else 2

    config = config_from_dict(dict(
        sim_time=1.0e9, nens=1, nx_glob=nx, ny_glob=ny, nz=nz,
        xlen=400.0 * nx, ylen=400.0 * ny, zlen=200.0 * nz,
        init_data="supercell", out_prefix="ab", dt_phys=0.0, out_freq=-1.0,
    ))
    state, mods, _ = build(config)
    dy = E.Dycore(ord=5, riemann_impl="pallas" if on_tpu else "xla",
                  fast_weights=on_tpu)
    mods = [dy.time_step] + list(mods[1:])
    dt = dy.compute_time_step(state)

    def make_step(aligned):
        E._ALIGNED_TFX = aligned

        def body(st):
            def step(st, _):
                for m in mods:
                    st = m(st, dt)
                return st, None
            st, _ = jax.lax.scan(step, st, None, length=inner)
            return st
        f = jax.jit(body)
        out = f(state)                       # compile + run
        _ = float(jnp.max(out.fields["temp"]))
        return f, out

    f0, out0 = make_step(False)
    f1, out1 = make_step(True)

    worst = 0.0
    for k in out0.fields:
        d = float(jnp.max(jnp.abs(out0.fields[k] - out1.fields[k])))
        worst = max(worst, d)
    print(f"max |aligned - baseline| over fields after {inner} steps: "
          f"{worst:.3e}", flush=True)
    # the two formulations reorder no arithmetic, so the match must be exact
    assert worst == 0.0, f"aligned tracer-flux path diverged: {worst:.3e}"

    reps = 4 if on_tpu else 1
    cells = nx * ny * nz
    best = {}
    for r in range(reps):
        for name, f in (("baseline (nx+1 faces)", f0), ("aligned", f1)):
            t0 = time.perf_counter()
            out = f(state)
            _ = float(jnp.max(out.fields["temp"]))
            el = (time.perf_counter() - t0) / inner * 1e3
            best[name] = min(best.get(name, 1e9), el)
            print(f"rep{r} {name:24s} {el:8.2f} ms/step   "
                  f"({cells/el/1e3:.1f} Mcell/s)", flush=True)
    for name, el in best.items():
        print(f"BEST {name:24s} {el:8.2f} ms/step   "
              f"({cells/el/1e3:.1f} Mcell/s)", flush=True)


if __name__ == "__main__":
    main()
