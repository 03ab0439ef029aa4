"""Weak-scaling harness: fixed per-device supercell block, growing mesh.

On real multi-chip hardware (e.g. v5p pods) this produces the BASELINE.md
weak-scaling table; on this container it runs on the virtual CPU mesh to
validate the sweep mechanics (CPU timings are not meaningful).

Usage:
  python scripts/weak_scaling.py [per_dev_nx per_dev_ny nz]
  (set XLA_FLAGS=--xla_force_host_platform_device_count=N + cpu platform
   for a virtual mesh)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# --cpu N: self-provision an N-virtual-device CPU mesh (env JAX_PLATFORMS
# is not honored under the axon plugin; the config update must precede
# backend init, same trick as __graft_entry__.dryrun_multichip)
if "--cpu" in sys.argv:
    i = sys.argv.index("--cpu")
    _n = int(sys.argv[i + 1])
    del sys.argv[i:i + 2]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={_n}")
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.experiments.supercell_example import build
from miniweatherml_tpu.parallel.mesh import make_mesh, near_square_factors, shard_state
from miniweatherml_tpu.parallel.spmd import make_spmd_step
from miniweatherml_tpu.physics.column_nudging import ColumnNudger
from miniweatherml_tpu.physics.kessler import MicrophysicsKessler


def run(n_devices: int, per_nx: int, per_ny: int, nz: int, steps: int = 3):
    py, px = near_square_factors(n_devices)
    nx, ny = per_nx * px, per_ny * py
    cfg = config_from_dict(dict(
        sim_time=1e9, nens=1, nx_glob=nx, ny_glob=ny, nz=nz,
        xlen=400.0 * nx, ylen=400.0 * ny, zlen=200.0 * nz,
        init_data="supercell", out_prefix="ws", dt_phys=0.0, out_freq=-1.0))
    state, mods, dycore = build(cfg)
    mesh = make_mesh(devices=jax.devices()[:n_devices], ens=1)
    st = shard_state(state, mesh)
    dt = dycore.compute_time_step(state)
    step = make_spmd_step(state, mesh, dycore, micro=MicrophysicsKessler(),
                          nudger=ColumnNudger())
    f = jax.jit(lambda s: step(s, dt))
    s2 = f(st)
    float(jnp.max(s2.fields["temp"]))  # sync
    t0 = time.perf_counter()
    for _ in range(steps):
        s2 = f(s2)
    float(jnp.max(s2.fields["temp"]))
    el = (time.perf_counter() - t0) / steps
    cells = nx * ny * nz
    return dict(devices=n_devices, grid=f"{nx}x{ny}x{nz}",
                ms_per_step=el * 1000,
                mcellups_total=cells / el / 1e6,
                mcellups_per_device=cells / el / 1e6 / n_devices)


def main():
    per_nx = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    per_ny = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    nz = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    ndev = len(jax.devices())
    print(f"{'devs':>5s} {'grid':>16s} {'ms/step':>9s} {'Mcell/s':>9s} "
          f"{'Mcell/s/dev':>12s}")
    n = 1
    while n <= ndev:
        r = run(n, per_nx, per_ny, nz)
        print(f"{r['devices']:5d} {r['grid']:>16s} {r['ms_per_step']:9.1f} "
              f"{r['mcellups_total']:9.1f} {r['mcellups_per_device']:12.2f}",
              flush=True)
        n *= 2
    print("\n(linear weak scaling = constant Mcell/s/dev as devices grow)")


if __name__ == "__main__":
    main()
