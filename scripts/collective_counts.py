"""Per-mesh HLO collective counts for the distributed step.

Compiles the explicit shard_map step (parallel/spmd.py) and the auto-SPMD
jit step over growing virtual CPU meshes and counts the communication ops
XLA inserted (collective-permute / all-reduce / all-gather / all-to-all).
This is the communication-structure evidence for the weak-scaling story
(BASELINE.md): the reference performs 12 point-to-point exchanges + a
handful of Allreduces per step (dynamics...h:574,830; sponge/nudging), and
the shard_map path must mirror that shape at every mesh size.

Usage: python scripts/collective_counts.py [--cpu N] [per_nx per_ny nz]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--cpu" in sys.argv:
    i = sys.argv.index("--cpu")
    _n = int(sys.argv[i + 1])
    del sys.argv[i:i + 2]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={_n}")
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.experiments.supercell_example import build
from miniweatherml_tpu.parallel.mesh import (make_mesh, near_square_factors,
                                             shard_state)
from miniweatherml_tpu.parallel.spmd import make_spmd_step
from miniweatherml_tpu.physics.column_nudging import ColumnNudger
from miniweatherml_tpu.physics.kessler import MicrophysicsKessler

OPS = ("collective-permute", "all-reduce", "all-gather", "all-to-all")


def count_ops(hlo_text: str) -> dict:
    counts = {}
    for op in OPS:
        # count op *instructions* (start variants included), not result
        # tuple mentions
        counts[op] = len(re.findall(rf"= \S* ?{op}(-start)?\(", hlo_text))
    return counts


def compiled_counts(n_devices: int, per_nx: int, per_ny: int, nz: int,
                    micro_kind: str = "kessler"):
    py, px = near_square_factors(n_devices)
    nx, ny = per_nx * px, per_ny * py
    cfg = config_from_dict(dict(
        sim_time=1e9, nens=1, nx_glob=nx, ny_glob=ny, nz=nz,
        xlen=400.0 * nx, ylen=400.0 * ny, zlen=200.0 * nz,
        init_data="supercell", out_prefix="cc", dt_phys=0.0, out_freq=-1.0))
    if micro_kind == "p3":
        from miniweatherml_tpu.experiments.supercell_p3 import build as build_p3
        from miniweatherml_tpu.physics.p3 import MicrophysicsP3
        state, mods, dycore = build_p3(cfg)
        micro = MicrophysicsP3()
    else:
        state, mods, dycore = build(cfg)
        micro = MicrophysicsKessler()
    mesh = make_mesh(devices=jax.devices()[:n_devices], ens=1)
    st = shard_state(state, mesh)
    dt = dycore.compute_time_step(state)
    # explicit shard_map path
    step = make_spmd_step(state, mesh, dycore, micro=micro,
                          nudger=ColumnNudger())
    txt_sm = jax.jit(lambda s: step(s, dt)).lower(st).compile().as_text()

    # auto-SPMD path: plain jit of the global-array step on sharded inputs
    def whole(s):
        for m in mods:
            s = m(s, dt)
        return s
    txt_auto = jax.jit(whole).lower(st).compile().as_text()
    return (f"{px}x{py}", count_ops(txt_sm), count_ops(txt_auto))


def main():
    micro_kind = "kessler"
    if "--micro" in sys.argv:
        i = sys.argv.index("--micro")
        micro_kind = sys.argv[i + 1]
        del sys.argv[i:i + 2]
    per_nx = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    per_ny = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    nz = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    ndev = len(jax.devices())
    print(f"{'devs':>5} {'mesh':>6} | shard_map: "
          + " ".join(f"{o:>18}" for o in OPS)
          + " | auto-SPMD: " + " ".join(f"{o:>18}" for o in OPS))
    n = 1
    while n <= ndev:
        mesh_s, sm, auto = compiled_counts(n, per_nx, per_ny, nz, micro_kind)
        print(f"{n:5d} {mesh_s:>6} | "
              + " ".join(f"{sm[o]:18d}" for o in OPS)
              + " |            "
              + " ".join(f"{auto[o]:18d}" for o in OPS), flush=True)
        n *= 2
    print("\n(constant per-step counts as the mesh grows = the nearest-"
          "neighbor ring structure scales; the reference's analog is 12 "
          "Isend/Irecv exchanges + Allreduces per step)")


if __name__ == "__main__":
    main()
