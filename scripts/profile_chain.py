"""Attribute a full physics-chain step to its modules on-chip.

Times the fused whole-chain step and each module jitted separately
(dycore, micro, sponge, nudging), so glue cost = fused - sum(pieces) is
visible.  Works for either micro chain:

    MWML_CHAIN=p3|kessler (default p3)
    MWML_P3_NX/NY/NZ grid overrides (default 256x256x64 on TPU)

Dispatch latency is pipelined out as in profile_p3 (inner back-to-back
async calls, one value-fetch sync at the end).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from miniweatherml_tpu.config import config_from_dict


def _sync(out):
    leaves = [a for a in jax.tree_util.tree_leaves(out) if hasattr(a, "dtype")]
    if leaves:
        float(jnp.max(leaves[0]))


def timeit(name, f, *args, reps=3, inner=4):
    out = f(*args)
    _sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = f(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    print(f"{name:38s} {best * 1e3:9.2f} ms", flush=True)
    return best


def main():
    chain = os.environ.get("MWML_CHAIN", "p3")
    on_tpu = jax.devices()[0].platform == "tpu"
    nx = int(os.environ.get("MWML_P3_NX", 256 if on_tpu else 48))
    ny = int(os.environ.get("MWML_P3_NY", 256 if on_tpu else 48))
    nz = int(os.environ.get("MWML_P3_NZ", 64 if on_tpu else 24))
    cfg = config_from_dict(dict(
        sim_time=1e9, nens=1, nx_glob=nx, ny_glob=ny, nz=nz,
        xlen=400.0 * nx, ylen=400.0 * ny, zlen=200.0 * nz,
        init_data="supercell", out_prefix="chainprof", dt_phys=0.0,
        out_freq=-1.0,
        extras={"riemann_impl": "pallas", "fast_weights": True}
        if on_tpu else {}))
    if chain == "p3":
        from miniweatherml_tpu.experiments.supercell_p3 import build
    else:
        from miniweatherml_tpu.experiments.supercell_example import build
    state, mods, dycore = build(cfg)
    dt = float(dycore.compute_time_step(state))
    ncells = nx * ny * nz
    print(f"chain={chain} grid {nx}x{ny}x{nz} = {ncells/1e6:.1f}M cells, "
          f"dt={dt:.3f}", flush=True)

    # one dycore step so micro sees a realistic (storm-initialized) state
    state = jax.jit(lambda s: mods[0](s, dt))(state)
    _sync(state)

    names = ["dycore", "micro", "sponge", "nudging"][: len(mods)]
    total_pieces = 0.0
    for name, mod in zip(names, mods):
        total_pieces += timeit(f"module: {name}", jax.jit(
            lambda s, _m=mod: _m(s, dt)), state)

    def whole(s):
        for m in mods:
            s = m(s, dt)
        return s

    fused = timeit("fused whole-chain step", jax.jit(whole), state)
    print(f"{'sum of separately-jitted modules':38s} "
          f"{total_pieces * 1e3:9.2f} ms", flush=True)
    print(f"fused step throughput: {ncells / fused / 1e6:.1f} Mcellups",
          flush=True)


if __name__ == "__main__":
    main()
