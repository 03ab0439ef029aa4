"""Timed benchmark experiment (reference experiments/community_benchmark/
driver.cpp): identical physics chain to supercell_example, output disabled,
with a timer around the simulation loop and a throughput report in
cell-updates/sec.

Usage: python -m miniweatherml_tpu.experiments.community_benchmark <input.yaml>
"""

from __future__ import annotations

import sys

import jax

from ..config import load_config
from .driver import Timers, run_main_loop
from .supercell_example import build

__all__ = ["main", "run_benchmark"]


def run_benchmark(config, warmup_steps: int = 2, quiet: bool = False):
    state, mods, dycore = build(config)
    g = config.grid

    # Compilation happens outside the timed region: run_main_loop AOT-compiles
    # every step executable before starting the simulation_loop timer.
    timers = Timers()
    nsteps = [0]
    state = run_main_loop(
        state, config, mods, dycore, writer=None, timers=timers,
        on_step=lambda s, d, e: nsteps.__setitem__(0, nsteps[0] + 1),
        quiet=quiet,
    )
    elapsed = timers.acc["simulation_loop"]
    # On HBM-limit grids the warm-up is skipped and each executable's first
    # (compiling) step runs under "first_step_compile" instead; subtract
    # those steps so mcellups is a steady-state number at every grid size.
    n_compile = timers.counts.get("first_step_compile", 0)
    warm_steps = nsteps[0] - n_compile
    cells = g.nx * g.ny * g.nz * g.nens
    cu_per_s = cells * warm_steps / max(elapsed, 1e-12)
    result = {
        "steps": nsteps[0],
        "warm_steps": warm_steps,
        "elapsed_s": elapsed,
        "compile_s": timers.acc.get("first_step_compile", 0.0),
        "steps_per_s": warm_steps / max(elapsed, 1e-12),
        "mcellups": cu_per_s / 1e6,
    }
    if not quiet:
        extra = (f" (+{n_compile} compiling step(s), "
                 f"{result['compile_s']:.3f} s, excluded)" if n_compile
                 else "")
        print(f"simulation_loop: {elapsed:.3f} s, {warm_steps} steps, "
              f"{result['mcellups']:.2f} Mcell-updates/s{extra}")
    return state, result


def _chain(mods, s, dt):
    for m in mods:
        s = m(s, dt)
    return s


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: community_benchmark <input.yaml>")
    config = load_config(argv[0])
    return run_benchmark(config)


if __name__ == "__main__":
    main()
