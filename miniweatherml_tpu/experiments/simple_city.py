"""Dycore-only flow over immersed buildings (city / building test cases).

TPU-native port of experiments/simple_city/driver.cpp: WENO dycore with
immersed boundaries + west/east horizontal sponge + top sponge (time scale
1 s) + running time averager; a manually-added water_vapor tracer and
optional gravity (driver.cpp:37-38,55-56,72-77).

Usage:  python -m miniweatherml_tpu.experiments.simple_city <input.yaml>
"""

from __future__ import annotations

import sys

from ..config import SimConfig, load_config
from ..core.coupler import CouplerState
from ..dycore.euler import Dycore
from ..io.netcdf import StateWriter
from ..physics.horizontal_sponge import HorizontalSponge
from ..physics.sponge import sponge_layer
from ..physics.time_averager import TimeAverager
from .driver import Timers, run_main_loop, setup_state

__all__ = ["build", "main"]


def build(config: SimConfig):
    """Initialize coupler + modules; returns (state, step_modules, dycore,
    time_averager).  Module order matches driver.cpp:70-77."""
    state = setup_state(config)
    dycore = Dycore(
        ord=int(config.extras.get("dyn_order", 5)),
        riemann_impl=str(config.extras.get("riemann_impl", "auto")),
        fast_weights=(bool(config.extras["fast_weights"])
                      if "fast_weights" in config.extras else None))
    horiz_sponge = HorizontalSponge(sponge_cells=10, time_scale=1.0)
    time_averager = TimeAverager()

    # driver.cpp:55-56: water_vapor added manually (no microphysics module).
    state = state.add_tracer("water_vapor", "water_vapor", True, True)
    state = dycore.init(state)
    state = horiz_sponge.init(state)       # driver.cpp:72
    state = time_averager.init(state)

    step_modules = [
        # x-walls only (driver.cpp:74: apply(coupler, dt, true, true, false, false))
        lambda s, dt: horiz_sponge.apply(s, dt, x1=True, x2=True, y1=False, y2=False),
        dycore.time_step,
        lambda s, dt: sponge_layer(s, dt, time_scale=1.0),
        time_averager.accumulate,
    ]
    return state, step_modules, dycore, time_averager


def main(argv=None) -> CouplerState:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: simple_city <input.yaml>")
    config = load_config(argv[0])
    state, mods, dycore, time_averager = build(config)
    if config.out_freq >= 0:
        if config.file_per_process:
            from ..io.netcdf import ShardedStateWriter
            writer = ShardedStateWriter(config.out_prefix, state)
        else:
            writer = StateWriter(config.out_prefix, state)
    else:
        writer = None
    timers = Timers()
    timers.start("main")
    state = run_main_loop(state, config, mods, dycore, writer, timers)
    timers.stop("main")
    if writer:
        writer.close()
    path = time_averager.finalize(state)
    print(f"wrote {path}")
    print(timers.report())
    return state


if __name__ == "__main__":
    main()
