"""Supercell with P3 ice microphysics.

The reference ships Microphysics_P3 as a drop-in micro module for the same
driver chain (model/modules/microphysics_p3.h; the supercell driver pattern
of experiments/supercell_example/driver.cpp with micro swapped).  YAML key
``p3_backend: jax|native`` selects the TPU-resident scheme or the C++
native twin.

Usage:  python -m miniweatherml_tpu.experiments.supercell_p3 <input.yaml>
"""

from __future__ import annotations

import sys

from ..config import SimConfig, load_config
from ..core.coupler import CouplerState
from ..dycore.euler import Dycore
from ..io.netcdf import StateWriter
from ..physics.column_nudging import ColumnNudger
from ..physics.p3 import MicrophysicsP3
from ..physics.perturb import perturb_temperature
from ..physics.sponge import sponge_layer
from .driver import Timers, run_main_loop, setup_state

__all__ = ["build", "main"]


def build(config: SimConfig):
    state = setup_state(config)
    micro = MicrophysicsP3(
        backend=str(config.extras.get("p3_backend", "jax")),
        # YAML `p3_diagnostics: true` registers + fills part3's diagnostic
        # fields (eff radii, reflectivity, ...) each step -- a strict
        # superset of the reference wrapper, which discards them
        diagnostics=bool(config.extras.get("p3_diagnostics", False)))
    dycore = Dycore()
    nudger = ColumnNudger()

    state = micro.init(state)
    state = dycore.init(state)
    state = nudger.set_column(state)
    state = perturb_temperature(state)

    step_modules = [
        dycore.time_step,
        micro.time_step,
        lambda s, dt: sponge_layer(s, dt),
        nudger.nudge_to_column,
    ]
    return state, step_modules, dycore


def main(argv=None) -> CouplerState:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: supercell_p3 <input.yaml>")
    config = load_config(argv[0])
    state, mods, dycore = build(config)
    diag = (MicrophysicsP3.DIAG_FIELDS
            if config.extras.get("p3_diagnostics", False) else ())
    writer = (StateWriter(config.out_prefix, state, extra_vars=diag)
              if config.out_freq >= 0 else None)
    timers = Timers()
    timers.start("main")
    state = run_main_loop(state, config, mods, dycore, writer, timers)
    timers.stop("main")
    if writer:
        writer.close()
    print(timers.report())
    return state


if __name__ == "__main__":
    main()
