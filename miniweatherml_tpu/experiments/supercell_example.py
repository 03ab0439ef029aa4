"""The canonical supercell experiment.

TPU-native port of experiments/supercell_example/driver.cpp: Kessler
microphysics + WENO dycore + top sponge + column nudging, seeded with a
deterministic thermal temperature perturbation.

Usage:  python -m miniweatherml_tpu.experiments.supercell_example <input.yaml>
"""

from __future__ import annotations

import sys

from ..config import SimConfig, load_config
from ..core.coupler import CouplerState
from ..dycore.euler import Dycore
from ..io.netcdf import StateWriter
from ..physics.column_nudging import ColumnNudger
from ..physics.kessler import MicrophysicsKessler
from ..physics.perturb import perturb_temperature
from ..physics.sponge import sponge_layer
from .driver import Timers, run_main_loop, setup_state

__all__ = ["build", "main"]


def build(config: SimConfig):
    """Initialize coupler + modules; returns (state, step_modules, dycore).

    Module order matches the reference main loop (driver.cpp:72-77):
    dycore -> micro -> sponge -> nudge.
    """
    state = setup_state(config)
    micro = MicrophysicsKessler()
    # dycore numerics configurable from YAML: dyn_order (the reference's
    # -DMW_ORD compile flag, dynamics...h:24-28), riemann_impl/fast_weights
    # (this framework's kernel backends).
    dycore = Dycore(
        ord=int(config.extras.get("dyn_order", 5)),
        riemann_impl=str(config.extras.get("riemann_impl", "auto")),
        fast_weights=(bool(config.extras["fast_weights"])
                      if "fast_weights" in config.extras else None))
    nudger = ColumnNudger()

    state = micro.init(state)          # driver.cpp:58
    state = dycore.init(state)         # driver.cpp:59
    state = nudger.set_column(state)   # driver.cpp:60
    state = perturb_temperature(state) # driver.cpp:61

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
        raise SystemExit("usage: supercell_example <input.yaml>")
    config = load_config(argv[0])
    state, mods, dycore = build(config)

    # Checkpoint/restart (capability the reference lacks -- SURVEY.md sec. 5):
    # YAML keys `restart_file` (resume from a .npz checkpoint) and
    # `checkpoint_freq` (write `<out_prefix>_chkpt.npz` every N sim-seconds).
    etime0 = 0.0
    if config.extras.get("restart_file"):
        from ..io.checkpoint import load_checkpoint
        state, etime0 = load_checkpoint(str(config.extras["restart_file"]))
        print(f"restarted from {config.extras['restart_file']} at "
              f"etime={etime0:g}")
    chk_freq = float(config.extras.get("checkpoint_freq", -1.0))

    if config.out_freq >= 0:
        # file_per_process (reference simple_city/driver.cpp:38) -> one
        # NetCDF per (y, x) shard instead of a single gathered file.
        if config.file_per_process:
            from ..io.netcdf import ShardedStateWriter
            writer = ShardedStateWriter(config.out_prefix, state)
        else:
            writer = StateWriter(config.out_prefix, state)
    else:
        writer = None
    timers = Timers()
    timers.start("main")
    state = run_main_loop(state, config, mods, dycore, writer, timers,
                          etime0=etime0, checkpoint_freq=chk_freq,
                          checkpoint_path=config.out_prefix + "_chkpt.npz",
                          validate=bool(config.extras.get("validate", False)))
    timers.stop("main")
    if writer:
        writer.close()
    print(timers.report())
    return state


if __name__ == "__main__":
    main()
