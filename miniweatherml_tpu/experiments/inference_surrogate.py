"""Supercell run with the MLP surrogate microphysics deployed inline.

TPU-native port of experiments/supercell_kessler_surrogate/
inference_ponni.cpp: identical to supercell_example, but the micro module is
the NN surrogate (custom_modules::Microphysics_Kessler in
microphysics_kessler_ponni.h).  YAML keys (reference
supercell_kessler_surrogate/inputs/input_euler3d.yaml:29-33):

  keras_weights_h5 / nn_weights : Keras HDF5 or .npz weight file
  nn_input_scaling              : 5x2 min-max table (text)
  nn_output_scaling             : 4x2 min-max table (text)
  surrogate_online              : bool (default false, matching the
                                  reference's commented-out override)
  surrogate_compare             : print mean NN-truth diffs per output
                                  interval (default true)

Usage: python -m miniweatherml_tpu.experiments.inference_surrogate <input.yaml>
"""

from __future__ import annotations

import sys

from ..config import SimConfig, load_config
from ..core.coupler import CouplerState
from ..dycore.euler import Dycore
from ..io.netcdf import StateWriter
from ..ml.mlp import load_keras_h5, load_mlp, load_scaling
from ..physics.column_nudging import ColumnNudger
from ..physics.kessler_surrogate import MicrophysicsKesslerSurrogate
from ..physics.perturb import perturb_temperature
from ..physics.sponge import sponge_layer
from .driver import Timers, run_main_loop, setup_state

__all__ = ["build", "main"]


def build(config: SimConfig, micro: MicrophysicsKesslerSurrogate | None = None):
    """Like supercell_example.build, with the surrogate micro
    (inference_ponni.cpp:44-49)."""
    if micro is None:
        ex = config.extras
        wpath = ex.get("keras_weights_h5") or ex.get("nn_weights")
        if wpath is None:
            raise ValueError(
                "inference_surrogate needs 'keras_weights_h5' (HDF5) or "
                "'nn_weights' (.npz) in the input YAML")
        model = (load_keras_h5(wpath) if str(wpath).endswith((".h5", ".hdf5"))
                 else load_mlp(wpath))
        scl_in = load_scaling(ex["nn_input_scaling"], 5)
        scl_out = load_scaling(ex["nn_output_scaling"], 4)
        micro = MicrophysicsKesslerSurrogate(
            model, scl_in, scl_out,
            online=bool(ex.get("surrogate_online", False)),
            compare=bool(ex.get("surrogate_compare", True)),
        )

    state = setup_state(config)
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


def main(argv=None, quiet: bool = False) -> CouplerState:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: inference_surrogate <input.yaml>")
    config = load_config(argv[0])
    state, mods, dycore = build(config)
    writer = StateWriter(config.out_prefix, state) if config.out_freq >= 0 else None

    def on_step(s, dt, etime):
        # Mean NN - Kessler diffs, printed every step like the reference
        # (microphysics_kessler_ponni.h:266-269).  The value fetch is a
        # device sync, which is fine: this driver is the comparison
        # harness, not the benchmark path.
        if not quiet:
            d = [float(x) for x in s["surrogate_diffs"]]
            print(f"Etime: {etime:10.6e}  mean diff NN - Kessler "
                  f"[temp, rho_v, rho_c, rho_r]: "
                  f"[{d[0]: .6e}, {d[1]: .6e}, {d[2]: .6e}, {d[3]: .6e}]",
                  flush=True)

    timers = Timers()
    timers.start("main")
    state = run_main_loop(state, config, mods, dycore, writer, timers,
                          on_step=on_step)
    timers.stop("main")
    if writer:
        writer.close()
    d = state["surrogate_diffs"]
    print("Mean diff (NN - Kessler) [temp, rho_v, rho_c, rho_r]:",
          [float(x) for x in d])
    print(timers.report())
    return state


if __name__ == "__main__":
    main()
