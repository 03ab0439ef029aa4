"""Harvest stratified Kessler input/output training pairs during a supercell
run.

TPU-native port of experiments/supercell_kessler_surrogate/
generate_micro_data.cpp: the supercell chain, with the coupler state cloned
before the micro step and DataGenerator sampling (input, output) stencil
rows into the training dataset (generate_micro_data.cpp:59-92).

Usage: python -m miniweatherml_tpu.experiments.generate_micro_data <input.yaml>
"""

from __future__ import annotations

import sys

from ..config import load_config
from ..ml.surrogate_data import DataGenerator
from .driver import run_main_loop
from .supercell_example import build

__all__ = ["main", "run_generate_micro_data"]


def run_generate_micro_data(config, quiet: bool = False,
                            generator: DataGenerator | None = None):
    state, mods, dycore = build(config)
    micro_step = mods[1]
    gen = generator or DataGenerator()
    state = gen.init(state)
    etime_box = [0.0]

    def micro_with_datagen(s, dt):
        before = s.clone()  # reference coupler.clone_into(input)
        after = micro_step(s, dt)
        gen.generate_samples_stencil(before, after, dt, etime_box[0])
        return after

    micro_with_datagen._host_side = True

    def on_step(s, dt, etime):
        etime_box[0] = etime

    mods_wrapped = [mods[0], micro_with_datagen] + mods[2:]
    state = run_main_loop(state, config, mods_wrapped, dycore, writer=None,
                          on_step=on_step, quiet=quiet, jit_chain=False)
    path = gen.finalize()
    if not quiet:
        print(f"wrote {gen.num_samples} samples to {path}")
    return state, gen


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: generate_micro_data <input.yaml>")
    return run_generate_micro_data(load_config(argv[0]))


if __name__ == "__main__":
    main()
