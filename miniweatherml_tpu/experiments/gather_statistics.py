"""Measure the fraction of cells with active microphysics.

TPU-native port of experiments/supercell_kessler_surrogate/
gather_statistics.cpp: the supercell chain, but the coupler state is cloned
before the micro step and the StatisticsGatherer classifies which cells
changed (gather_statistics.cpp:53-94).

Usage: python -m miniweatherml_tpu.experiments.gather_statistics <input.yaml>
"""

from __future__ import annotations

import sys

from ..config import load_config
from ..ml.surrogate_data import StatisticsGatherer
from .driver import run_main_loop
from .supercell_example import build

__all__ = ["main", "run_gather_statistics"]


def run_gather_statistics(config, quiet: bool = False):
    state, mods, dycore = build(config)
    micro_step = mods[1]
    gatherer = StatisticsGatherer()
    etime_box = [0.0]

    def micro_with_stats(s, dt):
        before = s.clone()  # functional analog of coupler.clone_into(input)
        after = micro_step(s, dt)
        gatherer.gather(before, after, dt, etime_box[0])
        return after

    micro_with_stats._host_side = True  # accumulate on host each step

    def on_step(s, dt, etime):
        etime_box[0] = etime

    mods_wrapped = [mods[0], micro_with_stats] + mods[2:]
    state = run_main_loop(state, config, mods_wrapped, dycore, writer=None,
                          on_step=on_step, quiet=quiet, jit_chain=False)
    gatherer.finalize()
    return state, gatherer


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: gather_statistics <input.yaml>")
    return run_gather_statistics(load_config(argv[0]))


if __name__ == "__main__":
    main()
