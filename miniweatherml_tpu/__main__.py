"""Top-level CLI: dispatch to the experiment drivers.

Usage:
  python -m miniweatherml_tpu <experiment> <input.yaml> [...]
  python -m miniweatherml_tpu --list

The reference builds one executable per experiment
(experiments/*/CMakeLists.txt); here they are subcommands.
"""

from __future__ import annotations

import sys

_EXPERIMENTS = {
    "supercell_example": "canonical supercell: WENO dycore + Kessler + "
                         "sponge + nudging (reference supercell_example)",
    "community_benchmark": "timed benchmark loop, output off "
                           "(reference community_benchmark)",
    "simple_city": "flow over immersed buildings + horizontal sponge + "
                   "time averager (reference simple_city)",
    "supercell_p3": "supercell with P3 ice microphysics (jax or native)",
    "gather_statistics": "measure the active-microphysics cell ratio",
    "generate_micro_data": "harvest stratified Kessler training pairs",
    "inference_surrogate": "run with the MLP surrogate micro inline",
}


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("--list", "-l", "--help", "-h"):
        print("usage: python -m miniweatherml_tpu <experiment> <input.yaml>")
        print("\nexperiments:")
        for name, desc in _EXPERIMENTS.items():
            print(f"  {name:<22s} {desc}")
        print("\noffline training: python -m miniweatherml_tpu.ml.train "
              "<dataset> [prefix]")
        raise SystemExit(0 if argv else 2)
    name = argv[0]
    if name not in _EXPERIMENTS:
        raise SystemExit(f"unknown experiment {name!r}; see --list")
    import importlib

    mod = importlib.import_module(f"miniweatherml_tpu.experiments.{name}")
    mod.main(argv[1:])


if __name__ == "__main__":
    main()
