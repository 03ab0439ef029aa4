"""YAML configuration matching the reference's input files.

Recognized keys (reference experiments/*/driver.cpp:23-38 and inputs/*.yaml):
sim_time, nens, nx_glob, ny_glob, nz, xlen, ylen, zlen, dt_phys, init_data,
out_prefix, out_freq, plus optional enable_gravity, file_per_process,
keras_weights_h5, nn_input_scaling, nn_output_scaling.  Extra keys are kept
verbatim in ``extras``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import yaml

from .core.coupler import Grid

__all__ = ["SimConfig", "load_config"]


@dataclasses.dataclass
class SimConfig:
    sim_time: float
    grid: Grid
    dt_phys: float = 0.0
    init_data: str = "supercell"
    out_prefix: str = "test"
    out_freq: float = -1.0
    dtype: str = "float32"
    enable_gravity: bool = True
    file_per_process: bool = False
    extras: dict[str, Any] = dataclasses.field(default_factory=dict)
    config_path: str = ""  # the reference's "standalone_input_file" option


_KNOWN = {
    "sim_time", "nens", "nx_glob", "ny_glob", "nz", "xlen", "ylen", "zlen",
    "dt_phys", "init_data", "out_prefix", "out_freq", "enable_gravity",
    "file_per_process", "dtype", "precision",
}


def load_config(path: str) -> SimConfig:
    with open(path) as f:
        raw = yaml.safe_load(f)
    if not isinstance(raw, dict):
        raise ValueError(f"invalid YAML input file {path!r}")
    return config_from_dict(raw, path)


def config_from_dict(raw: dict[str, Any], path: str = "") -> SimConfig:
    grid = Grid(
        nx=int(raw["nx_glob"]),
        ny=int(raw["ny_glob"]),
        nz=int(raw["nz"]),
        nens=int(raw.get("nens", 1)),
        xlen=float(raw["xlen"]),
        ylen=float(raw["ylen"]),
        zlen=float(raw["zlen"]),
    )
    dtype = str(raw.get("dtype", raw.get("precision", "float32")))
    dtype = {"f32": "float32", "f64": "float64"}.get(dtype, dtype)
    return SimConfig(
        sim_time=float(raw["sim_time"]),
        grid=grid,
        dt_phys=float(raw.get("dt_phys", 0.0)),
        init_data=str(raw.get("init_data", "supercell")),
        out_prefix=str(raw.get("out_prefix", "test")),
        out_freq=float(raw.get("out_freq", -1.0)),
        dtype=dtype,
        enable_gravity=bool(raw.get("enable_gravity", True)),
        file_per_process=bool(raw.get("file_per_process", False)),
        extras={k: v for k, v in raw.items() if k not in _KNOWN},
        config_path=path,
    )
