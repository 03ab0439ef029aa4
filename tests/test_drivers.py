"""End-to-end driver coverage for the experiment entry points that the
other test modules don't exercise: the P3 supercell chain
(reference microphysics_p3.h swapped into the supercell driver pattern),
the community_benchmark timing harness
(reference experiments/community_benchmark/driver.cpp:66-82), and the
repo-root bench.py JSON contract.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from miniweatherml_tpu.config import config_from_dict

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny(nx=24, ny=1, nz=16, sim_time=4.0, **kw):
    d = dict(
        sim_time=sim_time, nens=1, nx_glob=nx, ny_glob=ny, nz=nz,
        xlen=nx * 1000.0, ylen=max(ny, 1) * 1000.0, zlen=20000.0,
        init_data="supercell", out_prefix="drv", dt_phys=0.0, out_freq=-1.0,
    )
    d.update(kw)
    return config_from_dict(d)


@pytest.mark.xslow
def test_supercell_p3_driver_end_to_end(capsys):
    """The supercell_p3 chain (dycore + P3 + sponge + nudger) runs the main
    loop, prints the reference heartbeat, and ends with finite fields and
    all 9 P3 tracers registered."""
    from miniweatherml_tpu.experiments.driver import run_main_loop
    from miniweatherml_tpu.experiments.supercell_p3 import build

    cfg = _tiny(sim_time=3.0, out_freq=1.0)  # heartbeat fires per interval
    state, mods, dycore = build(cfg)
    assert len(state.meta.tracer_names) == 9  # microphysics_p3.h:108-116
    out = run_main_loop(state, cfg, mods, dycore)
    assert out.validate() == {}
    assert "maxw" in capsys.readouterr().out


@pytest.mark.xslow
def test_community_benchmark_driver(capsys):
    """run_benchmark times the loop and reports positive throughput in the
    reference's simulation_loop framing."""
    from miniweatherml_tpu.experiments.community_benchmark import run_benchmark

    state, result = run_benchmark(_tiny(sim_time=3.0))
    assert result["steps"] > 0
    assert result["mcellups"] > 0
    assert "simulation_loop" in capsys.readouterr().out
    assert state.validate() == {}


def _run_bench(env_extra):
    env = dict(os.environ)
    env.update(
        MWML_BENCH_CPU="1", MWML_BENCH_NX="24", MWML_BENCH_NY="4",
        MWML_BENCH_NZ="16", MWML_BENCH_STEPS="2", MWML_BENCH_INNER="1",
        MWML_BENCH_PALLAS="0",
    )
    env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=_REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


@pytest.mark.xslow
def test_bench_json_contract():
    """bench.py prints exactly one JSON line with the driver-required keys
    and exits 0 (the round-2 rc-134 regression)."""
    payload = _run_bench({})
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["unit"] == "Mcellups"
    assert payload["value"] > 0
    # both fields round to 3 decimals in the JSON line
    assert payload["vs_baseline"] == pytest.approx(
        payload["value"] / 10.0, abs=5.1e-4)


@pytest.mark.xslow
def test_bench_p3_micro_mode():
    """MWML_BENCH_MICRO=p3 swaps the Kessler module for the P3 ice scheme
    in the benched chain."""
    payload = _run_bench({"MWML_BENCH_MICRO": "p3"})
    assert payload["value"] > 0
    assert "p3" in payload["metric"]


def test_driver_scan_wrapper_matches_flat(monkeypatch):
    """The length-1 lax.scan wrapper around the driver's jitted step
    (bench.py's fused-loop structure; changes XLA buffer assignment at
    HBM-limit grids) is numerically identical to the flat step."""
    import numpy as np

    from miniweatherml_tpu.experiments.supercell_example import build
    from miniweatherml_tpu.experiments.driver import run_main_loop

    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("MWML_DRIVER_SCAN", mode)
        cfg = _tiny(sim_time=2.0)
        state, mods, dycore = build(cfg)
        outs[mode] = run_main_loop(state, cfg, mods, dycore, writer=None,
                                   quiet=True)
    for k in ("temp", "wvel", "water_vapor"):
        np.testing.assert_array_equal(np.asarray(outs["1"][k]),
                                      np.asarray(outs["0"][k]))
