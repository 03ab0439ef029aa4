"""2-simulated-hour supercell_p3 stability run (the P3 analog of the
canonical 7200 s Kessler run in BASELINE.md): 128x128x64, dt_phys = 2 s,
3600 physics steps through the per-step driver, heartbeat every 120 s.

The reference's production sanity signal is exactly this maxw trajectory
(dynamics_euler_stratified_wenofv.h:186-196).  Usage:
    python scripts/p3_long_run.py [sim_time]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.experiments.driver import run_main_loop
from miniweatherml_tpu.experiments.supercell_p3 import build


def main():
    sim_time = float(sys.argv[1]) if len(sys.argv) > 1 else 7200.0
    cfg = config_from_dict(dict(
        sim_time=sim_time, nens=1, nx_glob=128, ny_glob=128, nz=64,
        xlen=51200.0, ylen=51200.0, zlen=12800.0,
        init_data="supercell", out_prefix="/tmp/p3long", dt_phys=2.0,
        out_freq=120.0))
    state, mods, dycore = build(cfg)
    state = run_main_loop(state, cfg, mods, dycore, writer=None)
    bad = state.validate()
    print("validate:", bad if bad else "{} (clean)")


if __name__ == "__main__":
    main()
