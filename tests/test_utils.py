"""Profiling utilities and checkpoint/restart integration tests."""

import os

import numpy as np
import pytest

from miniweatherml_tpu.utils.profiling import (annotate, reset_timers, timer,
                                               timer_report)


def test_timer_accumulates_and_reports():
    reset_timers()
    import jax.numpy as jnp
    with timer("section_a"):
        x = jnp.ones((64, 64)) * 2.0
    with timer("section_a", sync_result=x):
        x = x + 1.0
    rep = timer_report()
    assert "section_a" in rep
    assert " 2 " in rep or "       2" in rep  # two calls accumulated


def test_annotate_runs():
    import jax.numpy as jnp
    with annotate("weno_recon"):
        y = jnp.zeros(8) + 1.0
    assert float(y.sum()) == 8.0


@pytest.mark.slow
def test_checkpoint_restart_resumes_identically(tmp_path):
    """Run 4 steps; checkpoint at 2; restart from the checkpoint and verify
    the resumed trajectory matches the uninterrupted one."""
    import jax
    from miniweatherml_tpu.config import config_from_dict
    from miniweatherml_tpu.experiments.supercell_example import build
    from miniweatherml_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    cfg = config_from_dict(dict(
        sim_time=10.0, nens=1, nx_glob=32, ny_glob=1, nz=16,
        xlen=100000.0, ylen=100000.0, zlen=20000.0,
        init_data="supercell", out_prefix=str(tmp_path / "t"),
        dt_phys=0.0, out_freq=-1.0))
    state, mods, dycore = build(cfg)
    dt = dycore.compute_time_step(state)
    step = jax.jit(lambda s: mods[1](mods[0](s, dt), dt))

    s = state
    for i in range(2):
        s = step(s)
    ck = str(tmp_path / "chk.npz")
    save_checkpoint(ck, s, etime=2 * dt)
    for i in range(2):
        s = step(s)

    s2, etime = load_checkpoint(ck)
    assert etime == 2 * dt
    assert s2.meta.tracer_names == state.meta.tracer_names
    for i in range(2):
        s2 = step(s2)
    for name in ("temp", "wvel", "water_vapor"):
        np.testing.assert_allclose(np.asarray(s2[name]), np.asarray(s[name]),
                                   rtol=1e-6, atol=1e-8, err_msg=name)


def test_reference_input_files_parse_verbatim():
    """Every input YAML shipped by the reference parses through our config
    loader with the same semantic fields (drivers read the same key set,
    reference experiments/*/driver.cpp:23-38; extra keys like dt_gcm are
    tolerated exactly as the reference's yaml-cpp usage tolerates ours)."""
    import glob

    from miniweatherml_tpu.config import load_config

    ref = "/root/reference/experiments"
    paths = sorted(glob.glob(ref + "/*/inputs/*.yaml"))
    if not paths:
        import pytest
        pytest.skip("reference checkout not present")
    assert len(paths) >= 8
    for p in paths:
        cfg = load_config(p)
        assert cfg.grid.nx > 0 and cfg.grid.nz > 0, p
        assert cfg.init_data == "supercell" or cfg.init_data in (
            "city", "building", "thermal"), p
        assert cfg.sim_time > 0, p
