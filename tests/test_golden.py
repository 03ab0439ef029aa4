"""Golden regression tests: pinned supercell maxw trajectory + in-jit
validation (SURVEY.md section 4's golden-test plan; the maxw heartbeat is
the reference's documented sanity signal, dynamics...h:186-196)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.core.validate import (check_flags, validation_flags,
                                             validated_step)
from miniweatherml_tpu.experiments.supercell_example import build

# 20-step maxw trajectory of the 50x1x20 supercell (f64, fused WENO path),
# generated 2026-08-16.  Any numerical regression in dycore/micro/sponge/
# nudging shifts these values.
_GOLDEN_MAXW = [
    1.106125805055e+00, 1.634622175361e+00, 1.667520656028e+00, 1.490860274119e+00,
    1.431534053862e+00, 1.387474566003e+00, 1.445988390994e+00, 1.389627241757e+00,
    1.407499381654e+00, 1.406564107093e+00, 1.377988802621e+00, 1.387971913991e+00,
    1.369914979386e+00, 1.423928330978e+00, 1.355478020591e+00, 1.422651793648e+00,
    1.384660689779e+00, 1.435301790244e+00, 1.436020112183e+00, 1.421765927379e+00,
]


def _build():
    cfg = config_from_dict(dict(
        sim_time=100.0, nens=1, nx_glob=50, ny_glob=1, nz=20,
        xlen=100000.0, ylen=100000.0, zlen=20000.0,
        init_data="supercell", out_prefix="g", dt_phys=0.0, out_freq=-1.0,
        dtype="float64"))
    return build(cfg)


def test_supercell_maxw_golden_trajectory():
    state, mods, dycore = _build()
    dt = dycore.compute_time_step(state)

    def step(s):
        for m in mods:
            s = m(s, dt)
        return s

    step = jax.jit(step)
    for i, expect in enumerate(_GOLDEN_MAXW):
        state = step(state)
        got = float(jnp.max(jnp.abs(state["wvel"])))
        assert got == pytest.approx(expect, rel=1e-6), f"step {i}"


def test_validation_flags_clean_and_dirty():
    state, mods, dycore = _build()
    flags = jax.jit(validation_flags)(state)
    assert check_flags(flags) == {}

    bad = state.replace_fields(
        temp=state["temp"].at[0, 0, 0, 0].set(jnp.nan),
        water_vapor=state["water_vapor"].at[0, 0, 0, 0].set(-1.0))
    flags = jax.jit(validation_flags)(bad)
    problems = check_flags(flags)
    assert problems["temp"] == "nan"
    assert "negative" in problems["water_vapor"]


def test_validated_step_wrapper():
    state, mods, dycore = _build()
    dt = dycore.compute_time_step(state)
    step = jax.jit(validated_step(lambda s: mods[0](s, dt)))
    out, flags = step(state)
    assert check_flags(flags) == {}
    assert float(jnp.max(out["temp"])) > 0
