"""Core coupler API tests (reference model/core/: DataManager, Options,
MultipleFields semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from miniweatherml_tpu.core.coupler import Grid, Options, make_coupler_state


def _state():
    g = Grid(nx=4, ny=3, nz=2, nens=1)
    st = make_coupler_state(g)
    st = st.add_tracer("water_vapor")
    st = st.register_field("temp")
    return st


def test_options_are_immutable_and_hashable():
    o = Options({"a": 1})
    o2 = o.set(b=2.5)
    assert o.get("b") is None and o2["b"] == 2.5
    assert o2.setdefaults(a=99)["a"] == 1
    assert o2.delete("a").get("a") is None
    assert hash(o2) == hash(Options({"a": 1, "b": 2.5}))


def test_dirty_field_tracking():
    st = _state().clear_dirty()
    assert st.dirty_fields == frozenset()
    st2 = st.replace_fields(temp=st["temp"] + 1.0)
    assert st2.dirty_fields == {"temp"}
    st3 = st2.replace_fields(water_vapor=st2["water_vapor"])
    assert st3.dirty_fields == {"temp", "water_vapor"}
    assert st3.clear_dirty().dirty_fields == frozenset()


def test_get_lev_col_layout():
    st = _state()
    g = st.grid
    vals = jnp.arange(g.nens * g.nz * g.ny * g.nx, dtype=jnp.float32).reshape(
        g.field_shape)
    st = st.replace_fields(temp=vals)
    lc = st.get_lev_col("temp")
    assert lc.shape == (g.nz, g.nens * g.ny * g.nx)
    # column (e=0, j=1, i=2) must be vertically contiguous in lc
    np.testing.assert_array_equal(
        np.asarray(lc[:, 1 * g.nx + 2]), np.asarray(vals[0, :, 1, 2]))
    assert st.get_collapsed("temp").shape == (g.nens * g.nz * g.ny * g.nx,)


def test_duplicate_registration_rejected():
    st = _state()
    with pytest.raises(ValueError):
        st.register_field("temp")
    with pytest.raises(ValueError):
        st.add_tracer("water_vapor")


def test_tracer_stack_roundtrip():
    st = _state().add_tracer("cloud_liquid")
    tr = st.tracer_stack()
    assert tr.shape[0] == 2
    st2 = st.with_tracer_stack(tr + 1.0)
    np.testing.assert_allclose(np.asarray(st2["water_vapor"]),
                               np.asarray(st["water_vapor"]) + 1.0)
