"""ML surrogate workflow tests: MLP runtime, activity stats, stratified data
generation, training, and inline surrogate deployment (reference
experiments/supercell_kessler_surrogate/)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.ml.mlp import (MLP, init_mlp, leaky_relu, load_mlp,
                                      load_scaling, save_mlp, save_scaling)
from miniweatherml_tpu.ml.surrogate_data import (DataGenerator,
                                                 StatisticsGatherer,
                                                 is_active_mask, load_dataset)
from miniweatherml_tpu.ml.train import (denormalize, minmax_table, normalize,
                                        train_mlp)
from miniweatherml_tpu.physics.kessler_surrogate import (
    MicrophysicsKesslerSurrogate)

_REF_EXAMPLES = ("/root/reference/experiments/supercell_kessler_surrogate/"
                 "inputs/examples")


def _config(**kw):
    d = dict(
        sim_time=10.0, nens=1, nx_glob=50, ny_glob=1, nz=20,
        xlen=100000.0, ylen=100000.0, zlen=20000.0,
        init_data="supercell", out_prefix="t", dt_phys=0.0, out_freq=-1.0,
    )
    d.update(kw)
    return config_from_dict(d)


def test_mlp_forward_and_roundtrip(tmp_path):
    model = init_mlp((5, 10, 4), jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 5))
    y = model(x)
    assert y.shape == (7, 4)
    # save/load roundtrip
    p = str(tmp_path / "w.npz")
    save_mlp(p, model)
    model2 = load_mlp(p)
    np.testing.assert_allclose(np.asarray(model2(x)), np.asarray(y), rtol=1e-6)
    # leaky relu slope
    assert float(leaky_relu(jnp.float32(-2.0))) == pytest.approx(-0.2)


@pytest.mark.skipif(not os.path.isdir(_REF_EXAMPLES),
                    reason="reference example assets not mounted")
def test_keras_h5_and_scaling_parity():
    """Load the reference's exported Keras weights + scaling tables (data
    assets, not code) and verify the ponni-equivalent forward runs."""
    from miniweatherml_tpu.ml.mlp import load_keras_h5

    model = load_keras_h5(os.path.join(
        _REF_EXAMPLES, "supercell_kessler_singlecell_model_weights.h5"))
    assert model.weights[0][0].shape == (5, 10)
    assert model.weights[1][0].shape == (10, 4)
    scl_in = load_scaling(os.path.join(
        _REF_EXAMPLES, "supercell_kessler_stencil_input_scaling.txt"), 5)
    scl_out = load_scaling(os.path.join(
        _REF_EXAMPLES, "supercell_kessler_stencil_output_scaling.txt"), 4)
    assert scl_in.shape == (5, 2) and scl_out.shape == (4, 2)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (11, 5)), jnp.float32)
    y = model(x)
    assert y.shape == (11, 4) and bool(jnp.isfinite(y).all())


def test_is_active_mask():
    from miniweatherml_tpu.experiments.supercell_example import build
    state, mods, dycore = build(_config())
    assert not bool(is_active_mask(state, state).any())
    bumped = state.replace_fields(temp=state["temp"].at[0, 0, 0, 0].add(1.0))
    mask = np.asarray(is_active_mask(state, bumped))
    assert mask.sum() == 1 and mask[0, 0, 0, 0]


@pytest.mark.slow
@pytest.mark.xslow
def test_workflow_end_to_end(tmp_path):
    """Harvest -> train -> deploy: the full surrogate loop of SURVEY.md
    section 2.5 on a tiny supercell."""
    from miniweatherml_tpu.experiments.generate_micro_data import (
        run_generate_micro_data)

    os.chdir(tmp_path)
    cfg = _config(sim_time=6.0)
    gen = DataGenerator(fname=str(tmp_path / "data.nc"),
                        samples_per_step=400.0)
    state, gen = run_generate_micro_data(cfg, quiet=True, generator=gen)
    assert gen.num_samples > 100
    path = gen.finalize()

    inputs, outputs, meta = load_dataset(path)
    assert inputs.shape[1:] == (5, 2) and outputs.shape[1:] == (4,)
    assert meta["dz"] == pytest.approx(1000.0)

    model, scl_in, scl_out, hist = train_mlp(
        inputs, outputs, epochs=3, batch=256, verbose=False)
    assert hist[-1]["loss"] < hist[0]["loss"] * 1.5  # training not diverging

    # Deploy online for one step: state stays finite and tracers >= 0.
    from miniweatherml_tpu.experiments.inference_surrogate import build
    micro = MicrophysicsKesslerSurrogate(model, scl_in, scl_out,
                                         online=True, compare=True)
    st, mods, dycore = build(cfg, micro=micro)
    dt = dycore.compute_time_step(st)
    step = jax.jit(lambda s: mods[0](mods[1](s, dt), dt))
    st = step(st)
    assert st.validate() == {}
    diffs = np.asarray(st["surrogate_diffs"])
    assert np.isfinite(diffs).all()


def test_inference_driver_prints_diffs(tmp_path, capsys):
    """A compare-mode inference_surrogate run surfaces the per-step mean
    NN - Kessler diffs (reference microphysics_kessler_ponni.h:266-269
    prints them every step)."""
    import yaml

    from miniweatherml_tpu.experiments.inference_surrogate import main

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ex = os.path.join(repo, "inputs", "examples")
    cfg = dict(
        sim_time=3.0, nens=1, nx_glob=50, ny_glob=1, nz=20,
        xlen=100000.0, ylen=100000.0, zlen=20000.0,
        init_data="supercell", out_prefix=str(tmp_path / "s"),
        dt_phys=0.0, out_freq=-1.0,
        keras_weights_h5=os.path.join(
            ex, "supercell_kessler_singlecell_model_weights.h5"),
        nn_input_scaling=os.path.join(
            ex, "supercell_kessler_input_scaling.txt"),
        nn_output_scaling=os.path.join(
            ex, "supercell_kessler_output_scaling.txt"),
        surrogate_compare=True,
    )
    path = tmp_path / "in.yaml"
    path.write_text(yaml.safe_dump(cfg))
    main([str(path)])
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if "mean diff NN - Kessler" in ln]
    assert lines, "per-step diff lines missing from driver output"
    # The shipped example surrogate is not exact: at least one printed diff
    # must be nonzero (a dead reporting path would print all zeros).
    import re
    vals = [float(v) for ln in lines
            for v in re.findall(r"-?\d+\.\d+e[+-]\d+", ln)]
    assert any(v != 0.0 for v in vals)


@pytest.mark.slow
def test_stats_gatherer_ratio():
    from miniweatherml_tpu.experiments.gather_statistics import (
        run_gather_statistics)
    cfg = _config(sim_time=4.0)
    state, gatherer = run_gather_statistics(cfg, quiet=True)
    assert 0.0 <= gatherer.ratio_active <= 1.0
    assert gatherer.denom > 0


def test_minmax_normalize_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.uniform(-3, 7, (100, 5)).astype(np.float32)
    t = minmax_table(x)
    xn = normalize(jnp.asarray(x), t)
    assert float(xn.min()) >= -1e-6 and float(xn.max()) <= 1 + 1e-6
    back = denormalize(xn, t)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-5, atol=1e-5)


def test_shipped_example_surrogate_assets():
    """The shipped example model (inputs/examples/, trained by ml.train on
    generate_micro_data output, mirroring the reference's
    inputs/examples/supercell_kessler_singlecell_model_weights.h5) loads
    through the Keras-H5 path and approximates Kessler closely on a fresh
    supercell profile (mean temp diff ~1e-2 K when run online)."""
    import os

    from miniweatherml_tpu.ml.mlp import load_keras_h5, load_mlp, load_scaling

    root = os.path.join(os.path.dirname(__file__), "..")
    h5 = os.path.join(root, "inputs", "examples",
                      "supercell_kessler_singlecell_model_weights.h5")
    npz = os.path.join(root, "inputs", "examples",
                       "supercell_kessler_example_weights.npz")
    m_h5 = load_keras_h5(h5)
    m_npz = load_mlp(npz)
    x = jnp.linspace(0.1, 0.9, 5)[None, :]
    np.testing.assert_allclose(np.asarray(m_h5(x)), np.asarray(m_npz(x)),
                               rtol=1e-6, atol=1e-7)
    scl_in = load_scaling(os.path.join(root, "inputs", "examples",
                                       "supercell_kessler_input_scaling.txt"), 5)
    scl_out = load_scaling(os.path.join(root, "inputs", "examples",
                                        "supercell_kessler_output_scaling.txt"), 4)
    assert scl_in.shape == (5, 2) and scl_out.shape == (4, 2)
    assert (np.asarray(scl_in[:, 1] - scl_in[:, 0]) > 0).all()
