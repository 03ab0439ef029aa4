"""Execute the shipped Jupyter notebooks end-to-end.

The reference ships its surrogate workflow as two first-class notebook
deliverables (experiments/supercell_kessler_surrogate/jupyter_notebooks/);
ours mirror them and must not rot silently as ml/ evolves, so this test
runs both via nbclient against the sample dataset shipped at the repo root.
"""

import os
import shutil

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SAMPLE = "supercell_kessler_data_task_0.nc"


@pytest.mark.slow
@pytest.mark.xslow
@pytest.mark.parametrize("nb", [
    "kessler_netcdf_to_numpy.ipynb",
    "kessler_singlecell_train_example.ipynb",
])
def test_notebook_executes(nb, tmp_path, monkeypatch):
    nbclient = pytest.importorskip("nbclient")
    nbformat = pytest.importorskip("nbformat")

    # Isolated working dir: the sample dataset next to the notebook, all
    # artifacts (curated .npz, exported weights) land in tmp, not the repo.
    shutil.copy(os.path.join(_REPO, "notebooks", nb), tmp_path / nb)
    shutil.copy(os.path.join(_REPO, _SAMPLE), tmp_path / _SAMPLE)
    # The kernel is a fresh interpreter: make the repo importable and pin
    # the CPU backend before the package initializes jax.
    monkeypatch.setenv("PYTHONPATH", _REPO)
    monkeypatch.setenv("MWML_PLATFORM", "cpu")
    monkeypatch.setenv("MWML_OUT_PREFIX", str(tmp_path / "nbtest"))

    doc = nbformat.read(str(tmp_path / nb), as_version=4)
    client = nbclient.NotebookClient(
        doc, timeout=600, kernel_name="python3",
        resources={"metadata": {"path": str(tmp_path)}})
    client.execute()  # raises CellExecutionError on any failing cell

    if "netcdf_to_numpy" in nb:
        assert (tmp_path / "kessler_dataset.npz").exists()
    else:
        assert (tmp_path / "nbtest_weights.npz").exists()
        assert (tmp_path / "nbtest_scl_in.txt").exists()
        assert (tmp_path / "nbtest_scl_out.txt").exists()
