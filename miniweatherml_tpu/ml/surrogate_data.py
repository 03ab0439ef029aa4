"""Surrogate training-data harvesting: activity statistics + stratified
sample generation.

TPU-native re-design of the reference's StatisticsGatherer
(experiments/supercell_kessler_surrogate/custom_modules/
gather_micro_statistics.h) and DataGenerator
(custom_modules/generate_micro_surrogate_data.h).

Design: classification + stratified thresholding run on device inside jit
(one fused kernel over the grid, jax.random counter PRNG replacing
yakl::Random); only the selected sample rows are gathered to host and
appended to the dataset file.  Where the reference writes one NetCDF row at
a time per rank (generate_micro_surrogate_data.h:128-151), we buffer rows
and flush once at finalize -- same schema, orders of magnitude fewer small
writes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.coupler import CouplerState

__all__ = ["is_active_mask", "StatisticsGatherer", "DataGenerator",
           "load_dataset"]

_TOL = 1.0e-10  # activity tolerance (gather_micro_statistics.h:62)


def is_active_mask(before: CouplerState, after: CouplerState) -> jnp.ndarray:
    """Cells where microphysics changed T / rho_v / rho_c / rho_p by more
    than 1e-10 (gather_micro_statistics.h:61-73).  Shape (nens,nz,ny,nx)."""
    act = jnp.zeros(before["temp"].shape, bool)
    for name in ("temp", "water_vapor", "cloud_liquid", "precip_liquid"):
        act = act | (jnp.abs(after[name] - before[name]) > _TOL)
    return act


class StatisticsGatherer:
    """Accumulates the active-cell ratio; prints every 200 s of sim time
    (gather_micro_statistics.h:54,76-84)."""

    def __init__(self):
        self.numer = 0.0
        self.denom = 0.0
        self.num_out = 0

    def gather(self, before: CouplerState, after: CouplerState,
               dt: float, etime: float) -> None:
        act = is_active_mask(before, after)
        if etime > (self.num_out + 1) * 200.0:
            self.print_ratio()
            self.num_out += 1
        self.numer += float(jnp.sum(act))
        self.denom += float(act.size)

    @property
    def ratio_active(self) -> float:
        return self.numer / max(self.denom, 1.0)

    def print_ratio(self) -> None:
        print(f"*** Ratio Active ***:  {self.ratio_active:10.6e}")

    def finalize(self) -> None:
        self.print_ratio()


@partial(jax.jit, static_argnames=("ratio_active", "samples_per_step",
                                   "desired_ratio_active"))
def _select_samples(active, seed,
                    ratio_active: float = 0.4,
                    samples_per_step: float = 50.0,
                    desired_ratio_active: float = 0.5):
    """Stratified per-cell Bernoulli selection
    (generate_micro_surrogate_data.h:47-98): active cells are sampled with
    probability p_a = (r_des*S)/(r_act*N), inactive with
    p_i = ((1-r_des)*S)/((1-r_act)*N)."""
    n = active.size
    p_active = desired_ratio_active * samples_per_step / (ratio_active * n)
    p_inactive = (1.0 - desired_ratio_active) * samples_per_step / (
        (1.0 - ratio_active) * n)
    u = jax.random.uniform(jax.random.PRNGKey(seed), active.shape)
    thresh = jnp.where(active, p_active, p_inactive)
    return u < thresh


class DataGenerator:
    """Harvests (input, output) pairs around the microphysics call into the
    reference's dataset schema: float32 ``inputs`` (nsamples, 5, 2) --
    column 0 = [T, rho_d, rho_v, rho_c, rho_p] at cell k, column 1 =
    [T, rho_v, rho_c, rho_p, 0] at cell min(k+1, nz-1) (the reference packs
    the second stencil cell skipping the rho_d row,
    generate_micro_surrogate_data.h:131-140) -- and ``outputs``
    (nsamples, 4) = [T, rho_v, rho_c, rho_p] after microphysics."""

    VARS_IN = ("temp", "density_dry", "water_vapor", "cloud_liquid",
               "precip_liquid")
    VARS_OUT = ("temp", "water_vapor", "cloud_liquid", "precip_liquid")

    def __init__(self, fname: str = "supercell_kessler_data_task_0.nc",
                 ratio_active: float = 0.4, samples_per_step: float = 50.0,
                 seed: int = 0):
        self.fname = fname
        self.ratio_active = ratio_active
        self.samples_per_step = samples_per_step
        self.seed = seed
        self._step = 0
        self._inputs: list[np.ndarray] = []
        self._outputs: list[np.ndarray] = []
        self.meta: dict[str, float] = {}

    def init(self, state: CouplerState) -> CouplerState:
        """Write the metadata sidecar (generate_micro_surrogate_data.h:25-30)."""
        with open("supercell_kessler_metadata.txt", "w") as f:
            f.write("This dataset contains data for training a surrogate "
                    "model to emulate Kessler microphysics.\n\n")
            f.write("vars_in : temperature, dry air density, water vapor "
                    "density, cloud liquid density, precipitation density\n")
            f.write("vars_out: temperature, water vapor density, cloud "
                    "liquid density, precipitation density\n")
        return state

    def generate_samples_stencil(self, before: CouplerState,
                                 after: CouplerState, dt: float,
                                 etime: float) -> int:
        """Select cells (stratified, on device), gather their stencil rows to
        host, buffer for the dataset.  Returns number of samples taken."""
        g = before.grid
        if not self.meta:
            self.meta = dict(
                time_step_size=dt,
                only_two_dimensions=0 if g.ny == 1 else 1,
                dx=g.dx, dy=g.dy, dz=g.dz,
                xlen=g.xlen, ylen=g.ylen, zlen=g.zlen,
            )
        active = is_active_mask(before, after)
        mask = _select_samples(
            active, self.seed + self._step,
            ratio_active=self.ratio_active,
            samples_per_step=self.samples_per_step)
        self._step += 1

        idx = np.argwhere(np.asarray(mask))  # (ns, 4): (e, k, j, i)
        if idx.shape[0] == 0:
            return 0
        e, k, j, i = idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]
        kp = np.minimum(k + 1, g.nz - 1)

        def host(name, st):
            return np.asarray(st[name])

        ns = idx.shape[0]
        row_in = np.zeros((ns, 5, 2), np.float32)
        for v, name in enumerate(self.VARS_IN):
            row_in[:, v, 0] = host(name, before)[e, k, j, i]
        for v, name in enumerate(self.VARS_OUT):  # col 1 skips rho_d
            row_in[:, v, 1] = host(name, before)[e, kp, j, i]
        row_out = np.zeros((ns, 4), np.float32)
        for v, name in enumerate(self.VARS_OUT):
            row_out[:, v] = host(name, after)[e, k, j, i]

        self._inputs.append(row_in)
        self._outputs.append(row_out)
        return ns

    @property
    def num_samples(self) -> int:
        return sum(a.shape[0] for a in self._inputs)

    def finalize(self) -> str:
        """Flush the buffered samples to NetCDF with the reference's schema
        (dims nsamples/num_vars_in/sten_size/num_vars_out + grid scalars);
        falls back to .npz without scipy."""
        inputs = (np.concatenate(self._inputs) if self._inputs
                  else np.zeros((0, 5, 2), np.float32))
        outputs = (np.concatenate(self._outputs) if self._outputs
                   else np.zeros((0, 4), np.float32))
        try:
            from scipy.io import netcdf_file
        except Exception:  # pragma: no cover
            path = self.fname.rsplit(".", 1)[0] + ".npz"
            np.savez(path, inputs=inputs, outputs=outputs, **self.meta)
            return path
        nc = netcdf_file(self.fname, "w")
        nc.createDimension("nsamples", None)
        nc.createDimension("num_vars_in", 5)
        nc.createDimension("sten_size", 2)
        nc.createDimension("num_vars_out", 4)
        nc.createDimension("scalar", 1)
        vi = nc.createVariable("inputs", "f", ("nsamples", "num_vars_in", "sten_size"))
        vi[:] = inputs
        vo = nc.createVariable("outputs", "f", ("nsamples", "num_vars_out"))
        vo[:] = outputs
        for name, val in self.meta.items():
            v = nc.createVariable(name, "d", ("scalar",))
            v[:] = float(val)
        nc.close()
        return self.fname


def load_dataset(path: str):
    """Read a generated dataset (.nc or .npz) -> (inputs (N,5,2) float32,
    outputs (N,4) float32, meta dict)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            meta = {k: float(z[k]) for k in z.files
                    if k not in ("inputs", "outputs")}
            return z["inputs"], z["outputs"], meta
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        inputs = np.array(nc.variables["inputs"][:], np.float32)
        outputs = np.array(nc.variables["outputs"][:], np.float32)
        meta = {k: float(np.array(v[:]).ravel()[0])
                for k, v in nc.variables.items()
                if k not in ("inputs", "outputs")}
    return inputs, outputs, meta
