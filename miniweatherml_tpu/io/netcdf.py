"""NetCDF output with the reference's file schema.

The reference writes NetCDF/PNetCDF with dims (t, z, y, x), coordinate
variables x/y/z/t, and one variable per coupler state field + tracer
(dynamics_euler_stratified_wenofv.h:2019-2191).  Here a single global file is
written via scipy's NetCDF3 writer (the Python environment has no netCDF4);
data is gathered from device to host at each snapshot.  Falls back to ``.npz``
snapshots if scipy is unavailable.
"""

from __future__ import annotations

import numpy as np

from ..core.coupler import CouplerState

try:
    from scipy.io import netcdf_file as _netcdf_file
except Exception:  # pragma: no cover
    _netcdf_file = None

__all__ = ["StateWriter"]

_STATE_VARS = ("density_dry", "uvel", "vvel", "wvel", "temp")


class ShardedStateWriter:
    """Per-shard snapshot writer: one NetCDF file per addressable shard of
    the (y, x) decomposition -- the analog of the reference's
    ``file_per_process`` per-rank output (dynamics...h:2027-2120, coupler
    option at simple_city/driver.cpp:38).  Each file carries the shard's
    global offsets so files can be stitched offline into one global file
    with ``miniweatherml_tpu.io.stitch`` (the PNetCDF single-collective-file
    analog, dynamics...h:2019-2191).
    """

    def __init__(self, path_prefix: str, state: CouplerState, iens: int = 0):
        self.prefix = path_prefix
        self.iens = iens
        self.varnames = list(_STATE_VARS) + list(state.meta.tracer_names)
        self._writers: dict[int, StateWriter] = {}

    def write(self, state: CouplerState, etime: float) -> None:
        import dataclasses

        ref = state[self.varnames[0]]
        for rank, shard in enumerate(ref.addressable_shards):
            sub_fields = {n: state[n][shard.index] for n in self.varnames}
            if rank not in self._writers:
                g = state.grid
                ne, nz, ny, nx = sub_fields[self.varnames[0]].shape
                # Global index offsets of this shard (the reference's
                # i_beg/j_beg, coupler.h:147-153) so files stitch offline:
                # coordinate variables are written in GLOBAL coordinates and
                # the offsets are stored as attributes.
                i_beg = shard.index[3].start or 0
                j_beg = shard.index[2].start or 0
                sub_grid = dataclasses.replace(
                    g, nens=ne, nz=nz, ny=ny, nx=nx,
                    ylen=g.ylen * ny / g.ny, xlen=g.xlen * nx / g.nx)
                sub_meta = dataclasses.replace(state.meta, grid=sub_grid)
                self._sub_meta = sub_meta
                self._writers[rank] = StateWriter(
                    f"{self.prefix}_task_{rank}",
                    CouplerState(fields=sub_fields, meta=sub_meta),
                    iens=self.iens,
                    offsets=(i_beg, j_beg, g.dx, g.dy))
            self._writers[rank].write(
                CouplerState(fields=sub_fields, meta=self._sub_meta), etime)

    def close(self) -> None:
        for w in self._writers.values():
            w.close()


class StateWriter:
    """Snapshot writer mirroring the reference output() variable layout.

    Writes ensemble member 0 like the reference (dynamics...h:2034).
    """

    def __init__(self, path_prefix: str, state: CouplerState, iens: int = 0,
                 offsets: tuple | None = None,
                 extra_vars: tuple = ()):
        """``extra_vars``: additional registered (nens, nz, ny, nx) fields
        to write beyond the reference's state+tracer variable layout
        (dynamics...h:2114-2131) -- e.g. the P3 diagnostic fields."""
        self.iens = iens
        self.varnames = (list(_STATE_VARS) + list(state.meta.tracer_names)
                         + list(extra_vars))
        g = state.grid
        if _netcdf_file is None:
            self.path = path_prefix + ".npz"
            self._nc = None
            self._frames: list[dict] = []
            return
        self.path = path_prefix if path_prefix.endswith(".nc") else path_prefix + ".nc"
        nc = _netcdf_file(self.path, "w")
        nc.createDimension("t", None)  # scipy requires unlimited dim first
        nc.createDimension("x", g.nx)
        nc.createDimension("y", g.ny)
        nc.createDimension("z", g.nz)
        # Per-shard files: global index offsets + global coordinates so
        # files can be stitched offline (offsets = (i_beg, j_beg, dx, dy)).
        i_beg, j_beg = 0, 0
        dx_glob, dy_glob = g.dx, g.dy
        if offsets is not None:
            i_beg, j_beg, dx_glob, dy_glob = offsets
            nc.i_beg = i_beg
            nc.j_beg = j_beg
        for dim, n, d, beg in (("x", g.nx, dx_glob, i_beg),
                               ("y", g.ny, dy_glob, j_beg),
                               ("z", g.nz, g.dz, 0)):
            v = nc.createVariable(dim, "d", (dim,))
            v[:] = (np.arange(n) + beg + 0.5) * d
        self._tvar = nc.createVariable("t", "d", ("t",))
        self._vars = {
            name: nc.createVariable(name, "d", ("t", "z", "y", "x"))
            for name in self.varnames
        }
        self._nc = nc
        self._n = 0

    def write(self, state: CouplerState, etime: float) -> None:
        if self._nc is None:
            self._frames.append(
                {"t": etime, **{n: np.asarray(state[n][self.iens]) for n in self.varnames}}
            )
            np.savez(self.path, frames=np.array(self._frames, dtype=object))
            return
        i = self._n
        self._tvar[i] = etime
        for name in self.varnames:
            self._vars[name][i] = np.asarray(state[name][self.iens], np.float64)
        self._nc.flush()
        self._n += 1

    def close(self) -> None:
        if self._nc is not None:
            self._nc.close()
