"""Running time-average of the coupler prognostic fields.

TPU-native re-design of the reference ``Time_Averager``
(experiments/simple_city/custom_modules/time_averager.h): inertia-weighted
running mean ``avg <- inertia*avg + (1-inertia)*field`` with
``inertia = etime/(etime+dt)`` (time_averager.h:60-70); ``finalize`` writes
``time_averaged_fields.nc`` with (z, y, x) dims (time_averager.h:75-141).

Functional port: averages and the elapsed-time scalar ride in the coupler
state (fields ``time_avg_*`` and ``time_avg_etime``), so accumulation happens
inside the jitted step.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.coupler import CouplerState

__all__ = ["TimeAverager"]

_FIELDS = ("density_dry", "uvel", "vvel", "wvel", "temp", "water_vapor")


class TimeAverager:
    def init(self, state: CouplerState) -> CouplerState:
        for name in _FIELDS:
            state = state.register_field("time_avg_" + name)
        return state.register_field(
            "time_avg_etime", value=jnp.zeros((), state.meta.jdtype))

    def accumulate(self, state: CouplerState, dt: float) -> CouplerState:
        etime = state["time_avg_etime"]
        inertia = etime / (etime + dt)
        updates = {
            "time_avg_" + n: inertia * state["time_avg_" + n]
            + (1.0 - inertia) * state[n]
            for n in _FIELDS
        }
        updates["time_avg_etime"] = etime + dt
        return state.replace_fields(**updates)

    def finalize(self, state: CouplerState,
                 path: str = "time_averaged_fields.nc") -> str:
        """Write the averaged fields (ensemble member 0) to NetCDF
        (time_averager.h:75-141); falls back to .npz without scipy."""
        g = state.grid
        data = {n: np.asarray(state["time_avg_" + n][0], np.float64)
                for n in _FIELDS}
        coords = {
            "x": (np.arange(g.nx) + 0.5) * g.dx,
            "y": (np.arange(g.ny) + 0.5) * g.dy,
            "z": (np.arange(g.nz) + 0.5) * g.dz,
        }
        try:
            from scipy.io import netcdf_file
        except Exception:  # pragma: no cover
            path = path.rsplit(".", 1)[0] + ".npz"
            np.savez(path, **coords, **data)
            return path
        nc = netcdf_file(path, "w")
        for dim in ("x", "y", "z"):
            nc.createDimension(dim, len(coords[dim]))
            v = nc.createVariable(dim, "d", (dim,))
            v[:] = coords[dim]
        for name in _FIELDS:
            v = nc.createVariable(name, "d", ("z", "y", "x"))
            v[:] = data[name]
        nc.close()
        return path
