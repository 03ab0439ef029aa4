"""Column nudging (reference model/modules/column_nudging.h).

Stores the initial horizontal-mean column of {density_dry, uvel, vvel, temp,
water_vapor} and nudges the state toward it with a 900 s time scale each
step.  MPI_Allreduce column averages (column_nudging.h:70-106) become plain
means over the global y/x axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.coupler import CouplerState

__all__ = ["ColumnNudger"]

_FIELDS = ("density_dry", "uvel", "vvel", "temp", "water_vapor")
_TIME_SCALE = 900.0  # (column_nudging.h:61)


class ColumnNudger:
    """Functional port: the stored column rides in the coupler state as the
    field ``nudging_column`` of shape (num_fields, nens, nz)."""

    def set_column(self, state: CouplerState) -> CouplerState:
        col = jnp.stack(
            [jnp.mean(state[n], axis=(2, 3)) for n in _FIELDS])
        if "nudging_column" in state.fields:
            return state.replace_fields(nudging_column=col)
        return state.register_field("nudging_column", value=col)

    def nudge_to_column(self, state: CouplerState, dt: float,
                        spmd_axes: tuple = ()) -> CouplerState:
        """``spmd_axes``: horizontal mesh axis names to pmean the column
        average over inside shard_map (the MPI_Allreduce analog,
        column_nudging.h:89-99).

        Note: like the reference (column_nudging.h:61-65), the water-vapor
        nudge is NOT positivity-clamped; O(1e-7) transient negatives can
        appear in dry cells and are re-clamped by the dycore's per-stage
        FCT clamp on the next step."""
        column = state["nudging_column"]
        updates = {}
        for l, name in enumerate(_FIELDS):
            f = state[name]
            avg = jnp.mean(f, axis=(2, 3), keepdims=True)
            for ax_name in spmd_axes:
                avg = jax.lax.pmean(avg, ax_name)
            updates[name] = f + dt * (column[l][:, :, None, None] - avg) / _TIME_SCALE
        return state.replace_fields(**updates)
