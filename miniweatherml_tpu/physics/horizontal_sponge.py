"""Lateral (horizontal) inflow/outflow sponge.

TPU-native re-design of the reference ``Horizontal_Sponge``
(experiments/simple_city/custom_modules/horizontal_sponge.h): stores one
reference column of {density_dry, uvel, vvel, wvel, temp, water_vapor} at
init (the reference takes local column (0,0) of rank 0 and MPI_Bcasts it,
horizontal_sponge.h:54-86 -- here that is simply the global (j=0, i=0)
column), then each step relaxes a cosine-weighted band of ``sponge_cells``
cells at the selected x/y walls toward that column
(horizontal_sponge.h:100-193).

Functional port: the stored column rides in the coupler state as the field
``horiz_sponge_column`` of shape (6, nens, nz), so the whole module stays
inside the jitted step.  Under sharding the column is replicated (the
broadcast analog).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.coupler import CouplerState

__all__ = ["HorizontalSponge"]

_FIELDS = ("density_dry", "uvel", "vvel", "wvel", "temp", "water_vapor")


class HorizontalSponge:
    """Relax lateral boundary bands toward a fixed reference column."""

    def __init__(self, sponge_cells: int = 10, time_scale: float = 1.0):
        self.sponge_cells = sponge_cells
        self.time_scale = time_scale

    def init(self, state: CouplerState) -> CouplerState:
        """Capture the global (j=0, i=0) column (horizontal_sponge.h:54-68)."""
        col = jnp.stack([state[n][:, :, 0, 0] for n in _FIELDS])  # (6, nens, nz)
        if "horiz_sponge_column" in state.fields:
            return state.replace_fields(horiz_sponge_column=col)
        return state.register_field("horiz_sponge_column", value=col)

    def override(self, state: CouplerState, **values: float) -> CouplerState:
        """Set a stored column to a constant (reference override_* methods)."""
        col = state["horiz_sponge_column"]
        for name, val in values.items():
            col = col.at[_FIELDS.index(name)].set(val)
        return state.replace_fields(horiz_sponge_column=col)

    def apply(self, state: CouplerState, dt: float,
              x1: bool = True, x2: bool = True,
              y1: bool = True, y2: bool = True,
              spmd=None) -> CouplerState:
        """Cosine-in-space, dt/time_scale-in-time blend toward the column at
        the selected walls (horizontal_sponge.h:100-193).

        ``spmd`` (dycore.euler.SpmdCtx) makes the wall bands use GLOBAL
        cell indices when running inside shard_map (the reference computes
        the band from each rank's global px offsets)."""
        import jax

        g = state.grid
        jd = state.meta.jdtype
        n_sp = self.sponge_cells
        time_factor = dt / self.time_scale
        col = state["horiz_sponge_column"]  # (6, nens, nz)

        def wall_weight(idx, n):
            # weight(i) = (cos(pi * i/(n_sp-1)) + 1)/2 for i < n_sp, else 0
            loc = idx.astype(jd) / (n_sp - 1.0)
            w = jnp.where(idx < n_sp, (jnp.cos(jnp.pi * loc) + 1.0) / 2.0, 0.0)
            return w * time_factor

        ix = jnp.arange(g.nx)
        jy = jnp.arange(g.ny)
        gnx, gny = g.nx, g.ny
        if spmd is not None:
            ax = spmd.get(-1)
            if ax is not None:
                name, ns = ax
                ix = jax.lax.axis_index(name) * g.nx + ix
                gnx = g.nx * ns
            ay = spmd.get(-2)
            if ay is not None:
                name, ns = ay
                jy = jax.lax.axis_index(name) * g.ny + jy
                gny = g.ny * ns
        # The reference launches one blending kernel per wall
        # (x1 -> x2 -> y1 -> y2, horizontal_sponge.h:137-193); where bands
        # overlap (corners, with y walls enabled) the later pass blends
        # the earlier pass's OUTPUT toward the same column.  Because every
        # pass is a linear blend toward the same column c,
        #   f' = w*c + (1-w)*f
        # the sequential composition collapses to the closed form
        #   f_final = (1 - prod_k (1-w_k))*c + prod_k (1-w_k)*f,
        # independent of wall order.
        one_minus = jnp.ones((g.ny, g.nx), jd)
        if x1:
            one_minus = one_minus * (1.0 - wall_weight(ix, gnx))[None, :]
        if x2:
            one_minus = one_minus * (1.0 - wall_weight(gnx - 1 - ix,
                                                       gnx))[None, :]
        if y1:
            one_minus = one_minus * (1.0 - wall_weight(jy, gny))[:, None]
        if y2:
            one_minus = one_minus * (1.0 - wall_weight(gny - 1 - jy,
                                                       gny))[:, None]
        weight = 1.0 - one_minus

        w = weight[None, None, :, :]  # (1, 1, ny, nx)
        updates = {}
        for l, name in enumerate(_FIELDS):
            f = state[name]
            c = col[l][:, :, None, None]  # (nens, nz, 1, 1)
            updates[name] = w * c + (1.0 - w) * f
        return state.replace_fields(**updates)
