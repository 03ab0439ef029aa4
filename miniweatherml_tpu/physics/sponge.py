"""Top sponge layer (reference model/modules/sponge_layer.h).

Relaxes the top ``num_layers`` model levels toward the instantaneous
horizontal mean (w relaxed toward 0), with a cosine spatial profile and
dt/time_scale temporal blending.  The reference computes the horizontal mean
with atomicAdd partial sums + MPI_Allreduce (sponge_layer.h:47-63); on TPU
this is a plain mean over the (global) y/x axes -- under sharding XLA lowers
it to an ICI psum.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.coupler import CouplerState

__all__ = ["sponge_layer"]


def sponge_layer(state: CouplerState, dt: float, time_scale: float = 60.0,
                 num_layers: int = 10,
                 spmd_axes: tuple = ()) -> CouplerState:
    """``spmd_axes``: horizontal mesh axis names to pmean the horizontal
    mean over when running inside shard_map (the Allreduce analog)."""
    import jax
    g = state.grid
    names = ["density_dry", "uvel", "vvel", "wvel", "temp"] + \
        list(state.meta.tracer_names)
    time_factor = dt / time_scale

    k = jnp.arange(g.nz - num_layers, g.nz)
    z = (k.astype(state.meta.jdtype) + 0.5) * g.dz
    rel_dist = (g.zlen - z) / (num_layers * g.dz)
    space_factor = (jnp.cos(jnp.pi * rel_dist) + 1.0) / 2.0
    factor = (space_factor * time_factor)[None, :, None, None]

    updates = {}
    for name in names:
        f = state[name]
        top = f[:, -num_layers:]
        # w is relaxed toward zero, not its mean (sponge_layer.h:23,50)
        if name == "wvel":
            havg = 0.0
        else:
            havg = jnp.mean(top, axis=(2, 3), keepdims=True)
            for ax_name in spmd_axes:
                havg = jax.lax.pmean(havg, ax_name)
        updates[name] = f.at[:, -num_layers:].set(top + (havg - top) * factor)
    return state.replace_fields(**updates)
