"""Explicit-SPMD physics step: shard_map + ring ppermute halo exchange.

The framework's default distribution lets XLA's SPMD partitioner slice the
jitted global-array step (parallel/mesh.py) -- correct, and already
neighbor-permute based.  This module is the hand-scheduled alternative for
maximum control of the communication schedule, the direct TPU analog of the
reference's MPI decomposition (coupler.h:110-214 + the halo/edge exchanges
dynamics...h:574-1082):

  * the whole physics chain runs inside one ``shard_map`` over the
    ("ens", "y", "x") mesh on shard-local blocks,
  * the dycore pulls its halos with ONE wide ppermute exchange per
    direction per tendency evaluation (parallel/halo.py),
  * horizontal means (sponge/nudging) and the Kessler sub-cycle count
    become ``lax.pmean`` / ``lax.pmin`` over the mesh axes (the
    MPI_Allreduce analog).

Shard-count invariance against the auto-SPMD path is asserted in
tests/test_spmd.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.coupler import CouplerMeta, CouplerState, Grid
from ..dycore.euler import SpmdCtx
from .mesh import field_pspec

__all__ = ["make_spmd_step"]


def make_spmd_step(state: CouplerState, mesh: Mesh, dycore, micro=None,
                   sponge_time_scale: float | None = 60.0, nudger=None):
    """Build a shard_map'ed full physics step for ``state`` on ``mesh``.

    Returns ``step(state, dt) -> state`` operating on globally-sharded
    arrays (place them with ``shard_state(state, mesh)``); jit-compatible.
    The module chain mirrors the supercell driver (driver.cpp:72-77):
    dycore -> micro -> sponge -> nudger, each spmd-aware.
    """
    g = state.grid
    E = mesh.shape.get("ens", 1)
    Y = mesh.shape.get("y", 1)
    X = mesh.shape.get("x", 1)
    if g.nens % E or g.ny % Y or g.nx % X:
        raise ValueError(
            f"grid ({g.nens},{g.ny},{g.nx}) not divisible by mesh "
            f"({E},{Y},{X})")
    if g.ny > 1 and g.ny // Y == 1:
        # a local ny of 1 would flip the dycore into its 2-D (sim2d) path
        raise ValueError("ny/Y must stay > 1 for a 3-D run (sim2d trigger)")

    # Local block geometry: lengths scale with the cell counts so dx/dy (and
    # therefore CFL dt, flux divergences, FCT volumes) are shard-invariant.
    local_grid = dataclasses.replace(
        g, nens=g.nens // E, ny=g.ny // Y, nx=g.nx // X,
        ylen=g.ylen / Y, xlen=g.xlen / X)
    local_meta = dataclasses.replace(state.meta, grid=local_grid)

    spmd_axes_map = {}
    if X > 1:
        spmd_axes_map[-1] = ("x", X)
    if Y > 1:
        spmd_axes_map[-2] = ("y", Y)
    ctx = SpmdCtx(axes=spmd_axes_map)
    horiz_axes = tuple(name for name, _ in spmd_axes_map.values())

    specs = {name: field_pspec(name, tuple(arr.shape), g)
             for name, arr in state.fields.items()}
    names = tuple(sorted(specs))
    in_specs = tuple(specs[n] for n in names)

    def local_chain(dt, *arrs):
        s = CouplerState(fields=dict(zip(names, arrs)), meta=local_meta)
        # compute_time_step uses only cell sizes -- shard-invariant -- but
        # ncycles must come from the GLOBAL grid (identical here since cell
        # sizes are equal); pass the local state directly.
        s = dycore.time_step(s, dt, spmd=ctx)
        if micro is not None:
            s = micro.time_step(s, dt, spmd_axes=horiz_axes)
        if sponge_time_scale is not None:
            from ..physics.sponge import sponge_layer
            s = sponge_layer(s, dt, time_scale=sponge_time_scale,
                             spmd_axes=horiz_axes)
        if nudger is not None:
            s = nudger.nudge_to_column(s, dt, spmd_axes=horiz_axes)
        return tuple(s.fields[n] for n in names)

    def step(state_in: CouplerState, dt: float) -> CouplerState:
        # check_vma off: pallas_call outputs carry no varying-mesh-axes
        # annotation (required when the dycore runs its Pallas kernels per
        # shard); correctness is covered by the shard-invariance tests.
        sm = jax.shard_map(
            partial(local_chain, dt), mesh=mesh,
            in_specs=in_specs, out_specs=in_specs, check_vma=False)
        out = sm(*[state_in.fields[n] for n in names])
        return CouplerState(fields=dict(zip(names, out)), meta=state_in.meta)

    return step
