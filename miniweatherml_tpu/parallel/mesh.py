"""Device mesh and sharding layout for the coupler state.

TPU-native replacement for the reference's 2-D MPI domain decomposition
(coupler.h:110-214): a mesh with axes ("ens", "y", "x") shards the ensemble
dimension (data-parallel analog) and the horizontal grid (the reference's
nproc_y x nproc_x block decomposition; z is never decomposed, coupler.h:147).
Arrays stay global; XLA's SPMD partitioner inserts ICI collective-permutes
for the dycore's stencil windows (the halo exchange) and psums for the
horizontal-mean reductions (sponge/nudging Allreduce).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.coupler import CouplerState, Grid

__all__ = ["make_mesh", "near_square_factors", "field_pspec", "shard_state"]


def near_square_factors(n: int) -> tuple[int, int]:
    """Near-square factorization nproc_y x nproc_x = n, nproc_x >= nproc_y
    (reference coupler.h:132-140)."""
    if n < 1:
        raise ValueError(f"cannot factor a non-positive device count: {n}")
    py = int(np.sqrt(n))
    while n % py != 0:
        py -= 1
    return py, n // py


def make_mesh(devices=None, ens: int = 1, y: int | None = None,
              x: int | None = None) -> Mesh:
    """Build an ("ens", "y", "x") mesh.  With only a device count given,
    factor near-square over (y, x) like the reference decomposition.

    Raises a clear ValueError when the available devices cannot fill the
    requested mesh (e.g. a 1-device platform asked for ens=2) instead of
    silently under-provisioning or dividing by zero.
    """
    if devices is None:
        devices = jax.devices()
    if ens < 1:
        raise ValueError(f"ens must be >= 1, got {ens}")
    if len(devices) < ens:
        raise ValueError(
            f"mesh needs at least ens={ens} devices but only "
            f"{len(devices)} are available ({[str(d) for d in devices]})")
    n = len(devices) // ens
    if y is None or x is None:
        y, x = near_square_factors(n)
    if ens * y * x > len(devices):
        raise ValueError(
            f"mesh shape (ens={ens}, y={y}, x={x}) needs {ens * y * x} "
            f"devices but only {len(devices)} are available")
    dev = np.asarray(devices)[: ens * y * x].reshape(ens, y, x)
    return Mesh(dev, ("ens", "y", "x"))


# Known field names whose layout is ambiguous by shape alone (e.g. nz == ny
# collisions): name -> PartitionSpec.
_NAMED_SPECS = {
    "hy_dens_cells": P("ens"),
    "hy_dens_theta_cells": P("ens"),
    "hy_dens_edges": P("ens"),
    "hy_dens_theta_edges": P("ens"),
    "nudging_column": P(None, "ens"),
    "horiz_sponge_column": P(None, "ens"),
    "surrogate_diffs": P(),
    "time_avg_etime": P(),
}


def field_pspec(name: str, shape: tuple[int, ...], grid: Grid) -> P:
    """PartitionSpec for a coupler field: known names first, then shape
    convention."""
    if name in _NAMED_SPECS:
        return _NAMED_SPECS[name]
    g = grid
    if shape == (g.nens, g.nz, g.ny, g.nx):
        return P("ens", None, "y", "x")
    if shape == (g.nens, g.ny, g.nx):
        return P("ens", "y", "x")
    if len(shape) >= 1 and shape[0] == g.nens and g.ny not in shape[1:] and g.nx not in shape[1:]:
        return P("ens")
    if len(shape) == 3 and shape[1] == g.nens and shape[2] == g.nz:
        # stacked per-field columns shaped (nfields, nens, nz)
        return P(None, "ens")
    return P()  # replicate (unknown auxiliary data)


def shard_state(state: CouplerState, mesh: Mesh) -> CouplerState:
    """Place every field with its sharding on the mesh."""
    out = {}
    for name, arr in state.fields.items():
        spec = field_pspec(name, tuple(arr.shape), state.grid)
        out[name] = jax.device_put(arr, NamedSharding(mesh, spec))
    return CouplerState(fields=out, meta=state.meta)
