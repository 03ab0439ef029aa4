"""Explicit halo exchange with lax.ppermute inside shard_map.

The auto-SPMD path (jit over sharded global arrays) lets XLA partition the
dycore's shifted stencil windows into collective-permutes automatically
(~87 per step at ord 5).  This module is the hand-scheduled alternative --
the direct TPU-native analog of the reference's MPI halo exchange
(dynamics_euler_stratified_wenofv.h:574-827): ONE wide halo exchange per
direction per tendency evaluation, moving exactly ``halo`` cells to each
neighbor over the ICI ring with two counter-directional
``lax.ppermute`` calls.

Used by the shard_map'ed step in parallel/spmd.py.  All shipped test cases
are periodic in x/y (dynamics...h:1332-1551), which maps to the torus with
no boundary special-casing; wall/open global boundaries fill the outermost
shards' halos locally (edge replication / zeroed normal velocity), selected
by ``lax.axis_index``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.stencil import BC_OPEN, BC_PERIODIC, BC_WALL

__all__ = ["exchange_halos", "exchange_halo_strips",
           "exchange_face_scalar"]


def _slice_axis(a, axis, start, stop):
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(start, stop)
    return a[tuple(idx)]


def _ring_perms(n: int):
    fwd = [(i, (i + 1) % n) for i in range(n)]   # data moves +1 (to right)
    bwd = [(i, (i - 1) % n) for i in range(n)]   # data moves -1 (to left)
    return fwd, bwd


def exchange_halos(arr, axis: int, halo: int, axis_name: str, nshards: int,
                   bc: int = BC_PERIODIC, zero_halo: bool = False,
                   zero_var: int | None = None):
    """Pad a shard-local block with ``halo`` cells from ring neighbors.

    Must be called inside ``shard_map`` with ``axis_name`` a mesh axis of
    size ``nshards``.  Returns the local array extended by ``halo`` on both
    sides of ``axis``.

    ``bc`` applies at the *global* domain boundary only (the outermost
    shards): BC_PERIODIC wraps (the ring already does), BC_OPEN replicates
    the edge cell, BC_WALL replicates with ``zero_halo=True`` zeroing the
    halo (wall-normal velocity, reference dynamics...h:768-797).
    ``zero_var`` zeroes only variable index ``zero_var`` (leading axis 0)
    inside the boundary-shard halos -- the fused stacked-variable form.
    """
    if arr.shape[axis] < halo:
        raise ValueError(
            f"shard-local extent {arr.shape[axis]} along axis {axis} is "
            f"smaller than the halo width {halo} (ord too high for this "
            f"grid/mesh split); use fewer shards or a larger grid")
    if nshards == 1:
        # Degenerate ring: fall back to local padding semantics.
        from ..ops.stencil import pad_bc
        return pad_bc(arr, axis, halo, bc, zero_halo=zero_halo,
                      zero_var=zero_var)

    fwd, bwd = _ring_perms(nshards)
    my_right = _slice_axis(arr, axis, arr.shape[axis] - halo, arr.shape[axis])
    my_left = _slice_axis(arr, axis, 0, halo)
    # left halo of shard i+1 = right strip of shard i  (data moves forward)
    left_halo = lax.ppermute(my_right, axis_name, fwd)
    # right halo of shard i-1 = left strip of shard i  (data moves backward)
    right_halo = lax.ppermute(my_left, axis_name, bwd)

    if bc != BC_PERIODIC:
        idx = lax.axis_index(axis_name)
        if zero_halo:
            bdy_left = jnp.zeros_like(my_left)
            bdy_right = jnp.zeros_like(my_right)
        else:
            edge_l = _slice_axis(arr, axis, 0, 1)
            edge_r = _slice_axis(arr, axis, arr.shape[axis] - 1,
                                 arr.shape[axis])
            reps = [1] * arr.ndim
            reps[axis] = halo
            bdy_left = jnp.tile(edge_l, reps)
            bdy_right = jnp.tile(edge_r, reps)
        if zero_var is not None:
            mask = (jnp.arange(arr.shape[0]) == zero_var).reshape(
                (-1,) + (1,) * (arr.ndim - 1))
            bdy_left = jnp.where(mask, 0.0, bdy_left).astype(arr.dtype)
            bdy_right = jnp.where(mask, 0.0, bdy_right).astype(arr.dtype)
        left_halo = jnp.where(idx == 0, bdy_left, left_halo)
        right_halo = jnp.where(idx == nshards - 1, bdy_right, right_halo)

    return jnp.concatenate([left_halo, arr, right_halo], axis=axis)


def exchange_halo_strips(arr, axis: int, halo: int, axis_name: str,
                         nshards: int, bc: int = BC_PERIODIC,
                         zero_var: int | None = None):
    """Like exchange_halos but returns the two strips instead of the
    concatenated array -- for consumers that assemble the halo in VMEM
    (the Pallas megakernels)."""
    if arr.shape[axis] < halo:
        raise ValueError(
            f"shard-local extent {arr.shape[axis]} along axis {axis} is "
            f"smaller than the halo width {halo} (ord too high for this "
            f"grid/mesh split); use fewer shards or a larger grid")
    if nshards == 1:
        from ..ops.stencil import halo_strips
        return halo_strips(arr, axis, halo, bc, zero_var=zero_var)

    fwd, bwd = _ring_perms(nshards)
    my_right = _slice_axis(arr, axis, arr.shape[axis] - halo, arr.shape[axis])
    my_left = _slice_axis(arr, axis, 0, halo)
    left_halo = lax.ppermute(my_right, axis_name, fwd)
    right_halo = lax.ppermute(my_left, axis_name, bwd)

    if bc != BC_PERIODIC:
        idx = lax.axis_index(axis_name)
        edge_l = _slice_axis(arr, axis, 0, 1)
        edge_r = _slice_axis(arr, axis, arr.shape[axis] - 1, arr.shape[axis])
        reps = [1] * arr.ndim
        reps[axis] = halo
        bdy_left = jnp.tile(edge_l, reps)
        bdy_right = jnp.tile(edge_r, reps)
        if zero_var is not None:
            mask = (jnp.arange(arr.shape[0]) == zero_var).reshape(
                (-1,) + (1,) * (arr.ndim - 1))
            bdy_left = jnp.where(mask, 0.0, bdy_left).astype(arr.dtype)
            bdy_right = jnp.where(mask, 0.0, bdy_right).astype(arr.dtype)
        left_halo = jnp.where(idx == 0, bdy_left, left_halo)
        right_halo = jnp.where(idx == nshards - 1, bdy_right, right_halo)

    return left_halo, right_halo


def exchange_face_scalar(arr, axis: int, axis_name: str, nshards: int,
                         fill: float = 1.0):
    """1-cell halo exchange used by the FCT limiter: each shard needs its
    neighbors' boundary-cell multiplier (reference FCT scales fluxes from
    the upwind cell, dynamics...h:498-516).  The *global* boundary faces
    always take ``fill`` -- the global-array formulation pads the face
    multipliers with 1.0 at faces 0 and n for every BC (at the periodic
    seam the two face copies are independently scaled, matching the
    reference's seam behavior).  Returns (left_cell, right_cell) width-1
    halo slices."""
    if nshards == 1:
        left = jnp.full_like(_slice_axis(arr, axis, 0, 1), fill)
        return left, left

    fwd, bwd = _ring_perms(nshards)
    my_last = _slice_axis(arr, axis, arr.shape[axis] - 1, arr.shape[axis])
    my_first = _slice_axis(arr, axis, 0, 1)
    left = lax.ppermute(my_last, axis_name, fwd)
    right = lax.ppermute(my_first, axis_name, bwd)
    idx = lax.axis_index(axis_name)
    left = jnp.where(idx == 0, jnp.full_like(left, fill), left)
    right = jnp.where(idx == nshards - 1, jnp.full_like(right, fill), right)
    return left, right
