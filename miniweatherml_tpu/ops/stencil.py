"""Stencil gathering and boundary-condition padding on global arrays.

TPU-native replacement for the reference's MPI halo exchange + BC fill
(dynamics_euler_stratified_wenofv.h:574-827).  Arrays are global; "halos"
are produced by padding along the stencil axis:

  * BC_PERIODIC -> wrap padding (the reference's self/neighbor exchange),
  * BC_OPEN     -> edge replication (dynamics...h:772-779),
  * BC_WALL     -> edge replication, but the wall-normal velocity halo is
                   zeroed (dynamics...h:768-770).

Under `jax.jit` with sharded inputs, XLA's SPMD partitioner lowers the
shifted windows produced by `gather_stencils` into ICI neighbor
collective-permutes -- no hand-written communication is required.  The
explicit shard_map/ppermute path lives in miniweatherml_tpu/parallel/halo.py.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["BC_PERIODIC", "BC_OPEN", "BC_WALL", "pad_bc", "halo_strips",
           "gather_stencils"]

# Reference enum values (dynamics_euler_stratified_wenofv.h:46-48).
BC_PERIODIC = 0
BC_OPEN = 1
BC_WALL = 2


def pad_bc(arr: jnp.ndarray, axis: int, halo: int, bc: int,
           zero_halo: bool = False, zero_var: int | None = None):
    """Pad ``arr`` with ``halo`` cells on both sides of ``axis`` per BC.

    ``zero_halo=True`` zeroes the pad region (wall-normal velocity under
    BC_WALL, reference dynamics...h:768-770,787,797).

    ``zero_var`` zeroes only variable index ``zero_var`` (leading axis 0)
    inside the pad region -- the fused form of the wall-normal-velocity
    halo for a stacked-variable array, avoiding a second full-array pass.
    """
    if zero_var is not None and bc != BC_PERIODIC:
        ax = axis % arr.ndim
        lo = jnp.broadcast_to(
            _edge_slab(arr, ax, 0), _slab_shape(arr, ax, halo))
        hi = jnp.broadcast_to(
            _edge_slab(arr, ax, -1), _slab_shape(arr, ax, halo))
        mask = (jnp.arange(arr.shape[0]) == zero_var).reshape(
            (-1,) + (1,) * (arr.ndim - 1))
        lo = jnp.where(mask, 0.0, lo).astype(arr.dtype)
        hi = jnp.where(mask, 0.0, hi).astype(arr.dtype)
        return jnp.concatenate([lo, arr, hi], axis=ax)
    pads = [(0, 0)] * arr.ndim
    pads[axis] = (halo, halo)
    if bc == BC_PERIODIC:
        return jnp.pad(arr, pads, mode="wrap")
    if zero_halo:
        return jnp.pad(arr, pads, mode="constant", constant_values=0)
    return jnp.pad(arr, pads, mode="edge")


def halo_strips(arr: jnp.ndarray, axis: int, halo: int, bc: int,
                zero_var: int | None = None):
    """The two ``halo``-wide strips that pad_bc would place on each side of
    ``axis`` -- without building the padded array.  Consumers (the Pallas
    megakernels) concatenate them in VMEM, so the full-array HBM pad copy
    never happens.  ``zero_var`` as in pad_bc."""
    ax = axis % arr.ndim
    n = arr.shape[ax]
    if bc == BC_PERIODIC:
        idx = [slice(None)] * arr.ndim
        idx[ax] = slice(n - halo, n)
        lo = arr[tuple(idx)]
        idx[ax] = slice(0, halo)
        hi = arr[tuple(idx)]
        return lo, hi
    lo = jnp.broadcast_to(_edge_slab(arr, ax, 0), _slab_shape(arr, ax, halo))
    hi = jnp.broadcast_to(_edge_slab(arr, ax, -1), _slab_shape(arr, ax, halo))
    if zero_var is not None:
        mask = (jnp.arange(arr.shape[0]) == zero_var).reshape(
            (-1,) + (1,) * (arr.ndim - 1))
        lo = jnp.where(mask, 0.0, lo)
        hi = jnp.where(mask, 0.0, hi)
    return lo.astype(arr.dtype), hi.astype(arr.dtype)


def _edge_slab(arr, ax, which):
    idx = [slice(None)] * arr.ndim
    idx[ax] = slice(0, 1) if which == 0 else slice(arr.shape[ax] - 1, None)
    return arr[tuple(idx)]


def _slab_shape(arr, ax, halo):
    shape = list(arr.shape)
    shape[ax] = halo
    return tuple(shape)


def gather_stencils(padded: jnp.ndarray, axis: int, n_out: int, ord: int):
    """Stack ``ord`` shifted windows of length ``n_out`` along a new last axis.

    ``padded`` must already contain enough halo cells so that window ``s``
    starting at index ``s`` is valid.  Output shape: padded.shape with
    ``axis`` replaced by ``n_out``, plus a trailing stencil axis of ``ord``.
    """
    slices = []
    for s in range(ord):
        idx = [slice(None)] * padded.ndim
        idx[axis] = slice(s, s + n_out)
        slices.append(padded[tuple(idx)])
    return jnp.stack(slices, axis=-1)
