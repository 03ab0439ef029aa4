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

__all__ = ["BC_PERIODIC", "BC_OPEN", "BC_WALL", "pad_bc", "gather_stencils"]

# Reference enum values (dynamics_euler_stratified_wenofv.h:46-48).
BC_PERIODIC = 0
BC_OPEN = 1
BC_WALL = 2


def pad_bc(arr: jnp.ndarray, axis: int, halo: int, bc: int, zero_halo: bool = False):
    """Pad ``arr`` with ``halo`` cells on both sides of ``axis`` per BC.

    ``zero_halo=True`` zeroes the pad region (wall-normal velocity under
    BC_WALL, reference dynamics...h:768-770,787,797).
    """
    pads = [(0, 0)] * arr.ndim
    pads[axis] = (halo, halo)
    if bc == BC_PERIODIC:
        return jnp.pad(arr, pads, mode="wrap")
    if zero_halo:
        return jnp.pad(arr, pads, mode="constant", constant_values=0)
    return jnp.pad(arr, pads, mode="edge")


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
