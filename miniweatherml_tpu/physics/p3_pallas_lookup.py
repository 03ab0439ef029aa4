"""Pallas TPU kernel for the P3 trilinear ice-table lookups.

The XLA matmul formulation (p3_tables.interp_ice_multi) materializes the
(cells, 50) one-hot weight matrix and the (cells, 20K) corner-product
array in HBM; at 16.8M cells that is ~10 GB of traffic per batched
lookup.  Here the whole interpolation runs inside one kernel with the
table resident in VMEM: per block of cells, build the weight rows in
VMEM, contract on the MXU, and reduce the (densize=5 x rimsize=4) corner
plane with strided lane slices -- HBM traffic collapses to the index
inputs and the K output columns.

Layout: cells ride the SUBLANE axis (blocks of ``_BC`` cells x 1 lane);
the one-hot axis (isize=50) and the 20K product columns ride lanes.  The
(jj, ii) corner weights reduce with static lane slices of the product
(A is laid out k-major: column k occupies lanes [k*20, (k+1)*20)), so no
in-kernel reshape of the lane axis is ever needed.

Used automatically on TPU via MWML_P3_TABLES=auto when
MWML_P3_LOOKUP_PALLAS=1 (default on TPU); interpret mode on CPU is used
by the equivalence test only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .p3_tables import DENSIZE, ISIZE, RIMSIZE

_BC = 1024  # cells per block (sublane axis)


def _kernel(i0_ref, fi_ref, ii0_ref, fii_ref, jj0_ref, fjj_ref, t_ref,
            out_ref, *, K):
    """One block: (BC, 1) index/frac columns + (isize, 20K) table."""
    f = fi_ref[...]                                   # (BC, 1)
    i0 = i0_ref[...]
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (_BC, ISIZE), 1)
    wk = (jnp.where(iota_i == i0, 1.0 - f, 0.0)
          + jnp.where(iota_i == i0 + 1, f, 0.0))      # (BC, 50)
    a = jnp.dot(wk, t_ref[...],
                preferred_element_type=jnp.float32)   # (BC, 20K)

    fjj = fjj_ref[...]
    jj0 = jj0_ref[...]
    fii = fii_ref[...]
    ii0 = ii0_ref[...]
    # corner plane weights over the 20 (jj, ii) combos, k-major layout:
    # lane p within a column block = jj * RIMSIZE + ii
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (_BC, DENSIZE * RIMSIZE),
                                      1)
    pj = iota_p // RIMSIZE
    pi = iota_p - pj * RIMSIZE
    wj = (jnp.where(pj == jj0, 1.0 - fjj, 0.0)
          + jnp.where(pj == jj0 + 1, fjj, 0.0))
    wi = (jnp.where(pi == ii0, 1.0 - fii, 0.0)
          + jnp.where(pi == ii0 + 1, fii, 0.0))
    w12 = wj * wi                                     # (BC, 20)
    P = DENSIZE * RIMSIZE
    for k in range(K):
        seg = jax.lax.slice_in_dim(a, k * P, (k + 1) * P, axis=1)
        out_ref[:, k:k + 1] = jnp.sum(seg * w12, axis=1, keepdims=True)


def interp_ice_pallas(tables, cols, i0, fi, ii0, fii, jj0, fjj,
                      interpret: bool = False):
    """Trilinear ice-table interpolation for 1-based ``cols`` in one
    VMEM-resident kernel; same contract as interp_ice_multi."""
    K = len(cols)
    # (densize, rimsize, isize, K) -> (isize, K, densize*rimsize): column
    # k occupies lanes [k*20, (k+1)*20), plane-major (jj*RIMSIZE + ii)
    tsel = np.moveaxis(tables.ice[..., [c - 1 for c in cols]], 2, 0)
    tsel = tsel.reshape(ISIZE, DENSIZE * RIMSIZE, K).transpose(0, 2, 1)
    T = jnp.asarray(np.ascontiguousarray(tsel).reshape(ISIZE, -1),
                    jnp.float32)

    shape = i0.shape
    n = int(np.prod(shape)) if shape else 1
    pad = (-n) % _BC
    flat = []
    for a, dt in ((i0, jnp.int32), (fi, jnp.float32), (ii0, jnp.int32),
                  (fii, jnp.float32), (jj0, jnp.int32), (fjj, jnp.float32)):
        a = a.reshape(n).astype(dt)
        if pad:
            a = jnp.pad(a, (0, pad))
        flat.append(a.reshape(-1, 1))
    nblocks = flat[0].shape[0] // _BC

    grid = (nblocks,)
    in_specs = [pl.BlockSpec((_BC, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM)] * 6
    in_specs.append(pl.BlockSpec((ISIZE, T.shape[1]), lambda b: (0, 0),
                                 memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_kernel, K=K),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_BC, K), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * _BC, K), jnp.float32),
        interpret=interpret,
    )(*flat, T)
    out = out[:n].reshape(*shape, K)
    return tuple(out[..., k] for k in range(K))
