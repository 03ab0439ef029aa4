"""One-pass fused execution of per-cell physics sections.

The P3 scheme's hot cost on TPU is not its table lookups (matmul'd) or its
math but HBM traffic: XLA splits the long elementwise phases (part1 +
saturation Newton, conservation + prognostic update, homogeneous freezing +
part3) into many kernels, each re-reading tens of (nens, nz, ny, nx)
arrays.  On-chip attribution (scripts/profile_p3.py, 256x256x64 f32):
13.0 ms for the conservation/update phase alone, ~10x above its minimal
one-pass traffic.

``fused_cellwise`` runs a pure per-cell function as ONE Pallas pass:
every input array is streamed HBM -> VMEM exactly once, all intermediate
values live in registers/VMEM, and every output is written exactly once.
The SAME Python function is used by the plain XLA path, so the physics
exists once and the kernel is only an execution schedule -- parity between
the paths is structural, not re-implemented.

Reference behavior being accelerated: the per-column Fortran loops of
micro_p3.F90 p3_main (which touch each column once per phase by
construction -- the loop nest is the fusion the TPU path restores).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

__all__ = ["fused_cellwise"]

_LANES = 128


def _kernel(f, n_scalars, n_out, *refs):
    scalars = [r[0, 0] for r in refs[:n_scalars]]
    ins = [r[:] for r in refs[n_scalars:-n_out]]
    outs = refs[-n_out:]
    vals = f(*scalars, *ins)
    for o, v in zip(outs, vals):
        o[:] = v


def fused_cellwise(f, scalars, arrays, n_out: int, row_block: int = 128,
                   interpret: bool | None = None):
    """Run ``f(*scalars, *arrays) -> tuple of n_out arrays`` as one fused
    elementwise Pallas pass.

    ``scalars``: traced 0-d values (e.g. dt), delivered via SMEM.
    ``arrays``: same-shape arrays; each is read from HBM exactly once.
    ``f`` must be purely per-cell (no reductions, no axis coupling) --
    out-of-range lanes of the final block compute garbage that is masked
    on store, which is only safe elementwise.

    Returns the tuple f would return, reshaped to the input shape.  On
    non-TPU backends runs in interpret mode (slow; for tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    shape = arrays[0].shape
    n = math.prod(shape)
    rows = -(-n // _LANES)
    pad = rows * _LANES - n

    # derive output shapes/dtypes from the function itself
    out_abs = jax.eval_shape(lambda *a: f(*a), *scalars, *arrays)
    assert len(out_abs) == n_out, (len(out_abs), n_out)

    if pad and n >= 1 << 20:
        # jnp.pad materializes a full extra copy of EVERY input before the
        # kernel -- silently doubled HBM traffic on exactly the pass this
        # exists to optimize.  Production grids are lane-multiples (nx is a
        # multiple of 128 in every shipped config); only small test shapes
        # should ever take the pad path.
        import warnings
        warnings.warn(
            f"fused_cellwise: total cells {n} is not a multiple of "
            f"{_LANES}; padding copies all {len(arrays)} inputs "
            "(use a lane-multiple grid for production runs)",
            stacklevel=2)

    flat = []
    for a in arrays:
        v = a.reshape(-1)
        if pad:  # bench/production shapes are lane-multiples; tests may pad
            v = jnp.pad(v, (0, pad))
        flat.append(v.reshape(rows, _LANES))

    br = min(row_block, rows)
    grid = (-(-rows // br),)
    spec = pl.BlockSpec((br, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                          memory_space=pltpu.SMEM)
    s_vals = [jnp.asarray(s).reshape(1, 1) for s in scalars]

    outs = pl.pallas_call(
        functools.partial(_kernel, f, len(s_vals), n_out),
        grid=grid,
        in_specs=[s_spec] * len(s_vals) + [spec] * len(flat),
        out_specs=[pl.BlockSpec((br, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), o.dtype)
                   for o in out_abs],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*s_vals, *flat)
    return tuple(o.reshape(-1)[:n].reshape(shape) for o in outs)
