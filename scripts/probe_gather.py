"""Probe: Mosaic tpu.dynamic_gather cost model on this chip.

Mosaic lowers lax.gather ONLY in the shape-preserving 2-D form
(jax/_src/pallas/mosaic/lowering.py _gather_lowering_rule):
    out[i, l] = tab[idx[i, l], l]   (axis 0, sublane gather)
    out[s, l] = tab[s, idx[s, l]]   (axis 1, lane gather)
with idx.shape == tab.shape == out.shape.  For table lookups the table
is replicated along the non-gathered dim and the cell block must be
shaped exactly like the table.  This probe measures both axes at the
table depths the P3 lookups need (50/300/1000-entry tables).

Run on the real chip: python -u scripts/probe_gather.py  (background,
no timeout -- killing a TPU client wedges the axon tunnel).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=20):
    out = fn(*args)
    float(jnp.asarray(out).ravel()[0])  # axon sync = value fetch
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


def probe_compile(shape, axis):
    n = shape[axis]
    tab = jnp.asarray(np.random.rand(*shape), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, n, shape), jnp.int32)

    def k(tab_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...],
                                           axis=axis)
    fn = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )
    try:
        out = jax.jit(fn)(tab, idx)
        want = np.take_along_axis(np.asarray(tab), np.asarray(idx),
                                  axis=axis)
        return f"ok correct={np.array_equal(np.asarray(out), want)}"
    except Exception as e:
        return f"FAIL {type(e).__name__}: {str(e)[:160]}"


def bench(shape, axis, n_gathers, blocks=16):
    """n_gathers gathers per block, `blocks` blocks; reports ns/cell-gather
    (one gathered element per cell per gather)."""
    S, L = shape
    n = shape[axis]
    tab = jnp.asarray(np.random.rand(S, L), jnp.float32)
    rows = S * blocks
    idx = jnp.asarray(np.random.randint(0, n, (rows, L)), jnp.int32)

    def k(tab_ref, idx_ref, out_ref):
        t = tab_ref[...]
        idx0 = idx_ref[...]
        acc = jnp.zeros((S, L), jnp.float32)
        for g in range(n_gathers):
            acc = acc + jnp.take_along_axis(
                t, jnp.minimum(idx0 + g, n - 1), axis=axis)
        out_ref[...] = acc

    fn = pl.pallas_call(
        k,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((S, L), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, L), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, L), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, L), jnp.float32),
    )
    try:
        ms = timeit(jax.jit(fn), tab, idx)
    except Exception as e:
        print(f"  {shape} axis={axis} x{n_gathers}: FAIL "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    cells = rows * L
    total = cells * n_gathers
    print(f"  {shape} axis={axis} x{n_gathers}: {ms:.3f} ms = "
          f"{total / ms / 1e6:.2f} Ggather/s "
          f"({ms * 1e6 / total:.3f} ns/elt)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    print("-- compile probes --", flush=True)
    for shape, axis in [((8, 128), 0), ((64, 128), 0), ((1000, 128), 0),
                        ((8, 128), 1), ((256, 128), 1)]:
        print(f"  {shape} axis={axis}:", probe_compile(shape, axis),
              flush=True)
    print("-- throughput --", flush=True)
    bench((8, 128), 0, 32)       # shallow sublane gather
    bench((64, 128), 0, 32)      # 50-entry-class table on sublanes
    bench((1000, 128), 0, 8, blocks=4)   # ice flat table on sublanes
    bench((64, 128), 1, 32)      # 50-entry-class table on lanes
    bench((512, 128), 1, 32)     # lane gather, tall cell block
    bench((512, 128), 1, 112)    # ice per-(jj,ii) lane-gather volume


if __name__ == "__main__":
    sys.exit(main())
