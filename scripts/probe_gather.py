"""Probe: does Mosaic support per-lane sublane gathers (take_along_axis
axis=0) on this chip, and how fast are they vs the one-hot matmul?

The P3 table lookups are multilinear interpolations; the matmul
formulation pays 2*table_size*K flops/cell (invariant under contraction
order), while a true per-lane gather pays only the 8/16 corners.  If
dynamic_gather lowers on this TPU, the lookup flop floor drops ~25x.

Run on the real chip: python scripts/probe_gather.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def gather_kernel(tab_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...], axis=0)


def probe_compile(nsub, br):
    tab = jnp.asarray(np.random.rand(nsub, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, nsub, (br, 128)), jnp.int32)
    fn = pl.pallas_call(
        gather_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((br, 128), jnp.float32),
    )
    try:
        out = jax.jit(lambda t, i: fn(t, i))(tab, idx)
        want = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
        ok = np.array_equal(np.asarray(out), want)
        return f"ok correct={ok}"
    except Exception as e:
        return f"FAIL {type(e).__name__}: {str(e)[:200]}"


def bench_gather_vs_matmul(nsub=56, n_gathers=24, rows=4096):
    """Time: per 128-lane row block, n_gathers gathers from an
    (nsub, 128) table vs the one-hot matmul equivalent."""
    BR = 256
    tab = jnp.asarray(np.random.rand(nsub, 128), jnp.float32)

    def gk(tab_ref, idx_ref, out_ref):
        acc = jnp.zeros((BR, 128), jnp.float32)
        idx = idx_ref[...]
        for g in range(n_gathers):
            acc = acc + jnp.take_along_axis(
                tab_ref[...], (idx + g) % nsub, axis=0)
        out_ref[...] = acc

    idx = jnp.asarray(np.random.randint(0, nsub, (rows, 128)), jnp.int32)
    fn = pl.pallas_call(
        gk,
        grid=(rows // BR,),
        in_specs=[
            pl.BlockSpec((nsub, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
    )
    ms = timeit(jax.jit(lambda t, i: fn(t, i)), tab, idx)
    cells = rows * 128
    print(f"  gather x{n_gathers} (nsub={nsub}): {ms:.3f} ms for {cells} "
          f"cells = {cells / ms / 1e3:.0f} Mcell/s")
    return ms


def main():
    print("devices:", jax.devices())
    print("-- compile probes (take_along_axis axis=0 in Mosaic) --")
    for nsub, br in [(8, 8), (16, 8), (56, 8), (56, 256), (512, 8),
                     (1504, 8), (1504, 64)]:
        print(f"  tab({nsub},128) idx({br},128):", probe_compile(nsub, br))
    print("-- lane-axis probe (axis=1) --")
    tab = jnp.asarray(np.random.rand(8, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 128, (8, 128)), jnp.int32)

    def lk(tab_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...],
                                           axis=1)
    fn = pl.pallas_call(
        lk,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    try:
        out = jax.jit(lambda t, i: fn(t, i))(tab, idx)
        want = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
        print("  axis=1 ok correct=", np.array_equal(np.asarray(out), want))
    except Exception as e:
        print(f"  axis=1 FAIL {type(e).__name__}: {str(e)[:200]}")

    print("-- throughput --")
    try:
        bench_gather_vs_matmul(nsub=56, n_gathers=24)
        bench_gather_vs_matmul(nsub=56, n_gathers=96)
        bench_gather_vs_matmul(nsub=512, n_gathers=16)
        bench_gather_vs_matmul(nsub=1504, n_gathers=16)
    except Exception as e:
        print(f"  bench FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    sys.exit(main())
