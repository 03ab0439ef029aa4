"""Pallas TPU kernels for the P3 lookup-table interpolations.

The XLA matmul formulation (p3_tables.interp_*_multi) materializes the
(cells, 50) one-hot weight matrix and the (cells, K*P) corner-product
array in HBM.  This kernel was written to collapse that traffic by
keeping the whole interpolation VMEM-resident -- but MEASURED ON-CHIP
IT LOSES (ice 82.5 ms vs the matmul path's ~15 at 4.2M cells): the
(cells, 1) column operands acquire 128x-padded T(8,128) HBM copies at
the custom-call boundary, so the kernel pays more HBM traffic than the
fusion it removes.  It stays as an opt-in A/B reference; the matmul
form is the TPU default (BASELINE.md round-3 negative results).

Formulation (chosen for Mosaic-friendliness -- every op is a full-width
vector op or an MXU matmul; no lane slicing, no in-kernel reshapes):

  1. one-hot pair rows over the table's large axis (isize=50):
     ``wk[c, i] = (1-f)[i==i0] + f[i==i0+1]``            (iota + where)
  2. ``a = wk @ T``  with T laid out (isize, K*P), column k occupying
     lanes [k*P, (k+1)*P), plane p = corner index within       (MXU)
  3. corner weights computed *directly at width K*P* from pure iota
     arithmetic (p = q mod P decomposed into its jj/ii[/rr] digits), so
     the (c, P) weight tile never needs tiling/reshaping        (VPU)
  4. segment reduction back to the K columns as a second matmul with a
     static 0/1 selector ``S[q, k] = [q // P == k]``           (MXU)

The reference interpolates these tables per cell per process in scalar
Fortran (micro_p3.F90 access_lookup_table :1508-1556); the XLA gather
lowering was measured near-scalar on TPU too (BASELINE.md round 3), so
the matmul form IS the TPU-native design -- this kernel removes its
last HBM round-trip.

Opt-in via MWML_P3_TABLES=pallas (f32 only; interpret mode on CPU is
used by the equivalence tests).  MWML_P3_PALLAS_BC sets cells/block.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .p3_tables import DENSIZE, ISIZE, RCOLLSIZE, RIMSIZE

def _bc(lanes: int = 1) -> int:
    """Cells per block, clamped so the kernel's (BC, lanes) temporaries
    fit Mosaic's scoped-VMEM budget.  The collect kernel's lane width is
    K*P = 1200, and ~7 full-width temps (iota, digit decode, weights,
    matmul operand) live at once: BC=1024 there needs ~20.5 MB of scoped
    VMEM vs the 16 MB limit (measured OOM on-chip).  Cap the per-temp
    footprint at ~1.5 MB; env MWML_P3_PALLAS_BC remains an upper bound."""
    bc = int(os.environ.get("MWML_P3_PALLAS_BC", 1024))
    cap = max(8, (1_500_000 // (4 * max(lanes, 1))) // 8 * 8)
    return min(bc, cap)


def _pair_rows(i0, f, iota):
    """(BC, size) rows holding 1-f at i0 and f at i0+1 (broadcast over
    the lane axis; matches p3_tables._lerp_rows)."""
    return (jnp.where(iota == i0, 1.0 - f, 0.0)
            + jnp.where(iota == i0 + 1, f, 0.0))


def _ice_kernel(i0_ref, fi_ref, ii0_ref, fii_ref, jj0_ref, fjj_ref,
                t_ref, s_ref, out_ref, *, BC, K):
    P = DENSIZE * RIMSIZE
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (BC, ISIZE), 1)
    wk = _pair_rows(i0_ref[...], fi_ref[...], iota_i)          # (BC, 50)
    a = jnp.dot(wk, t_ref[...],
                preferred_element_type=jnp.float32)            # (BC, K*P)

    # corner weights at full width K*P: lane q -> p = q % P, p = jj*RIM+ii
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (BC, K * P), 1)
    p = iota_q - (iota_q // P) * P
    pj = p // RIMSIZE
    pi = p - pj * RIMSIZE
    w = (_pair_rows(jj0_ref[...], fjj_ref[...], pj)
         * _pair_rows(ii0_ref[...], fii_ref[...], pi))
    out_ref[...] = jnp.dot(a * w, s_ref[...],
                           preferred_element_type=jnp.float32)  # (BC, K)


def _coll_kernel(i0_ref, fi_ref, ii0_ref, fii_ref, jj0_ref, fjj_ref,
                 j0_ref, fj_ref, t_ref, s_ref, out_ref, *, BC, K):
    P = DENSIZE * RIMSIZE * RCOLLSIZE
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (BC, ISIZE), 1)
    wk = _pair_rows(i0_ref[...], fi_ref[...], iota_i)
    a = jnp.dot(wk, t_ref[...], preferred_element_type=jnp.float32)

    # lane q -> p = q % P with p = (jj*RIMSIZE + ii)*RCOLLSIZE + rr
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (BC, K * P), 1)
    p = iota_q - (iota_q // P) * P
    pr = p - (p // RCOLLSIZE) * RCOLLSIZE
    pji = p // RCOLLSIZE
    pj = pji // RIMSIZE
    pi = pji - pj * RIMSIZE
    w = (_pair_rows(jj0_ref[...], fjj_ref[...], pj)
         * _pair_rows(ii0_ref[...], fii_ref[...], pi)
         * _pair_rows(j0_ref[...], fj_ref[...], pr))
    r = jnp.dot(a * w, s_ref[...], preferred_element_type=jnp.float32)
    # values are stored log10 (p3_init_a); exponentiate in-kernel
    out_ref[...] = jnp.exp(r * np.float32(np.log(10.0)))


def _rain_kernel(i0_ref, fi_ref, t_ref, out_ref, *, BC, size):
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (BC, size), 1)
    wk = _pair_rows(i0_ref[...], fi_ref[...], iota_i)
    out_ref[...] = jnp.dot(wk, t_ref[...],
                           preferred_element_type=jnp.float32)


def _chunked(kernel, arrays, consts, BC, K, interpret):
    """Run the kernel over all cells, chunked via p3_tables._map_cells.

    The kernel's (cells, 1) column operands acquire XLA's T(8,128) tiling
    at the custom-call boundary -- a 128x padded HBM copy PER OPERAND
    (measured: 2.0 GB each at 4.2M cells; the 8-operand collect call
    needed 18 GB and OOMed the chip).  Chunking the *call* bounds those
    copies (MWML_P3_CHUNK_PALLAS cells/chunk, default 131072 -> 64 MB per
    operand copy) while the grid inside each call still walks BC-cell
    blocks."""
    from .p3_tables import _map_cells

    def fn(*flat):
        n = flat[0].shape[0]
        pad = (-n) % BC
        cols = [jnp.pad(a, (0, pad)).reshape(-1, 1) for a in flat]
        out = _call(kernel, cols, consts, cols[0].shape[0] // BC, BC, K,
                    interpret)
        return out[:n]

    n_chunk = int(os.environ.get("MWML_P3_CHUNK_PALLAS", 131072))
    return _map_cells(fn, list(arrays), K, n_chunk)


def _segment_selector(K, P):
    s = np.zeros((K * P, K), np.float32)
    for k in range(K):
        s[k * P:(k + 1) * P, k] = 1.0
    return jnp.asarray(s)


def _call(kernel, flat, consts, nblocks, BC, K, interpret):
    """Shared pallas_call plumbing: per-block (BC, 1) operand columns +
    whole-array constant operands (table, selector)."""
    in_specs = [pl.BlockSpec((BC, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM)] * len(flat)
    for c in consts:
        in_specs.append(pl.BlockSpec(c.shape, lambda b: (0, 0),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BC, K), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * BC, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*flat, *consts)


def interp_ice_pallas(tables, cols, i0, fi, ii0, fii, jj0, fjj,
                      interpret: bool = False):
    """Trilinear ice-table interpolation in one VMEM-resident kernel;
    same contract as p3_tables.interp_ice_multi."""
    K = len(cols)
    P = DENSIZE * RIMSIZE
    BC = _bc(K * P)
    # (densize, rimsize, isize, K) -> (isize, K, densize*rimsize): column
    # k occupies lanes [k*P, (k+1)*P), plane-major (jj*RIMSIZE + ii)
    tsel = np.moveaxis(tables.ice[..., [c - 1 for c in cols]], 2, 0)
    tsel = tsel.reshape(ISIZE, P, K).transpose(0, 2, 1)
    T = jnp.asarray(np.ascontiguousarray(tsel).reshape(ISIZE, -1),
                    jnp.float32)

    out = _chunked(functools.partial(_ice_kernel, BC=BC, K=K),
                   [i0.astype(jnp.int32), fi.astype(jnp.float32),
                    ii0.astype(jnp.int32), fii.astype(jnp.float32),
                    jj0.astype(jnp.int32), fjj.astype(jnp.float32)],
                   [T, _segment_selector(K, P)], BC, K, interpret)
    return tuple(out[..., k] for k in range(K))


def interp_collect_pallas(tables, cols, i0, fi, ii0, fii, jj0, fjj, j0, fj,
                          interpret: bool = False):
    """Quadrilinear ice-rain collection interpolation in one kernel;
    same contract as p3_tables.interp_collect_multi (exponentiated)."""
    K = len(cols)
    P = DENSIZE * RIMSIZE * RCOLLSIZE
    BC = _bc(K * P)
    # (densize, rimsize, isize, rcollsize, K) -> (isize, K, P) with
    # plane p = (jj*RIMSIZE + ii)*RCOLLSIZE + rr
    tsel = np.moveaxis(tables.collect[..., [c - 1 for c in cols]], 2, 0)
    tsel = tsel.reshape(ISIZE, P, K).transpose(0, 2, 1)
    T = jnp.asarray(np.ascontiguousarray(tsel).reshape(ISIZE, -1),
                    jnp.float32)

    out = _chunked(functools.partial(_coll_kernel, BC=BC, K=K),
                   [i0.astype(jnp.int32), fi.astype(jnp.float32),
                    ii0.astype(jnp.int32), fii.astype(jnp.float32),
                    jj0.astype(jnp.int32), fjj.astype(jnp.float32),
                    j0.astype(jnp.int32), fj.astype(jnp.float32)],
                   [T, _segment_selector(K, P)], BC, K, interpret)
    return tuple(out[..., k] for k in range(K))


# -- round-5 lane-blocked kernels ------------------------------------------
#
# The round-3 kernels above lose because each (cells, 1) column operand
# acquires a 128x-padded T(8,128) HBM copy at the custom-call boundary,
# and their corner weights are built at full K*P lane width (~20 VPU ops
# x 1200 lanes per cell for collect).  The round-5 formulation fixes both
# by TRANSPOSING the matmul -- cells ride the LANE axis in their natural
# (rows, 128) layout (zero padding, zero copies, the fused_cellwise
# operand discipline), the one-hot interpolation weights are built with
# the table axis on SUBLANES, and the contraction runs as
# ``T^T (K*P, isize) @ W^T (isize, 128)`` per 128-cell lane group with
# the table VMEM-resident.  Corner weights live at (P, 128) -- 20 lanes
# of sublanes, not 1200 lanes -- and the (jj, ii) reduction is a
# sublane-axis sum.  The A = Wk @ T intermediate (126 MB/chunk in the
# XLA matmul path -- its measured HBM wall) never exists outside VMEM.
#
# Rain rows use the Mosaic lane-gather (tpu.dynamic_gather along lanes,
# measured 22.5 Ggather/s on this chip -- scripts/probe_gather.py): the
# 300-entry row splits into 3 x 128-lane chunks selected by the index
# high bits.  The ice-rain COLLECT table joined the lane kernels in
# round 5b: the round-4 "MXU-flop-bound at ~23 Tflop/s" reading was a
# 37%-tile-fill artifact (queue 2), and the joint-contraction lane
# kernel with the table VMEM-resident measures 12.50 ms vs the XLA
# joint matmul's 16.17 standalone at 256^2x64 (queue 6) -- the
# (cells, 250)/(cells, 240) HBM round-trips were the remaining wall.
#
# Mosaic stack discipline (queues 5-6): scoped-VMEM stack is NOT reused
# across unrolled Python-loop iterations -- every multi-iteration loop
# in these kernels must be a fori_loop (or ride the pallas grid).


def _lane_blocks(arrays, dtype_map):
    """Flatten same-shape arrays to (rows, 128) lane blocks (pad tail)."""
    shape = arrays[0].shape
    n = int(np.prod(shape)) if shape else 1
    rows = -(-n // 128)
    pad = rows * 128 - n
    out = []
    for a, dt in zip(arrays, dtype_map):
        v = a.astype(dt).reshape(-1)
        if pad:
            v = jnp.pad(v, (0, pad))
        out.append(v.reshape(rows, 128))
    return out, shape, n, rows


def _lane_width(default: int = 1024) -> int:
    """Cells per grid step in the wide-lane kernels (lanes of each MXU
    dot).  1024 keeps every kernel's live set ~2-5 MB of scoped VMEM
    while amortizing the stationary-operand load over 8 lane-tiles."""
    return int(os.environ.get("MWML_P3_LANE_L", 1024))


def _pair_cols(x0, f, iota):
    """(rows, L) one-hot-pair columns: 1-f where iota==x0, f at x0+1,
    for (1, L) per-cell index/frac rows broadcast up the sublane axis."""
    return (jnp.where(iota == x0, 1.0 - f, 0.0)
            + jnp.where(iota == x0 + 1, f, 0.0))


def _wide_call(kernel, arrays, dtypes, consts, K, L, interpret):
    """Run a wide-lane kernel over all cells: operands are (nrows, L)
    lane blocks of the flattened cell axis in their NATURAL T(8,128)
    tiling (no padded operand copies at the custom-call boundary; both
    the (cells, 1) column and (1, cells) row layouts acquire 128x / 8x
    padded HBM copies there).  Each grid step sees an (8, L) block and
    loops its sublane rows, so every MXU dot still covers L cells."""
    R = 8
    shape = arrays[0].shape
    n = int(np.prod(shape)) if shape else 1
    nrows = -(-n // L)
    nrows += (-nrows) % R
    pad = nrows * L - n
    flat = []
    for a, dt in zip(arrays, dtypes):
        v = a.astype(dt).reshape(-1)
        if pad:
            v = jnp.pad(v, (0, pad))
        flat.append(v.reshape(nrows, L))
    out = pl.pallas_call(
        kernel,
        grid=(nrows // R,),
        in_specs=[pl.BlockSpec((R, L), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)] * len(flat)
        + [pl.BlockSpec(c.shape, lambda b: (0, 0),
                        memory_space=pltpu.VMEM) for c in consts],
        out_specs=pl.BlockSpec((K, R, L), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, nrows, L), jnp.float32),
        interpret=interpret,
    )(*flat, *consts)
    flat_out = out.reshape(K, -1)[:, :n]
    return tuple(flat_out[k].reshape(shape) for k in range(K))


def _ice_wide_kernel(i0_ref, fi_ref, ii0_ref, fii_ref, jj0_ref, fjj_ref,
                     t_ref, out_ref, *, L, K):
    P = DENSIZE * RIMSIZE
    t = t_ref[...]                                          # (K*P, ISIZE)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (ISIZE, L), 0)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (P, L), 0)
    pj = iota_p // RIMSIZE
    pi = iota_p - pj * RIMSIZE

    # fori_loop (NOT an unrolled Python loop) over the block's sublane
    # rows: Mosaic does not reuse its scoped stack across unrolled
    # iterations, and one iteration's temps are ~2.3 MB at L=1024
    def body(s, carry):
        wk = _pair_cols(i0_ref[pl.ds(s, 1), :], fi_ref[pl.ds(s, 1), :],
                        iota_i)                             # (ISIZE, L)
        a = jnp.dot(t, wk,
                    preferred_element_type=jnp.float32)     # (K*P, L)
        w = (_pair_cols(jj0_ref[pl.ds(s, 1), :], fjj_ref[pl.ds(s, 1), :],
                        pj)
             * _pair_cols(ii0_ref[pl.ds(s, 1), :],
                          fii_ref[pl.ds(s, 1), :], pi))     # (P, L)
        r = jnp.sum(a.reshape(K, P, L) * w[None], axis=1)   # (K, L)
        out_ref[:, pl.ds(s, 1), :] = r[:, None, :]
        return carry

    jax.lax.fori_loop(0, 8, body, 0)


def interp_ice_lane(tables, cols, i0, fi, ii0, fii, jj0, fjj,
                    interpret: bool = False):
    """Trilinear ice-table interpolation, lane-blocked transposed-matmul
    kernel; same contract as p3_tables.interp_ice_multi (f32).

    Round-5b wide-lane form: one (1, L=1024) operand block per grid step
    (vs the 8-sublane-loop original), so each MXU dot covers 1024 cells
    -- the stationary (K*P, ISIZE) table load amortizes over 8 lane
    tiles and the sublane-slice loop disappears."""
    K = len(cols)
    P = DENSIZE * RIMSIZE
    L = _lane_width()
    # row k*P + p, p = jj*RIMSIZE + ii; columns = the isize axis
    tsel = np.moveaxis(tables.ice[..., [c - 1 for c in cols]], 3, 0)
    T = jnp.asarray(np.ascontiguousarray(tsel).reshape(K * P, ISIZE),
                    jnp.float32)
    return _wide_call(
        functools.partial(_ice_wide_kernel, L=L, K=K),
        [i0, fi, ii0, fii, jj0, fjj],
        [jnp.int32, jnp.float32, jnp.int32, jnp.float32, jnp.int32,
         jnp.float32],
        [T], K, L, interpret)


def _coll_lane_kernel(i0_ref, fi_ref, ii0_ref, fii_ref, jj0_ref, fjj_ref,
                      j0_ref, fj_ref, t_ref, out_ref, *, L, K, decode):
    JOINT = DENSIZE * ISIZE
    P2 = RIMSIZE * RCOLLSIZE
    t = t_ref[...]                                       # (K*P2, JOINT)
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (JOINT, L), 0)
    qd = iota_q // ISIZE
    qi = iota_q - qd * ISIZE
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (DENSIZE, L), 0)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (ISIZE, L), 0)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (P2, L), 0)
    pi = iota_p // RCOLLSIZE
    pr = iota_p - pi * RCOLLSIZE

    # fori_loop over sublane rows -- see _ice_wide_kernel (one
    # iteration's temps are ~5 MB at L=1024; 8 unrolled would blow the
    # 16M scoped-VMEM stack)
    def body(s, carry):
        if decode:
            # digit-decode build: pair rows at full JOINT width (more
            # VPU work, but only rank-2 ops -- Mosaic-conservative form)
            W = (_pair_cols(jj0_ref[pl.ds(s, 1), :],
                            fjj_ref[pl.ds(s, 1), :], qd)
                 * _pair_cols(i0_ref[pl.ds(s, 1), :],
                              fi_ref[pl.ds(s, 1), :], qi))  # (JOINT, L)
        else:
            # broadcast-reshape build: small per-axis pair rows
            # outer-product up to the joint axis (5x fewer VPU ops)
            wj = _pair_cols(jj0_ref[pl.ds(s, 1), :],
                            fjj_ref[pl.ds(s, 1), :], iota_d)  # (5, L)
            wk = _pair_cols(i0_ref[pl.ds(s, 1), :],
                            fi_ref[pl.ds(s, 1), :], iota_i)   # (50, L)
            W = (wj[:, None, :] * wk[None, :, :]).reshape(JOINT, L)
        a = jnp.dot(t, W,
                    preferred_element_type=jnp.float32)  # (K*P2, L)
        w2 = (_pair_cols(ii0_ref[pl.ds(s, 1), :],
                         fii_ref[pl.ds(s, 1), :], pi)
              * _pair_cols(j0_ref[pl.ds(s, 1), :],
                           fj_ref[pl.ds(s, 1), :], pr))  # (P2, L)
        r = jnp.sum(a.reshape(K, P2, L) * w2[None], axis=1)
        # values are stored log10 (p3_init_a); exponentiate in-kernel
        out_ref[:, pl.ds(s, 1), :] = jnp.exp(
            r * np.float32(np.log(10.0)))[:, None, :]
        return carry

    jax.lax.fori_loop(0, 8, body, 0)


def interp_collect_lane(tables, cols, i0, fi, ii0, fii, jj0, fjj, j0, fj,
                        interpret: bool = False):
    """Quadlinear ice-rain collection interpolation, lane-blocked kernel;
    same contract as p3_tables.interp_collect_multi (exponentiated, f32).

    Contracts over the JOINT (densize, isize) = 250 axis exactly like the
    MXU-tiling-aware XLA matmul (98%x94% tile fill), but with the table
    VMEM-resident and the (cells, 250) joint-weight / (cells, 240)
    corner-product intermediates never leaving VMEM -- the XLA form's
    measured HBM wall (BASELINE.md round-5 queue 2).  Replaces the table
    access of micro_p3.F90:1560-1773 (access_lookup_table_coll)."""
    K = len(cols)
    P2 = RIMSIZE * RCOLLSIZE
    L = _lane_width()
    # weight-build default: digit-decode measured 12.50 ms vs the
    # broadcast-reshape build's 13.62 standalone at 256^2x64 (r05
    # queue 6) -- the (5,50,L)->(250,L) reshape relayout costs more
    # than the extra pair-row VPU ops it saves
    decode = os.environ.get("MWML_P3_COLL_BUILD", "decode") == "decode"
    # rows k*P2 + ii*RCOLLSIZE + rr; columns = joint jj*ISIZE + i
    tsel = np.transpose(tables.collect[..., [c - 1 for c in cols]],
                        (4, 1, 3, 0, 2))   # (K, rim, rcoll, den, isize)
    T = jnp.asarray(np.ascontiguousarray(tsel).reshape(K * P2,
                                                       DENSIZE * ISIZE),
                    jnp.float32)
    return _wide_call(
        functools.partial(_coll_lane_kernel, L=L, K=K, decode=decode),
        [i0, fi, ii0, fii, jj0, fjj, j0, fj],
        [jnp.int32, jnp.float32, jnp.int32, jnp.float32, jnp.int32,
         jnp.float32, jnp.int32, jnp.float32],
        [T], K, L, interpret)


def _rain_lane_kernel(i0_ref, fi_ref, t_ref, out_ref, *, R, K, nchunks,
                      size):
    idx = i0_ref[...]                                    # (R, 128) int32
    fi = fi_ref[...]
    idx0 = jnp.minimum(idx, size - 2)
    vals = []
    for corner in range(2):
        ic = idx0 + corner
        hi = ic // 128
        lo = ic - hi * 128
        acc = [jnp.zeros((R, 128), jnp.float32) for _ in range(K)]
        for h in range(nchunks):
            mask = hi == h
            for k in range(K):
                tab = jnp.broadcast_to(t_ref[k * nchunks + h:
                                             k * nchunks + h + 1, :],
                                       (R, 128))
                g = jnp.take_along_axis(tab, lo, axis=1)
                acc[k] = acc[k] + jnp.where(mask, g, 0.0)
        vals.append(acc)
    for k in range(K):
        out_ref[k, :, :] = vals[0][k] + fi * (vals[1][k] - vals[0][k])


def interp_rain_lane(rows_in, i0, fi, interpret: bool = False):
    """1-D rain-row linear interpolation via Mosaic lane-gathers; same
    contract as p3_tables.interp_rain_multi (f32)."""
    K = len(rows_in)
    T0 = np.stack([np.asarray(r, np.float32) for r in rows_in])  # (K, size)
    size = T0.shape[1]
    nchunks = -(-size // 128)
    Tp = np.zeros((K * nchunks, 128), np.float32)
    for k in range(K):
        for h in range(nchunks):
            seg = T0[k, h * 128:(h + 1) * 128]
            Tp[k * nchunks + h, :seg.size] = seg
    T = jnp.asarray(Tp)
    blks, shape, n, rows = _lane_blocks([i0, fi], [jnp.int32, jnp.float32])
    R = 8
    rpad = (-rows) % R
    if rpad:
        blks = [jnp.pad(b, ((0, rpad), (0, 0))) for b in blks]
    nrows = rows + rpad
    kernel = functools.partial(_rain_lane_kernel, R=R, K=K,
                               nchunks=nchunks, size=size)
    out = pl.pallas_call(
        kernel,
        grid=(nrows // R,),
        in_specs=[pl.BlockSpec((R, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((K * nchunks, 128), lambda b: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((K, R, 128), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, nrows, 128), jnp.float32),
        interpret=interpret,
    )(*blks, T)
    flat = out.reshape(K, -1)[:, :n]
    return tuple(flat[k].reshape(shape) for k in range(K))


def interp_rain_pallas(rows, i0, fi, interpret: bool = False):
    """1-D rain-table linear interpolation for several equal-length rows
    sharing one index set; returns a tuple in ``rows`` order.  The row
    length is taken from the rows themselves (300 for the generated rain
    tables, p3_init_b micro_p3.F90:236-334), matching interp_rain_multi."""
    K = len(rows)
    T = jnp.asarray(np.stack([np.asarray(r, np.float32) for r in rows],
                             axis=1), jnp.float32)        # (size, K)
    size = T.shape[0]
    BC = _bc(size)

    i0 = jnp.clip(i0, 0, size - 2)  # matches interp_rain_multi
    out = _chunked(functools.partial(_rain_kernel, BC=BC, size=size),
                   [i0.astype(jnp.int32), fi.astype(jnp.float32)],
                   [T], BC, K, interpret)
    return tuple(out[..., k] for k in range(K))
