"""Pallas TPU kernel for the Kessler scheme's sub-cycled column loop.

The XLA formulation (physics/kessler.py) runs the rainsplit sub-cycle as a
``lax.while_loop`` whose carry (7 full fields) round-trips HBM every
iteration.  This kernel keeps a tile of columns resident in VMEM across
ALL sub-cycles: one read of the inputs, ``rainsplit`` iterations of the
KW1978 microphysics arithmetic on-chip, one write of the outputs.

The iteration count is data-dependent (reference microphysics_kessler.h:
276-280: a global min-reduction feeds the sub-cycle count); it is computed
outside (same reduction as the XLA path) and enters the kernel as an SMEM
scalar driving an in-kernel ``lax.fori_loop`` -- every block runs the same
trip count, exactly like the reference.

Bitwise-equal math to kessler_column's loop body (tests/test_kessler.py
compares the two paths).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

__all__ = ["kessler_subcycle_pallas"]


def _kernel(rs_ref, th_ref, qv_ref, qc_ref, qr_ref, rho_ref, pk_ref,
            tho_ref, qvo_ref, qco_ref, qro_ref, precl_ref, *, nz, dt, dz,
            Rd, cp, p0):
    """Block layout: (1, nz, By, Lx) with the column whole in the block."""
    rainsplit = rs_ref[0]
    dt0 = dt / rainsplit.astype(th_ref.dtype)

    th = th_ref[...]
    qv = qv_ref[...]
    qc = qc_ref[...]
    qr = qr_ref[...]
    rho = rho_ref[...]
    pk = pk_ref[...]

    psl = p0 / 100.0
    rhoqr = 1000.0
    lv = 2.5e6
    r = 0.001 * rho
    rhalf = jnp.sqrt(rho[:, 0:1] / rho)
    pc = 3.8 / (pk ** (cp / Rd) * psl)

    def tv(qr_):
        return 36.34 * (qr_ * r) ** 0.1364 * rhalf

    def body(_, carry):
        th, qv, qc, qr, precl = carry
        velqr = tv(qr)

        precl = precl + rho[:, 0:1] * qr[:, 0:1] * velqr[:, 0:1] / rhoqr
        flux = r * qr * velqr
        sed_int = dt0 * (flux[:, 1:nz] - flux[:, 0:nz - 1]) / (
            r[:, 0:nz - 1] * dz)
        sed_top = -dt0 * qr[:, nz - 1:nz] * velqr[:, nz - 1:nz] / (0.5 * dz)
        sed = jnp.concatenate([sed_int, sed_top], axis=1)

        qrprod = qc - (qc - dt0 * jnp.maximum(0.001 * (qc - 0.001), 0.0)) / (
            1.0 + dt0 * 2.2 * qr ** 0.875)
        qc = jnp.maximum(qc - qrprod, 0.0)
        qr = jnp.maximum(qr + qrprod + sed, 0.0)

        tmp = pk * th - 36.0
        qvs = pc * jnp.exp(17.27 * (pk * th - 273.0) / tmp)
        prod = (qv - qvs) / (1.0 + qvs * (4093.0 * lv / cp) / (tmp * tmp))

        tmp1 = dt0 * (((1.6 + 124.9 * (r * qr) ** 0.2046)
                       * (r * qr) ** 0.525)
                      / (2550000.0 * pc / (3.8 * qvs) + 540000.0)) * (
            jnp.maximum(qvs - qv, 0.0) / (r * qvs))
        ern = jnp.minimum(tmp1,
                          jnp.minimum(jnp.maximum(-prod - qc, 0.0), qr))

        cond = jnp.maximum(prod, -qc)
        th = th + lv / (cp * pk) * (cond - ern)
        qv = jnp.maximum(qv - cond + ern, 0.0)
        qc = qc + cond
        qr = qr - ern
        return th, qv, qc, qr, precl

    precl0 = jnp.zeros_like(th[:, 0:1])
    th, qv, qc, qr, precl = jax.lax.fori_loop(
        0, rainsplit, body, (th, qv, qc, qr, precl0))

    tho_ref[...] = th
    qvo_ref[...] = qv
    qco_ref[...] = qc
    qro_ref[...] = qr
    precl_ref[...] = precl / rainsplit.astype(th.dtype)


def kessler_subcycle_pallas(theta, qv, qc, qr, rho, pk, rainsplit, dt, dz,
                            Rd, cp, p0, row_block: int = 8,
                            lane_block: int = 128):
    """Run the KW1978 sub-cycled loop with columns resident in VMEM.

    Args:
      theta/qv/qc/qr/rho/pk: (nens, nz, ny, nx), bottom-up columns on the
        z axis; uniform grid (constant dz, as every reference experiment
        uses -- the XLA path handles the general z spacing).
      rainsplit: traced int32 scalar (global sub-cycle count).
      dt: physics step; dz: layer thickness.

    Returns (theta, qv, qc, qr, precl) with precl shaped (nens, ny, nx).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nens, nz, ny, nx = theta.shape
    By = min(row_block, ny)
    Lt = min(lane_block, nx)
    grid = (nens, math.ceil(ny / By), math.ceil(nx / Lt))

    kernel = functools.partial(_kernel, nz=nz, dt=dt, dz=dz, Rd=Rd, cp=cp,
                               p0=p0)
    spec = pl.BlockSpec((1, nz, By, Lt), lambda e, y, x: (e, 0, y, x),
                        memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, 1, By, Lt), lambda e, y, x: (e, 0, y, x),
                            memory_space=pltpu.VMEM)
    rs = jnp.asarray(rainsplit, jnp.int32).reshape(1)
    th, qv, qc, qr, precl = pl.pallas_call(
        kernel,
        grid=grid,
        # let the theta/exner/mixing-ratio prep fuse into the input reads
        compiler_params=pltpu.CompilerParams(
            allow_input_fusion=[False] + [True] * 6),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 6,
        out_specs=[spec] * 4 + [col_spec],
        out_shape=[jax.ShapeDtypeStruct(theta.shape, theta.dtype)] * 4
        + [jax.ShapeDtypeStruct((nens, 1, ny, nx), theta.dtype)],
        interpret=jax.devices()[0].platform != "tpu",
    )(rs, theta, qv, qc, qr, rho, pk)
    return th, qv, qc, qr, precl[:, 0]
