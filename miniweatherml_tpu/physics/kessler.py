"""Kessler warm-rain microphysics (KW 1978), TPU-native.

Re-design of the reference ``Microphysics_Kessler``
(model/modules/microphysics_kessler.h): autoconversion + accretion,
saturation adjustment, rain evaporation, and rain sedimentation with internal
CFL sub-cycling.  Column physics: operates on (nens, nz, ny, nx) fields with
everything vectorized over (nens, ny, nx); the vertical sedimentation uses
shifted slices (upstream differencing), so there is no scan over z.

The reference derives the sub-cycle count from a device-wide min reduction
feeding host control flow (microphysics_kessler.h:276-280); here the same
reduction feeds a ``jax.lax.while_loop`` so the whole scheme stays inside one
jitted step.  Note: the reference reduces per MPI rank (each rank can choose
a different rainsplit); with global arrays the min is global -- at least as
conservative, identical for single-rank runs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.coupler import CouplerState

__all__ = ["MicrophysicsKessler", "kessler_column"]


class MicrophysicsKessler:
    """Registers water_vapor / cloud_liquid / precip_liquid tracers and the
    ``precl`` precipitation-rate field (reference microphysics_kessler.h:51-95).

    ``impl``: "xla" (lax.while_loop sub-cycling), "pallas" (VMEM-resident
    sub-cycle kernel, physics/kessler_pallas.py), or "auto" (= xla).
    Identical arithmetic.  The Pallas kernel wins in isolation on TPU
    (7.0 vs 9.0 ms at 512x512x64 -- no per-subcycle HBM round-trip) but
    LOSES inside the full physics chain (its call boundary blocks XLA from
    fusing the scheme's prep/post elementwise passes with the neighboring
    ops), so the fused while_loop stays the default; "pallas" is the
    right choice when rainsplit is large (heavy rain, small dz)."""

    # physical constants (reference microphysics_kessler.h:30-41)
    R_d, cp_d = 287.0, 1003.0
    R_v, cp_v = 461.0, 1859.0
    p0, grav = 1.0e5, 9.81

    num_tracers = 3

    # class default so subclasses with their own __init__ (e.g. the
    # surrogate micro) inherit the implementation choice
    impl = "auto"

    def __init__(self, impl: str = "auto"):
        if impl not in ("auto", "xla", "pallas"):
            raise ValueError("impl must be 'auto', 'xla' or 'pallas'")
        self.impl = impl

    def init(self, state: CouplerState) -> CouplerState:
        g = state.grid
        state = state.add_tracer("water_vapor", "Water Vapor", True, True)
        state = state.add_tracer("cloud_liquid", "Cloud liquid", True, True)
        state = state.add_tracer("precip_liquid", "precip_liquid", True, True)
        state = state.register_field("precl", shape=(g.nens, g.ny, g.nx))
        cv_d = self.cp_d - self.R_d
        return state.set_options(
            micro="kessler",
            R_d=self.R_d, cp_d=self.cp_d, cv_d=cv_d,
            gamma_d=self.cp_d / cv_d, kappa_d=self.R_d / self.cp_d,
            R_v=self.R_v, cp_v=self.cp_v, cv_v=self.R_v - self.cp_v,
            p0=self.p0, grav=self.grav,
        )

    def time_step(self, state: CouplerState, dt: float,
                  spmd_axes: tuple = ()) -> CouplerState:
        """(reference microphysics_kessler.h:99-162)

        ``spmd_axes``: mesh axis names to pmin the sedimentation sub-cycle
        count over when running inside shard_map (the reference's per-rank
        reduction becomes a global one, matching the global-array path)."""
        g = state.grid
        rho_d = state["density_dry"]
        temp = state["temp"]
        rho_v = state["water_vapor"]
        rho_c = state["cloud_liquid"]
        rho_r = state["precip_liquid"]

        qv = rho_v / rho_d
        qc = rho_c / rho_d
        qr = rho_r / rho_d
        pressure = self.R_d * rho_d * temp + self.R_v * rho_v * temp
        exner = (pressure / self.p0) ** (self.R_d / self.cp_d)
        theta = temp / exner
        zmid = ((jnp.arange(g.nz, dtype=temp.dtype) + 0.5) * g.dz)[None, :, None, None]

        if self.impl == "pallas":
            from .kessler_pallas import kessler_subcycle_pallas

            # The Pallas sub-cycle kernel sediments with a scalar dz
            # (reference kessler.h:296-299 uses z(k+1)-z(k)); Grid is
            # uniform by construction today, but a stretched vertical
            # coordinate (per-level dz array) introduced later must not
            # silently select this path.
            import numpy as _np
            if _np.ndim(g.dz) != 0:
                raise ValueError(
                    "impl='pallas' requires a uniform vertical grid "
                    "(scalar Grid.dz)")

            rainsplit = kessler_rainsplit(qr, rho_d, zmid, dt,
                                          spmd_axes=spmd_axes)
            theta, qv, qc, qr, precl = kessler_subcycle_pallas(
                theta, qv, qc, qr, rho_d, exner, rainsplit, dt, g.dz,
                self.R_d, self.cp_d, self.p0)
        else:
            theta, qv, qc, qr, precl = kessler_column(
                theta, qv, qc, qr, rho_d, zmid, exner, dt,
                self.R_d, self.cp_d, self.p0, z_axis=1,
                spmd_axes=spmd_axes,
            )

        return state.replace_fields(
            water_vapor=qv * rho_d,
            cloud_liquid=qc * rho_d,
            precip_liquid=qr * rho_d,
            # theta is defined against the pre-micro exner (see reference
            # microphysics_kessler.h:158-160)
            temp=theta * exner,
            precl=precl,
        )


def kessler_rainsplit(qr, rho, z, dt, spmd_axes: tuple = ()):
    """The sedimentation sub-cycle count (reference
    microphysics_kessler.h:262-280): max stable sub-step from the min over
    cells below the top of 0.8 dz / velqr, then rainsplit = ceil(dt/max).
    Same arithmetic as kessler_column's prologue; shared by the Pallas
    path, which needs the count outside the kernel."""
    nz = qr.shape[1]
    r = 0.001 * rho
    rhalf = jnp.sqrt(rho[:, 0:1] / rho)
    velqr = 36.34 * (qr * r) ** 0.1364 * rhalf
    dz_lev = z[:, 1:nz] - z[:, 0:nz - 1]
    vel_lo = velqr[:, 0:nz - 1]
    dt2d = jnp.where(vel_lo > 1e-10, 0.8 * dz_lev / vel_lo, dt)
    dt_max = jnp.minimum(jnp.min(dt2d), dt)
    for ax_name in spmd_axes:
        dt_max = jax.lax.pmin(dt_max, ax_name)
    return jnp.ceil(dt / dt_max).astype(jnp.int32)


def kessler_column(theta, qv, qc, qr, rho, z, pk, dt, Rd, cp, p0, z_axis=0,
                   spmd_axes: tuple = ()):
    """The Kessler scheme itself (reference microphysics_kessler.h:234-339,
    after Klemp & Wilhelmson 1978 via Ullrich's kessler.f90 v2).

    All arrays share a shape with the vertical on ``z_axis``; every other
    axis is an independent column.  Returns updated (theta, qv, qc, qr) and
    ``precl`` (precipitation rate, m/s; shape without the z axis).
    """
    dtype = theta.dtype
    nz = theta.shape[z_axis]

    def ax(a, sl):
        idx = [slice(None)] * a.ndim
        idx[z_axis] = sl
        return a[tuple(idx)]

    psl = p0 / 100.0        # sea-level pressure, mb
    rhoqr = 1000.0          # liquid water density
    lv = 2.5e6              # latent heat of vaporization

    r = 0.001 * rho
    rhalf = jnp.sqrt(ax(rho, slice(0, 1)) / rho)
    pc = 3.8 / (pk ** (cp / Rd) * psl)

    def terminal_velocity(qr_):
        # KW eq. 2.15 (reference :260,331)
        return 36.34 * (qr_ * r) ** 0.1364 * rhalf

    velqr = terminal_velocity(qr)

    # Max stable sub-step (reference :262-268): min over cells below the top.
    dz_lev = ax(z, slice(1, nz)) - ax(z, slice(0, nz - 1))
    vel_lo = ax(velqr, slice(0, nz - 1))
    dt2d = jnp.where(vel_lo > 1e-10, 0.8 * dz_lev / vel_lo, dt)
    dt_max = jnp.minimum(jnp.min(dt2d), dt)
    for ax_name in spmd_axes:
        dt_max = jax.lax.pmin(dt_max, ax_name)
    rainsplit = jnp.ceil(dt / dt_max).astype(jnp.int32)
    dt0 = dt / rainsplit.astype(dtype)

    precl0 = jnp.zeros_like(ax(theta, slice(0, 1)))

    def body(carry):
        nt, theta, qv, qc, qr, velqr, precl = carry

        # Sedimentation, upstream differencing (reference :288-299).
        precl = precl + ax(rho, slice(0, 1)) * ax(qr, slice(0, 1)) * \
            ax(velqr, slice(0, 1)) / rhoqr
        flux = r * qr * velqr
        sed_int = dt0 * (ax(flux, slice(1, nz)) - ax(flux, slice(0, nz - 1))) / (
            ax(r, slice(0, nz - 1)) * dz_lev)
        sed_top = -dt0 * ax(qr, slice(nz - 1, nz)) * ax(velqr, slice(nz - 1, nz)) / (
            0.5 * (ax(z, slice(nz - 1, nz)) - ax(z, slice(nz - 2, nz - 1))))
        sed = jnp.concatenate([sed_int, sed_top], axis=z_axis)

        # Autoconversion + accretion, KW eq. 2.13 (reference :303-307).
        qrprod = qc - (qc - dt0 * jnp.maximum(0.001 * (qc - 0.001), 0.0)) / (
            1.0 + dt0 * 2.2 * qr ** 0.875)
        qc = jnp.maximum(qc - qrprod, 0.0)
        qr = jnp.maximum(qr + qrprod + sed, 0.0)

        # Saturation vapor mixing ratio, KW eq. 2.11 (reference :310-312).
        tmp = pk * theta - 36.0
        qvs = pc * jnp.exp(17.27 * (pk * theta - 273.0) / tmp)
        prod = (qv - qvs) / (1.0 + qvs * (4093.0 * lv / cp) / (tmp * tmp))

        # Rain evaporation, KW eq. 2.14 (reference :315-321).
        tmp1 = dt0 * (((1.6 + 124.9 * (r * qr) ** 0.2046) * (r * qr) ** 0.525)
                      / (2550000.0 * pc / (3.8 * qvs) + 540000.0)) * (
            jnp.maximum(qvs - qv, 0.0) / (r * qvs))
        ern = jnp.minimum(tmp1, jnp.minimum(jnp.maximum(-prod - qc, 0.0), qr))

        # Saturation adjustment, KW eq. 3.10 (reference :324-328).
        cond = jnp.maximum(prod, -qc)
        theta = theta + lv / (cp * pk) * (cond - ern)
        qv = jnp.maximum(qv - cond + ern, 0.0)
        qc = qc + cond
        qr = qr - ern

        velqr = terminal_velocity(qr)
        return nt + 1, theta, qv, qc, qr, velqr, precl

    def cond_fn(carry):
        return carry[0] < rainsplit

    _, theta, qv, qc, qr, velqr, precl = jax.lax.while_loop(
        cond_fn, body, (jnp.int32(0), theta, qv, qc, qr, velqr, precl0))

    precl = precl / rainsplit.astype(dtype)
    return theta, qv, qc, qr, jnp.squeeze(precl, axis=z_axis)
