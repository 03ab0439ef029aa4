"""Kessler microphysics MLP surrogate: inline NN inference in the jitted step.

TPU-native re-design of the reference's ponni-based drop-in micro
(experiments/supercell_kessler_surrogate/custom_modules/
microphysics_kessler_ponni.h): per cell, the 5 inputs
[T, rho_d, rho_v, rho_c, rho_p] are min-max normalized
(:177-187), pushed through the MLP (5 -> 10 LeakyReLU(0.1) -> 4, :103-111),
denormalized and clamped >= 0 (:196-202).  The reference also runs the real
Kessler scheme every step and prints the mean NN-truth differences
(:244-269), with the actual online override left commented out (:271-276);
here both behaviors are first-class options.

Everything -- normalization, matmuls, clamp, the reference Kessler for
comparison -- runs inside one jit region; the MXU executes the batched
(ncell, 5) @ (5, hidden) matmuls.  Mean diffs are stored in the coupler
field ``surrogate_diffs`` (4,) per step [temp, rho_v, rho_c, rho_p] for the
driver to print, keeping the module functionally pure.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.coupler import CouplerState
from ..ml.mlp import MLP
from .kessler import MicrophysicsKessler

__all__ = ["MicrophysicsKesslerSurrogate"]


class MicrophysicsKesslerSurrogate(MicrophysicsKessler):
    """Drop-in replacement for MicrophysicsKessler (same tracer registry and
    constants, reference microphysics_kessler_ponni.h:16,75-95).

    Args:
      model: MLP pytree (ml.mlp.MLP).
      scl_in:  (5, 2) [min, max] input scaling [T, rho_d, rho_v, rho_c, rho_p].
      scl_out: (4, 2) [min, max] output scaling [T, rho_v, rho_c, rho_p].
      online: if True the NN output becomes the new state (the deploy mode
        the reference leaves commented out, :271-276); if False the real
        Kessler result is kept (the reference's comparison mode).
      compare: also run the reference Kessler and store mean NN-truth diffs
        in the ``surrogate_diffs`` field (always True when online=False,
        since the Kessler result is needed anyway).
    """

    def __init__(self, model: MLP, scl_in, scl_out,
                 online: bool = True, compare: bool = False):
        self.model = model
        self.scl_in = jnp.asarray(scl_in)
        self.scl_out = jnp.asarray(scl_out)
        self.online = online
        self.compare = compare or not online

    def init(self, state: CouplerState) -> CouplerState:
        state = super().init(state)
        state = state.set_options(micro="kessler_surrogate")
        return state.register_field("surrogate_diffs", value=jnp.zeros(4))

    def _nn_forward(self, state: CouplerState):
        """Normalized-MLP-denormalized prediction of (temp, rho_v, rho_c,
        rho_r), clamped non-negative (microphysics_kessler_ponni.h:177-202)."""
        dt = state.meta.jdtype
        scl_in = self.scl_in.astype(dt)
        scl_out = self.scl_out.astype(dt)
        cols = [state[n] for n in ("temp", "density_dry", "water_vapor",
                                   "cloud_liquid", "precip_liquid")]
        x = jnp.stack(cols, axis=-1)  # (nens, nz, ny, nx, 5)
        x = (x - scl_in[:, 0]) / (scl_in[:, 1] - scl_in[:, 0])
        y = self.model(x)             # (nens, nz, ny, nx, 4)
        y = y * (scl_out[:, 1] - scl_out[:, 0]) + scl_out[:, 0]
        temp = y[..., 0]
        rho_v = jnp.maximum(y[..., 1], 0.0)
        rho_c = jnp.maximum(y[..., 2], 0.0)
        rho_r = jnp.maximum(y[..., 3], 0.0)
        return temp, rho_v, rho_c, rho_r

    def time_step(self, state: CouplerState, dt: float,
                  spmd_axes: tuple = ()) -> CouplerState:
        nn_temp, nn_rho_v, nn_rho_c, nn_rho_r = self._nn_forward(state)

        if self.compare:
            truth = super().time_step(state, dt, spmd_axes=spmd_axes)
            size = nn_temp.size
            diffs = jnp.stack([
                jnp.sum(nn_temp - truth["temp"]) / size,
                jnp.sum(nn_rho_v - truth["water_vapor"]) / size,
                jnp.sum(nn_rho_c - truth["cloud_liquid"]) / size,
                jnp.sum(nn_rho_r - truth["precip_liquid"]) / size,
            ])
            import jax
            for ax_name in spmd_axes:
                diffs = jax.lax.pmean(diffs, ax_name)
        else:
            truth = None
            diffs = state["surrogate_diffs"]

        if self.online:
            out = state.replace_fields(
                temp=nn_temp, water_vapor=nn_rho_v,
                cloud_liquid=nn_rho_c, precip_liquid=nn_rho_r)
        else:
            out = truth
        return out.replace_fields(surrogate_diffs=diffs)
