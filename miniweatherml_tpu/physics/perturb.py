"""Temperature perturbations to seed convection
(reference model/modules/perturb_temperature.h).

* ``thermal``: deterministic +5 K cos^2 bubble, 10 km x 10 km x 1.5 km at
  z = 1.5 km, domain center (perturb_temperature.h:43-65).
* ``random``: counter-based random perturbation of the bottom nz/4 levels,
  magnitude 3 K scaled linearly to zero at the top of the region
  (perturb_temperature.h:26-41).  The reference uses yakl::Random keyed on a
  global cell id; here jax.random with a fixed seed gives an equally
  deterministic, statistically identical field.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.coupler import CouplerState

__all__ = ["perturb_temperature"]


def perturb_temperature(state: CouplerState, thermal: bool = True,
                        random: bool = False, seed: int = 0) -> CouplerState:
    g = state.grid
    dt = state.meta.jdtype
    temp = state["temp"]

    if random:
        num_levels = g.nz // 4
        magnitude = 3.0
        key = jax.random.PRNGKey(seed)
        rand = jax.random.uniform(
            key, (g.nens, num_levels, g.ny, g.nx), dtype=dt,
            minval=-1.0, maxval=1.0)
        k = jnp.arange(num_levels, dtype=dt)
        scaling = (num_levels - k) / num_levels
        temp = temp.at[:, :num_levels].add(
            rand * magnitude * scaling[None, :, None, None])

    if thermal:
        x = (jnp.arange(g.nx, dtype=dt) + 0.5) * g.dx
        y = (jnp.arange(g.ny, dtype=dt) + 0.5) * g.dy
        z = (jnp.arange(g.nz, dtype=dt) + 0.5) * g.dz
        xn = (x - g.xlen / 2) / 10000.0
        yn = (y - g.ylen / 2) / 10000.0
        zn = (z - 1500.0) / 1500.0
        rad = jnp.sqrt(xn[None, None, :] ** 2 + yn[None, :, None] ** 2
                       + zn[:, None, None] ** 2)
        amp = 5.0
        bump = jnp.where(rad < 1.0, amp * jnp.cos(jnp.pi * rad / 2.0) ** 2, 0.0)
        temp = temp + bump[None]

    return state.replace_fields(temp=temp)
