"""miniweatherml_tpu: a TPU-native (JAX/XLA) mini weather model + ML
surrogate playground with the capabilities of mrnorman/miniWeatherML.

Top-level pieces:
  core      -- functional coupler state (named fields + options + tracers)
  ops       -- numerics: GLL, WENO-as-linear-algebra, stencil/BC padding
  dycore    -- compressible-Euler WENO FV dynamical core + test cases
  physics   -- Kessler microphysics, sponge, column nudging, perturbations
  parallel  -- device mesh / sharding helpers (2-D spatial + ensemble)
  ml        -- surrogate workflow: stats, data gen, training, inline MLP
  io        -- NetCDF output, checkpoint/restore
  experiments -- drivers mirroring the reference experiments
"""

import os as _os

# MWML_PLATFORM=cpu pins the JAX backend before initialization -- the only
# way to keep a run off the TPU under the axon plugin, which ignores the
# JAX_PLATFORMS env var.  Useful for driving the experiment CLIs on hosts
# where the chip (or its tunnel) is unavailable.  Must run before any
# jax.devices() call, hence at package import.
if _os.environ.get("MWML_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["MWML_PLATFORM"])

from .core.coupler import (CouplerState, CouplerMeta, Grid, Options,  # noqa: F401
                           TracerMeta, make_coupler_state)
from .config import SimConfig, load_config  # noqa: F401

__version__ = "0.1.0"
