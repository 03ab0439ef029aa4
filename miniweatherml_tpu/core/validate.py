"""In-jit state validation: the DataManager::validate analog.

The reference's opt-in validation machinery checks every registered array
for NaN/Inf/negativity on host (model/core/DataManager.h:385-483).  The
host-side equivalent is ``CouplerState.validate()``; this module adds the
jit-compatible tier: per-field flag scalars computed on device inside the
compiled step (SURVEY.md section 5 -- "keep jax.debug/checkify NaN checks
as the analog of DataManager::validate").
"""

from __future__ import annotations

import jax.numpy as jnp

from .coupler import CouplerState

__all__ = ["validation_flags", "check_flags", "validated_step"]

FLAG_NAN = 1
FLAG_INF = 2
FLAG_NEG = 4


def validation_flags(state: CouplerState) -> dict:
    """Device-side flags per field: bitwise NaN/Inf/negative (positivity
    only for tracers registered positive, DataManager.h:131).  Usable inside
    jit; returns {field: int32 scalar}."""
    positive = {t.name for t in state.meta.tracers if t.positive}
    flags = {}
    for name, arr in state.fields.items():
        f = jnp.where(jnp.isnan(arr).any(), FLAG_NAN, 0)
        f = f | jnp.where(jnp.isinf(arr).any(), FLAG_INF, 0)
        if name in positive:
            f = f | jnp.where((arr < 0).any(), FLAG_NEG, 0)
        flags[name] = f.astype(jnp.int32)
    return flags


def check_flags(flags: dict) -> dict[str, str]:
    """Host-side decode of validation_flags output -> {field: problems}."""
    problems = {}
    for name, f in flags.items():
        f = int(f)
        if f:
            parts = []
            if f & FLAG_NAN:
                parts.append("nan")
            if f & FLAG_INF:
                parts.append("inf")
            if f & FLAG_NEG:
                parts.append("negative")
            problems[name] = "+".join(parts)
    return problems


def validated_step(step_fn):
    """Wrap a ``state -> state`` step so it also returns validation flags
    computed in the same compiled program (one fused pass; the reference's
    expensive host loop becomes a few device reductions)."""

    def wrapped(state, *args, **kwargs):
        out = step_fn(state, *args, **kwargs)
        return out, validation_flags(out)

    return wrapped
