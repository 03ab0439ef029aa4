"""Checkpoint / restore of the full coupler state.

The reference has no restart capability (its NetCDF output contains the full
prognostic state but no read-back path exists -- SURVEY.md section 5).  This
is the strictly-additive restore path: all fields + elapsed time + metadata
round-trip through a single ``.npz``.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from ..core.coupler import (CouplerMeta, CouplerState, Grid, Options,
                            TracerMeta)

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, state: CouplerState, etime: float = 0.0) -> None:
    meta = state.meta
    header = {
        "etime": etime,
        "dtype": meta.dtype,
        "grid": dataclasses.asdict(meta.grid),
        "tracers": [dataclasses.asdict(t) for t in meta.tracers],
        "options": dict(meta.options),
    }
    arrays = {f"field::{k}": np.asarray(v) for k, v in state.fields.items()}
    np.savez(path, __header__=json.dumps(header), **arrays)


def load_checkpoint(path: str) -> tuple[CouplerState, float]:
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(str(z["__header__"]))
        fields = {
            k[len("field::"):]: jnp.asarray(z[k])
            for k in z.files if k.startswith("field::")
        }
    meta = CouplerMeta(
        grid=Grid(**header["grid"]),
        tracers=tuple(TracerMeta(**t) for t in header["tracers"]),
        options=Options(header["options"]),
        dtype=header["dtype"],
    )
    return CouplerState(fields=fields, meta=meta), float(header["etime"])
