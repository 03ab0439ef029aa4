"""Functional coupler: the lingua franca between the dycore and physics modules.

TPU-native re-design of the reference coupler/state abstraction
(reference: model/core/coupler.h:17, model/core/DataManager.h:21,
model/core/Options.h:11).  Where the reference holds mutable named device
arrays plus MPI decomposition state inside a Coupler object, here the whole
model state is an immutable pytree (`CouplerState`) of named global arrays
plus hashable static metadata, so one `jax.jit`-compiled step function can
thread it through dycore sub-cycles and physics modules.

Coupler state convention (reference experiments/supercell_example/driver.cpp:39-40):
  * density_dry  -- dry air density (kg/m^3)
  * uvel/vvel/wvel -- velocities (m/s), NOT momenta
  * temp         -- temperature (K), NOT potential temperature
  * tracers      -- tracer MASSES (rho*q), not mixing ratios

Array layout is ``(nens, nz, ny, nx)``: x innermost so it lands on the
128-wide TPU lane dimension, y on sublanes, and the ensemble axis leading so
`vmap`-style batching and data-parallel sharding are trivial.  (The reference
uses ``(nz, ny, nx, nens)`` with nens innermost for GPU coalescing --
coupler.h:210 -- which would waste TPU lanes for the common nens=1 case.)

Parallelism: arrays are *global*; distribution happens by sharding the
``ny``/``nx`` axes (the reference's 2-D MPI domain decomposition,
coupler.h:110-214) and optionally ``nens`` over a `jax.sharding.Mesh`.  XLA's
SPMD partitioner turns the dycore's shifted-window stencils into ICI neighbor
collective-permutes -- the TPU-native replacement for the reference's
MPI_Isend/Irecv halo exchange.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "TracerMeta",
    "Grid",
    "Options",
    "CouplerMeta",
    "CouplerState",
    "make_coupler_state",
]


OptionValue = Any  # str | int | float | bool


@dataclasses.dataclass(frozen=True)
class TracerMeta:
    """Tracer registry entry (reference coupler.h:323-347)."""

    name: str
    desc: str = ""
    positive: bool = True   # must remain non-negative (FCT enforced)
    adds_mass: bool = True  # contributes to full density


@dataclasses.dataclass(frozen=True)
class Grid:
    """Global uniform structured grid geometry (reference coupler.h:316-321).

    All sizes are global; there is no per-rank i_beg/j_beg because arrays are
    global and sharding is handled by jax.sharding.
    """

    nx: int
    ny: int
    nz: int
    nens: int = 1
    xlen: float = 1.0
    ylen: float = 1.0
    zlen: float = 1.0

    @property
    def dx(self) -> float:
        return self.xlen / self.nx

    @property
    def dy(self) -> float:
        return self.ylen / self.ny

    @property
    def dz(self) -> float:
        return self.zlen / self.nz

    @property
    def sim2d(self) -> bool:
        # 2-D (x-z) simulation when the global y extent is one cell
        # (reference coupler.h:127-131).
        return self.ny == 1

    @property
    def field_shape(self) -> tuple[int, int, int, int]:
        return (self.nens, self.nz, self.ny, self.nx)


class Options(Mapping[str, OptionValue]):
    """Immutable, hashable string-keyed option store.

    Functional analog of the reference ``core::Options`` typed key/value
    store (Options.h:66-127).  Values are plain Python scalars/strings so the
    whole mapping is hashable and can ride in jit static metadata; numeric
    physical constants therefore get constant-folded into compiled programs.
    """

    __slots__ = ("_d", "_hash")

    def __init__(self, d: Mapping[str, OptionValue] | None = None):
        object.__setattr__(self, "_d", dict(d) if d else {})
        object.__setattr__(self, "_hash", None)

    def __getitem__(self, k: str) -> OptionValue:
        return self._d[k]

    def __iter__(self):
        return iter(self._d)

    def __len__(self):
        return len(self._d)

    def __hash__(self):
        if self._hash is None:
            object.__setattr__(
                self, "_hash", hash(tuple(sorted(self._d.items())))
            )
        return self._hash

    def __eq__(self, other):
        return isinstance(other, Options) and self._d == other._d

    def __repr__(self):
        return f"Options({self._d!r})"

    def get(self, k: str, default: OptionValue = None) -> OptionValue:
        return self._d.get(k, default)

    def set(self, **kv: OptionValue) -> "Options":
        d = dict(self._d)
        d.update(kv)
        return Options(d)

    def setdefaults(self, **kv: OptionValue) -> "Options":
        d = dict(kv)
        d.update(self._d)
        return Options(d)

    def delete(self, key: str) -> "Options":
        """(reference Options::delete_option, Options.h:127)"""
        d = dict(self._d)
        d.pop(key, None)
        return Options(d)


@dataclasses.dataclass(frozen=True)
class CouplerMeta:
    """Static (hashable) coupler metadata: grid, tracer registry, options."""

    grid: Grid
    tracers: tuple[TracerMeta, ...] = ()
    options: Options = dataclasses.field(default_factory=Options)
    dtype: str = "float32"

    @property
    def num_tracers(self) -> int:
        return len(self.tracers)

    @property
    def tracer_names(self) -> tuple[str, ...]:
        return tuple(t.name for t in self.tracers)

    @property
    def idWV(self) -> int:
        """Index of water vapor in the tracer registry (reference dynamics...h:1292)."""
        for i, t in enumerate(self.tracers):
            if t.name == "water_vapor":
                return i
        return -1

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CouplerState:
    """The model's entire mutable state: named global arrays + static meta.

    Pytree: ``fields`` are leaves (traced), ``meta`` is static aux data.
    Functional analog of the reference DataManager's named-array registry
    (DataManager.h:126-195) -- modules communicate exclusively through it.
    """

    fields: dict[str, jax.Array]
    meta: CouplerMeta

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        names = tuple(sorted(self.fields))
        return tuple(self.fields[n] for n in names), (names, self.meta)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        names, meta = aux
        return cls(fields=dict(zip(names, leaves)), meta=meta)

    # -- convenience -------------------------------------------------------
    def __getitem__(self, name: str) -> jax.Array:
        return self.fields[name]

    def __contains__(self, name: str) -> bool:
        return name in self.fields

    @property
    def grid(self) -> Grid:
        return self.meta.grid

    @property
    def options(self) -> Options:
        return self.meta.options

    def replace_fields(self, **updates: jax.Array) -> "CouplerState":
        f = dict(self.fields)
        f.update(updates)
        out = CouplerState(fields=f, meta=self.meta)
        # Dirty-entry tracking (reference DataManager.h:206-237): record
        # which fields were written since the last clear_dirty().  Python
        # metadata only -- never traced, so it costs nothing under jit, and
        # like the reference it is best-effort introspection for debugging.
        # NOT carried through tree_flatten (that would bake the dirty set
        # into the treedef and retrace jit on every change), so any
        # jit/shard_map/tree_map boundary RESETS it to empty: dirty_fields
        # is only meaningful for eagerly-composed states.
        out._dirty = getattr(self, "_dirty", frozenset()) | frozenset(updates)
        return out

    @property
    def dirty_fields(self) -> frozenset:
        """Names written via replace_fields since the last clear_dirty().

        Only trustworthy for eagerly-built states: crossing a jit /
        shard_map / tree_map boundary rebuilds the pytree and resets this
        to empty (see replace_fields).
        """
        return getattr(self, "_dirty", frozenset())

    def clear_dirty(self) -> "CouplerState":
        out = CouplerState(fields=dict(self.fields), meta=self.meta)
        out._dirty = frozenset()
        return out

    def get_lev_col(self, name: str) -> jax.Array:
        """Field collapsed to (nz, ncol) for column physics (reference
        DataManager::get_lev_col, DataManager.h:294-338; ncol = nens*ny*nx,
        vertical leading)."""
        g = self.grid
        a = self.fields[name]  # (nens, nz, ny, nx)
        return jnp.moveaxis(a, 1, 0).reshape(g.nz, g.nens * g.ny * g.nx)

    def get_collapsed(self, name: str) -> jax.Array:
        """Field flattened to 1-D (reference DataManager::get_collapsed,
        DataManager.h:346-379)."""
        return self.fields[name].reshape(-1)

    def with_meta(self, meta: CouplerMeta) -> "CouplerState":
        return CouplerState(fields=dict(self.fields), meta=meta)

    def set_options(self, **kv: OptionValue) -> "CouplerState":
        return self.with_meta(
            dataclasses.replace(self.meta, options=self.meta.options.set(**kv))
        )

    def setdefault_options(self, **kv: OptionValue) -> "CouplerState":
        return self.with_meta(
            dataclasses.replace(
                self.meta, options=self.meta.options.setdefaults(**kv)
            )
        )

    def get_option(self, key: str, default: OptionValue = None) -> OptionValue:
        return self.meta.options.get(key, default)

    def register_field(
        self, name: str, shape: tuple[int, ...] | None = None, value=None
    ) -> "CouplerState":
        """Register a named array, zero-initialized unless ``value`` given
        (reference DataManager.h:126-195)."""
        if name in self.fields:
            raise ValueError(f"field {name!r} already registered")
        if value is None:
            if shape is None:
                shape = self.grid.field_shape
            value = jnp.zeros(shape, self.meta.jdtype)
        else:
            value = jnp.asarray(value, self.meta.jdtype)
        return self.replace_fields(**{name: value})

    def add_tracer(
        self,
        name: str,
        desc: str = "",
        positive: bool = True,
        adds_mass: bool = True,
    ) -> "CouplerState":
        """Register a tracer: adds registry metadata and a zeroed mass field
        (reference coupler.h:323-330)."""
        if any(t.name == name for t in self.meta.tracers):
            raise ValueError(f"tracer {name!r} already registered")
        meta = dataclasses.replace(
            self.meta,
            tracers=self.meta.tracers + (TracerMeta(name, desc, positive, adds_mass),),
        )
        out = self.with_meta(meta)
        if name not in out.fields:
            out = out.register_field(name)
        return out

    def tracer_stack(self) -> jax.Array:
        """Stack tracer fields -> (num_tracers, nens, nz, ny, nx).

        Functional analog of the reference MultiField aggregate
        (MultipleFields.h:48-96).
        """
        return jnp.stack([self.fields[n] for n in self.meta.tracer_names])

    def with_tracer_stack(self, tr: jax.Array) -> "CouplerState":
        return self.replace_fields(
            **{n: tr[i] for i, n in enumerate(self.meta.tracer_names)}
        )

    # -- validation (reference DataManager.h:385-483) ----------------------
    def validate(self, positive_only_registered: bool = True) -> dict[str, str]:
        """Host-side NaN/Inf/positivity validation; returns {field: problem}."""
        problems: dict[str, str] = {}
        positive_names = {t.name for t in self.meta.tracers if t.positive}
        for name, arr in self.fields.items():
            a = np.asarray(arr)
            if np.isnan(a).any():
                problems[name] = "nan"
            elif np.isinf(a).any():
                problems[name] = "inf"
            elif name in positive_names and (a < 0).any():
                problems[name] = "negative"
        return problems

    def clone(self) -> "CouplerState":
        """Deep functional copy (reference coupler.h:85-107 clone_into).

        Arrays are immutable so sharing leaves is a faithful clone.
        """
        return CouplerState(fields=dict(self.fields), meta=self.meta)


def make_coupler_state(
    grid: Grid,
    dtype: str = "float32",
    options: Mapping[str, OptionValue] | None = None,
) -> CouplerState:
    """Create an empty coupler state for a grid.

    Mirrors ``distribute_mpi_and_allocate_coupled_state`` (coupler.h:110-214)
    minus the MPI decomposition, which is replaced by jax.sharding of the
    global arrays.
    """
    meta = CouplerMeta(grid=grid, options=Options(options), dtype=dtype)
    return CouplerState(fields={}, meta=meta)
