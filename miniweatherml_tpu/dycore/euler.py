"""Compressible-Euler WENO finite-volume dynamical core, TPU-native.

Re-design of the reference ``Dynamics_Euler_Stratified_WenoFV``
(model/modules/dynamics_euler_stratified_wenofv.h) as pure jax functions:
A-grid cell-centered FV, WENO-limited reconstruction to cell edges, acoustic
+ advective upwind (Godunov) fluxes, FCT positivity for tracers, SSP-RK3
with CFL sub-cycling, hydrostatic background-state splitting, gravity,
Coriolis, and immersed boundaries.

Structural differences from the reference (behavioral equivalence noted):

* The dycore prognostic state lives only inside one jitted step: coupler ->
  (state, tracers) -> ncycles x SSPRK3 -> coupler, exactly the reference's
  time_step flow (dynamics...h:81-198) but with no mutable class storage.
* Halo/edge MPI exchanges (dynamics...h:574-1082) are replaced by global
  arrays + BC padding; under sharding, XLA emits ICI collective-permutes for
  the shifted stencil windows.  Reconstruction is also done for the one ghost
  cell adjacent to each face so both Riemann inputs exist locally -- the
  halo-widening transformation of the reference's separate edge exchange.
* WENO is dense linear algebra (see ops/weno.py) instead of per-cell scalar
  kernels.
* FCT (dynamics...h:498-516) is functional: a per-cell limiter factor is
  computed and applied to faces by upwind-side selection.  At interior faces
  this matches the reference exactly; at the periodic seam faces the
  reference keeps two independently-scaled copies (its faces 0 and nx), which
  we reproduce by keeping nx+1 face entries.

State variable order matches the reference (dynamics...h:34-38):
idR, idU, idV, idW, idT = rho', rho*u, rho*v, rho*w, (rho*theta)'.
Array layout: (nvar, nens, nz, ny, nx).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.coupler import CouplerState
from ..ops.stencil import (BC_OPEN, BC_PERIODIC, BC_WALL, gather_stencils,
                           halo_strips, pad_bc)
from ..ops.weno import reconstruct_edges, weno_matrices
from ..ops.weno_fused import reconstruct_edges_shifted

__all__ = ["Dycore", "SpmdCtx", "IDR", "IDU", "IDV", "IDW", "IDT"]


@dataclasses.dataclass(frozen=True)
class SpmdCtx:
    """Explicit-SPMD context for running the dycore inside shard_map.

    ``axes`` maps a field axis (-1 = x, -2 = y) to its (mesh axis name,
    shard count).  When set, halo data comes from ring lax.ppermute
    exchanges (parallel/halo.py) instead of global-array padding -- the
    TPU-native analog of the reference's MPI halo/edge exchange
    (dynamics...h:574-1082).
    """

    axes: Any  # Mapping[int, tuple[str, int]]

    def get(self, axis: int):
        return self.axes.get(axis) if self.axes else None

    @property
    def axis_names(self) -> tuple[str, ...]:
        return tuple(name for name, _ in self.axes.values())

IDR, IDU, IDV, IDW, IDT = 0, 1, 2, 3, 4
NUM_STATE = 5

# Directions: name, field axis (negative, on (nens,nz,ny,nx)), normal momentum id
_AX_X, _AX_Y, _AX_Z = -1, -2, -3

# Padded-stencil-axis cap for the whole-axis sublane kernel (beyond it the
# Mosaic VMEM temp stack overflows; longer axes use the overlapped-chunk
# path).  Module constant so tests can force the chunked branch.
_SUB_WHOLE_NP_CAP = 192
# HBM-pressure auto-gate thresholds (cells/chip).  >= _SEQ_CELLS: the
# free DIR_SEQ sequencing (fits 1024x1024x64 at full throughput,
# BASELINE.md round 4).  >= _ACC_CELLS: the stronger in-kernel
# accumulation levers (DIV_ACC / PRIM_SPLIT / RK_FUSE) -- each costs
# ~3.5% in lost kernel-launch overlap (measured 106.9 -> 103.3 -> 99.7
# at 1024x1024x64, round-5 queue 2), so they only turn on where DIR_SEQ
# alone no longer fits (the 1024^2x100-class grids).
_SEQ_CELLS = 52_000_000
_ACC_CELLS = 80_000_000

# Lane-block width for the z-direction sublane kernel (the short 64-cell
# stencil axis leaves VMEM headroom for wider lane tiles; A/B via env).
import os as _os_mod
_Z_LANE_BLOCK = int(_os_mod.environ.get("MWML_Z_LANE_BLOCK", "128"))

# Aligned x tracer-flux faces (n-wide + separate periodic-seam copy)
# through FCT/divergence, avoiding (nx+1)-lane padded tiles in the glue.
# MEASURED NEGATIVE (default off): bitwise-identical but 160.8 vs
# 156.6 ms/step at 512^2x64 ord-5 -- the roll/where seam reconstruction
# in the FCT glue costs more than the (nx+1) padded-tile tax it removes
# (scripts/bench_aligned_ab.py).  MWML_ALIGNED_TFX=1 re-enables for A/B.
_ALIGNED_TFX = _os_mod.environ.get("MWML_ALIGNED_TFX", "0") == "1"

# Fixed max wave speed and CFL (reference dynamics...h:70-77) and the frozen
# acoustic speed used by the Riemann solver (dynamics...h:402).
_MAXWAVE = 350.0 + 80.0
_CFL = 0.6
_CS = 350.0


def _slice_axis(a, axis, start, stop):
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(start, stop)
    return a[tuple(idx)]


def _index_axis(a, axis, i):
    idx = [slice(None)] * a.ndim
    idx[axis] = i
    return tuple(idx)


def _chunk_size(n: int) -> int | None:
    """Divisor of ``n`` in [32, 186] closest to 64 -- the per-chunk stencil
    extent for the chunked sublane kernel (chunk + halos must stay within
    the Mosaic VMEM working set; ~64 sublanes measured fastest)."""
    best = None
    for cn in range(32, min(n - 1, 186) + 1):
        if n % cn == 0 and (best is None
                            or abs(cn - 64) < abs(best - 64)):
            best = cn
    return best


def _stitch_chunk_faces(F, nens, nz, C, cn, lanes):
    """Reassemble global faces from per-chunk face arrays.

    ``F`` is (nv, nens*nz*C, cn+1, lanes) with chunks minor in the row axis.
    Adjacent chunks both compute their shared boundary face (bitwise equal:
    same stencil inputs); keep each chunk's first ``cn`` faces plus the last
    chunk's final face -> (nv, nens, nz, C*cn + 1, lanes)."""
    nv = F.shape[0]
    F = F.reshape(nv, nens, nz, C, cn + 1, lanes)
    body = F[:, :, :, :, :cn, :].reshape(nv, nens, nz, C * cn, lanes)
    last = F[:, :, :, C - 1, cn:, :]
    return jnp.concatenate([body, last], axis=3)


@dataclasses.dataclass(frozen=True)
class _Consts:
    """Physical constants snapshot, baked into the compiled step."""

    R_d: float
    R_v: float
    C0: float
    gamma: float
    grav: float
    fcor: float
    enable_gravity: bool
    use_immersed: bool
    bc_x: int
    bc_y: int
    bc_z: int


class Dycore:
    """Order-``ord`` WENO FV Euler dycore (ord in {3,5,7,9}; reference
    -DMW_ORD, dynamics...h:24-28)."""

    def __init__(self, ord: int = 5, cutoff: float = 0.0,
                 recon_impl: str = "fused", riemann_impl: str = "auto",
                 fast_weights: bool | None = None, opt_algebra: bool = True):
        if ord not in (3, 5, 7, 9):
            raise ValueError("ord must be 3, 5, 7 or 9")
        if recon_impl not in ("fused", "dense"):
            raise ValueError("recon_impl must be 'fused' or 'dense'")
        if riemann_impl == "auto":
            # Production default: the fused VMEM megakernels on a
            # SINGLE-device TPU (the XLA recon path needs ~1.6x the HBM at
            # 1024^2-class grids -- measured 24.4G vs a fitting Pallas
            # step at 1024x1024x64 -- and is slower); the XLA path
            # elsewhere: interpret-mode Pallas is test-only on CPU, and
            # XLA's auto-SPMD partitioner cannot shard a pallas_call, so
            # multi-device meshes default to the partitionable XLA form
            # (the explicit shard_map path passes riemann_impl="pallas"
            # itself -- that is the multi-chip fast path).  fast_weights
            # follows unless pinned.
            import jax
            riemann_impl = ("pallas" if jax.default_backend() == "tpu"
                            and jax.device_count() == 1 else "xla")
        if riemann_impl not in ("xla", "pallas"):
            raise ValueError("riemann_impl must be 'xla', 'pallas' or "
                             "'auto'")
        if fast_weights is None:
            fast_weights = riemann_impl == "pallas"
        self.ord = ord
        self.hs = (ord - 1) // 2
        self.cutoff = cutoff
        self.recon_impl = recon_impl
        # "pallas": fused recon+Riemann VMEM megakernel (ops/pallas_recon.py)
        # for every direction/BC, single-device and under shard_map (edge
        # BCs are applied in-kernel from SMEM boundary-mode scalars).
        self.riemann_impl = riemann_impl
        # fast_weights: approximate-reciprocal WENO weight normalization in
        # the Pallas kernels (weights are a heuristic; edge values shift by
        # ~1e-5 relative). Only affects riemann_impl='pallas'.
        self.fast_weights = fast_weights
        # opt_algebra: reduced-operation limiter algebra in the Pallas
        # kernels (factored squared-form TVs, fused weight normalization,
        # high-order edge folded into the low-order blend at ord 3/5; see
        # ops/weno_fused._opt_terms).  Same weights up to rounding (~1e-15
        # f64 / ~1e-7 f32 relative); False recovers the reference-ordered
        # algebra bit-for-bit.  Only affects riemann_impl='pallas'.
        self.opt_algebra = opt_algebra
        self.mats = weno_matrices(ord)

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def init(self, state: CouplerState) -> CouplerState:
        """Register coupler fields, set constant options with defaults, build
        hydrostatic profiles and the test-case initial condition
        (reference dynamics...h:1197-1683)."""
        from . import init_cases

        g = state.grid
        # Physical-constant defaults (reference dynamics...h:1227-1248).
        state = state.setdefault_options(
            R_d=287.0, cp_d=1003.0, R_v=461.0, cp_v=1859.0,
            p0=1.0e5, grav=9.81, earthrot=7.292115e-5,
        )
        o = state.options
        cp_d, R_d = o["cp_d"], o["R_d"]
        state = state.setdefault_options(cv_d=cp_d - R_d)
        cv_d = state.options["cv_d"]
        state = state.setdefault_options(
            gamma_d=cp_d / cv_d, kappa_d=R_d / cp_d, cv_v=o["R_v"] - o["cp_v"]
        )
        kappa = state.options["kappa_d"]
        gamma = state.options["gamma_d"]
        state = state.setdefault_options(
            C0=(R_d * o["p0"] ** (-kappa)) ** gamma, latitude=0.0
        )
        state = state.setdefault_options(
            enable_gravity=True, use_immersed_boundaries=False, out_freq=-1.0
        )

        if state.meta.idWV < 0:
            raise ValueError(
                "dycore requires a 'water_vapor' tracer to be registered "
                "before init (reference dynamics...h:1292)"
            )

        # Coupler prognostic fields (reference dynamics...h:1253-1257).
        for name in ("density_dry", "uvel", "vvel", "wvel", "temp"):
            if name not in state:
                state = state.register_field(name)
        if "immersed_proportion" not in state:
            state = state.register_field("immersed_proportion")

        # Test case dispatch (reference dynamics...h:1306-1310).
        init_data = state.get_option("init_data", "supercell")
        case = {
            "thermal": init_cases.init_thermal,
            "supercell": partial(init_cases.init_supercell, ord=self.ord),
            "city": init_cases.init_city,
            "building": init_cases.init_building,
        }.get(init_data)
        if case is None:
            raise ValueError(f"invalid init_data {init_data!r}")
        state, s_dyn, tr_dyn = case(state)

        state = state.replace_fields(
            **self._dyn_to_coupler_fields(state, s_dyn, tr_dyn)
        )
        return state

    # ------------------------------------------------------------------
    # public stepping API
    # ------------------------------------------------------------------
    def compute_time_step(self, state: CouplerState) -> float:
        """Max stable dt from fixed max wave speed (dynamics...h:70-77)."""
        g = state.grid
        return _CFL * min(g.dx, g.dy, g.dz) / _MAXWAVE

    def time_step(self, state: CouplerState, dt_phys: float,
                  spmd: SpmdCtx | None = None) -> CouplerState:
        """One physics step: CFL sub-cycled SSPRK3 (dynamics...h:81-181).

        ``dt_phys`` is a static Python float, so ``ncycles`` and the RK
        coefficients fold into the compiled program (the driver's auto-CFL
        path makes dt_phys constant, so this compiles once).

        ``spmd`` runs the halo traffic through explicit ppermute exchanges;
        use only inside shard_map (parallel/spmd.py), with ``state`` holding
        shard-local arrays and local grid metadata.  ``compute_time_step``
        must be called with the *global* grid either way (it only uses cell
        sizes, which are shard-invariant).
        """
        g = state.grid
        dt_dyn = self.compute_time_step(state)
        ncycles = max(1, int(math.ceil(dt_phys / dt_dyn - 1e-12)))
        dt = dt_phys / ncycles

        s, tr = self.convert_coupler_to_dynamics(state)
        consts = self._consts(state)
        hy = self._hy(state)
        immersed = state["immersed_proportion"]
        positive = np.array([t.positive for t in state.meta.tracers])

        for _ in range(ncycles):
            s, tr = self._ssprk3(state.grid, consts, hy, immersed, positive,
                                 s, tr, dt, spmd)

        return state.replace_fields(**self._dyn_to_coupler_fields(state, s, tr))

    # ------------------------------------------------------------------
    # conversions (reference dynamics...h:1891-2015)
    # ------------------------------------------------------------------
    def convert_coupler_to_dynamics(self, state: CouplerState):
        o = state.options
        R_d, R_v, gamma, C0 = o["R_d"], o["R_v"], o["gamma_d"], o["C0"]
        hyc, hyt = state["hy_dens_cells"], state["hy_dens_theta_cells"]
        hyc = hyc[:, :, None, None]
        hyt = hyt[:, :, None, None]

        rho_d = state["density_dry"]
        u, v, w = state["uvel"], state["vvel"], state["wvel"]
        temp = state["temp"]
        tr = state.tracer_stack()
        rho_v = tr[state.meta.idWV]
        press = rho_d * R_d * temp + rho_v * R_v * temp
        adds = np.array([t.adds_mass for t in state.meta.tracers])
        rho = rho_d + jnp.sum(tr * jnp.asarray(adds, tr.dtype)[:, None, None, None, None], axis=0)
        theta = (press / C0) ** (1.0 / gamma) / rho
        s = jnp.stack([rho - hyc, rho * u, rho * v, rho * w, rho * theta - hyt])
        return s, tr

    def _dyn_to_coupler_fields(self, state: CouplerState, s, tr):
        o = state.options
        R_d, R_v, gamma, C0 = o["R_d"], o["R_v"], o["gamma_d"], o["C0"]
        hyc = state["hy_dens_cells"][:, :, None, None]
        hyt = state["hy_dens_theta_cells"][:, :, None, None]
        rho = s[IDR] + hyc
        u, v, w = s[IDU] / rho, s[IDV] / rho, s[IDW] / rho
        theta = (s[IDT] + hyt) / rho
        press = C0 * (rho * theta) ** gamma
        adds = np.array([t.adds_mass for t in state.meta.tracers])
        rho_d = rho - jnp.sum(tr * jnp.asarray(adds, tr.dtype)[:, None, None, None, None], axis=0)
        rho_v = tr[state.meta.idWV]
        temp = press / (rho_d * R_d + rho_v * R_v)
        out = dict(density_dry=rho_d, uvel=u, vvel=v, wvel=w, temp=temp)
        out.update({n: tr[i] for i, n in enumerate(state.meta.tracer_names)})
        return out

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------
    def _consts(self, state: CouplerState) -> _Consts:
        o = state.options
        return _Consts(
            R_d=o["R_d"], R_v=o["R_v"], C0=o["C0"], gamma=o["gamma_d"],
            grav=o["grav"],
            fcor=2.0 * o["earthrot"] * math.sin(o.get("latitude", 0.0)),
            enable_gravity=bool(o.get("enable_gravity", True)),
            use_immersed=bool(o.get("use_immersed_boundaries", False)),
            bc_x=int(o["bc_x"]), bc_y=int(o["bc_y"]), bc_z=int(o["bc_z"]),
        )

    def _hy(self, state: CouplerState):
        return (
            state["hy_dens_cells"], state["hy_dens_theta_cells"],
            state["hy_dens_edges"], state["hy_dens_theta_edges"],
        )

    def _rk_fuse_on(self, grid, consts, spmd) -> bool:
        """MWML_RK_FUSE 0/1/auto: run each SSPRK3 stage's state update in
        the final (y) direction kernel's epilogue -- out = c0*s
        [+ c1*s_prev] + cdt*(s_tend + sources) -- so the stage's
        state-sized XLA add temps and the separate tendency buffer
        disappear (the 1024^2x100 single-chip HBM-fit lever, on top of
        MWML_DIV_ACC, which it forces on).  Auto default: ON below the
        DIR_SEQ band and ON at >= _ACC_CELLS -- DIV_ACC+RK_FUSE measured
        109.96/109.99 vs the plain 108.77/108.9 at the 512^2x64 headline
        (round-5 queues 4-5), while in the [_SEQ_CELLS, _ACC_CELLS) band
        DIR_SEQ alone measured best (106.9 vs 103.3 DIV_ACC-only at
        1024x1024x64, queue 2).  Needs the in-kernel gravity/Coriolis
        sources, so gated to the un-immersed 3-D single-device pallas
        path where y takes the sublane kernel."""
        import os as _os

        if self.riemann_impl != "pallas" or spmd is not None:
            return False
        if grid.sim2d or consts.use_immersed:
            return False
        mode = _os.environ.get("MWML_RK_FUSE", "auto")
        n_cells = grid.nens * grid.nz * grid.ny * grid.nx
        if not (mode == "1" or (mode == "auto"
                                and (n_cells < _SEQ_CELLS
                                     or n_cells >= _ACC_CELLS))):
            return False
        Np = grid.ny + 2 + 2 * self.hs
        return (Np <= _SUB_WHOLE_NP_CAP
                or _chunk_size(grid.ny) is not None)

    def _kfct_on(self, grid, spmd, ntracers) -> bool:
        """MWML_FCT_PALLAS 0/1/auto (default auto: OFF): FCT
        scale+divergence in fused per-direction kernels with the running
        tracer-tendency buffer donated through them.  A measured LOSS at
        512^2x64 Kessler (BASELINE.md round 3), and a measured HBM-fit
        LOSS at 1024^2x100 (queue 7: 18.26G vs 16.26G with kfct off --
        XLA relayout copies at the pallas operand boundaries exceed the
        divergence temps the kernels remove, and the 2-D multiplier
        rewrite did not shrink them).  The XLA-side MWML_TR_SEQ
        sequencing below replaces it as the tracer-side fit lever."""
        import os as _os

        if self.riemann_impl != "pallas" or spmd is not None                 or ntracers == 0:
            return False
        mode = _os.environ.get("MWML_FCT_PALLAS", "auto")
        return mode == "1"

    def _ssprk3(self, grid, consts, hy, immersed, positive, s, tr, dt,
                spmd=None):
        """Three-stage SSPRK3 with per-stage tracer positivity clamp
        (reference dynamics...h:110-175; FCT dt per stage 1, 1/4, 2/3)."""
        tend = partial(
            self._tendencies, grid, consts, hy, immersed, positive, spmd
        )

        def clamp(tr_new):
            pos = jnp.asarray(positive, bool)[:, None, None, None, None]
            return jnp.where(pos, jnp.maximum(tr_new, 0.0), tr_new)

        if self._rk_fuse_on(grid, consts, spmd):
            # With kfct also on, the tracer stage update + clamp fuse into
            # the final fct pass and tend() returns the UPDATED tracers.
            tr_fused = self._kfct_on(grid, spmd, tr.shape[0])

            def coefs(c0, c1, cdt):
                return jnp.stack([jnp.asarray(c0, s.dtype),
                                  jnp.asarray(c1, s.dtype),
                                  jnp.asarray(cdt, s.dtype)])

            s1, tt = tend(s, tr, dt,
                          rk=(coefs(1.0, 0.0, dt), s, None, tr, None))
            t1 = tt if tr_fused else clamp(tr + dt * tt)
            s2, tt = tend(s1, t1, dt / 4.0,
                          rk=(coefs(0.75, 0.25, 0.25 * dt), s, s1, tr, t1))
            t2 = tt if tr_fused else clamp(0.75 * tr + 0.25 * t1
                                           + 0.25 * dt * tt)
            s3, tt = tend(s2, t2, 2.0 * dt / 3.0,
                          rk=(coefs(1.0 / 3.0, 2.0 / 3.0, 2.0 * dt / 3.0),
                              s, s2, tr, t2))
            t3 = tt if tr_fused else clamp((1.0 / 3.0) * tr
                                           + (2.0 / 3.0) * t2
                                           + (2.0 / 3.0) * dt * tt)
            return s3, t3

        st, tt = tend(s, tr, dt)
        s1 = s + dt * st
        t1 = clamp(tr + dt * tt)

        st, tt = tend(s1, t1, dt / 4.0)
        s2 = 0.75 * s + 0.25 * s1 + 0.25 * dt * st
        t2 = clamp(0.75 * tr + 0.25 * t1 + 0.25 * dt * tt)

        st, tt = tend(s2, t2, 2.0 * dt / 3.0)
        s3 = (1.0 / 3.0) * s + (2.0 / 3.0) * s2 + (2.0 / 3.0) * dt * st
        t3 = clamp((1.0 / 3.0) * tr + (2.0 / 3.0) * t2 + (2.0 / 3.0) * dt * tt)
        return s3, t3

    def _recon_direction(self, prim, axis, n, bc, normal_id, spmd=None):
        """WENO-reconstruct all vars along ``axis`` and map to faces.

        Returns (L, R): per-face left/right limits of the de-densitized
        variables, face axis length n+1 at position ``axis``.
        Equivalent to the reconstruction loop (dynamics...h:271-388) plus the
        halo semantics of halo_exchange (dynamics...h:574-827); ghost-cell
        reconstruction replaces the reference's separate edge exchange.
        """
        hp = self.hs + 1
        zv = normal_id if bc == BC_WALL else None
        mesh_ax = spmd.get(axis) if spmd is not None else None
        if mesh_ax is not None:
            from ..parallel.halo import exchange_halos
            name, ns = mesh_ax
            padded = exchange_halos(prim, axis, hp, name, ns, bc,
                                    zero_var=zv)
            return self._recon_from_padded(padded, axis, n)
        # Wall: the normal-velocity halo is zeroed, fused into the pad
        # (zero_var) so no second full-array pass is needed.
        padded = pad_bc(prim, axis, hp, bc, zero_var=zv)
        return self._recon_from_padded(padded, axis, n)

    def _recon_from_padded(self, padded, axis, n):
        if self.recon_impl == "fused":
            gll_l, gll_r = reconstruct_edges_shifted(
                padded, axis, n + 2, self.mats, self.cutoff)
        else:
            sten = gather_stencils(padded, axis, n + 2, self.ord)
            edges = reconstruct_edges(sten, self.mats, self.cutoff)
            gll_l, gll_r = edges[..., 0], edges[..., 1]
        L = _slice_axis(gll_r, axis, 0, n + 1)   # face f <- right edge of cell f-1
        R = _slice_axis(gll_l, axis, 1, n + 2)   # face f <- left edge of cell f
        return L, R

    def _apply_edge_bcs(self, SL, SR, TRL, TRR, axis, n, bc, normal_id,
                        spmd=None):
        """Physical-boundary overwrite of face limits
        (reference edge_exchange BC section, dynamics...h:1005-1081).

        Under spmd the overwrites apply only on the shards holding the
        global domain boundary (selected by lax.axis_index)."""
        if bc == BC_PERIODIC:
            return SL, SR, TRL, TRR
        mesh_ax = spmd.get(axis) if spmd is not None else None
        if mesh_ax is not None:
            name, ns = mesh_ax
            idx = jax.lax.axis_index(name)
            first, last = idx == 0, idx == ns - 1
        else:
            first = last = True
        lo = _index_axis(SL, axis, 0)
        hi = _index_axis(SL, axis, n)
        # exterior side copies interior side (boundary shards only)
        SL = SL.at[lo].set(jnp.where(first, SR[lo], SL[lo]))
        SR = SR.at[hi].set(jnp.where(last, SL[hi], SR[hi]))
        TRL = TRL.at[lo].set(jnp.where(first, TRR[lo], TRL[lo]))
        TRR = TRR.at[hi].set(jnp.where(last, TRL[hi], TRR[hi]))
        if bc == BC_WALL:
            lo_n = _index_axis(SL[normal_id], axis, 0)
            hi_n = _index_axis(SL[normal_id], axis, n)
            zl = jnp.zeros_like(SL[normal_id][lo_n])
            zh = jnp.zeros_like(SL[normal_id][hi_n])
            SL = SL.at[(normal_id,) + lo_n].set(
                jnp.where(first, zl, SL[normal_id][lo_n]))
            SR = SR.at[(normal_id,) + lo_n].set(
                jnp.where(first, zl, SR[normal_id][lo_n]))
            SL = SL.at[(normal_id,) + hi_n].set(
                jnp.where(last, zh, SL[normal_id][hi_n]))
            SR = SR.at[(normal_id,) + hi_n].set(
                jnp.where(last, zh, SR[normal_id][hi_n]))
        return SL, SR, TRL, TRR

    @staticmethod
    def _riemann(SL, SR, TRL, TRR, normal_id, C0, gamma):
        """Acoustic characteristic upwinding for pressure/normal momentum,
        advective upwinding for everything else (dynamics...h:395-474)."""
        ruL, ruR = SL[normal_id], SR[normal_id]
        rtL, rtR = SL[IDT], SR[IDT]
        pL = C0 * rtL**gamma
        pR = C0 * rtR**gamma
        w1 = 0.5 * (pR - _CS * ruR)
        w2 = 0.5 * (pL + _CS * ruL)
        p_upw = w1 + w2
        ru_upw = (w2 - w1) / _CS
        useL = (ruL + ruR) > 0.0
        q = jnp.where(useL[None], SL, SR)
        r_upw = q[IDR]
        flux = ru_upw * q / r_upw
        flux = flux.at[IDR].set(ru_upw)
        flux = flux.at[normal_id].add(p_upw)
        tr_flux = ru_upw * jnp.where(useL[None], TRL, TRR) / r_upw
        return flux, tr_flux

    def _direction_fluxes(self, grid, consts, hy, prim, axis, n, bc,
                          normal_id, spmd=None, div_scale=None,
                          emit_fo=False, acc=None, prim_parts=None,
                          rk=None):
        """Per-direction pipeline on the shared de-densitized variables
        (computed once per RHS in _tendencies): pad/BC -> WENO ->
        backgrounds/density at faces -> face BCs -> Riemann.

        ``div_scale`` (pallas path only): the state output is the per-cell
        divergence contribution instead of face fluxes (see
        ops/pallas_recon._riemann_block).  ``emit_fo`` (pallas path only):
        additionally return the per-cell FCT outflow partial.  ``acc``
        (pallas path, requires div_scale): running state tendency in state
        layout, added in-kernel with its HBM buffer donated to the output."""
        hyc, hyt, hye, hyte = hy
        # The Pallas megakernels run single-device AND inside shard_map
        # (halos then come from ring ppermute exchanges); physical edge BCs
        # (wall/open) are applied inside the kernel from SMEM boundary-mode
        # scalars, gated per shard by lax.axis_index, so every BC runs the
        # fused path.
        if self.riemann_impl == "pallas":
            return self._direction_fluxes_pallas(
                grid, consts, hy, prim, axis, n, bc, normal_id, spmd,
                div_scale=div_scale, emit_fo=emit_fo, acc=acc,
                prim_parts=prim_parts, rk=rk)
        assert not emit_fo and acc is None and rk is None
        L, R = self._recon_direction(prim, axis, n, bc, normal_id, spmd)

        # Background state at faces (dynamics...h:286-295 for x, :368-377 z).
        if axis == _AX_Z:
            hy_r = hye[:, :, None, None]       # (nens, nz+1, 1, 1) at faces
            hy_t = hyte[:, :, None, None]
        else:
            hy_r = hyc[:, :, None, None]
            hy_t = hyt[:, :, None, None]
        rL = L[IDR] + hy_r
        rR = R[IDR] + hy_r
        SL = jnp.stack([rL, L[IDU] * rL, L[IDV] * rL, L[IDW] * rL, L[IDT] + hy_t])
        SR = jnp.stack([rR, R[IDU] * rR, R[IDV] * rR, R[IDW] * rR, R[IDT] + hy_t])
        TRL = L[NUM_STATE:] * rL
        TRR = R[NUM_STATE:] * rR

        SL, SR, TRL, TRR = self._apply_edge_bcs(SL, SR, TRL, TRR, axis, n, bc,
                                                normal_id, spmd)
        return self._riemann(SL, SR, TRL, TRR, normal_id, consts.C0, consts.gamma)

    def _direction_fluxes_pallas(self, grid, consts, hy, prim, axis, n, bc,
                                 normal_id, spmd=None, div_scale=None,
                                 emit_fo=False, acc=None, prim_parts=None,
                                 rk=None):
        """Route one direction through the fused VMEM megakernels
        (ops/pallas_recon.py) in the direction's NATIVE layout: x uses the
        lane-stencil kernel; y and z use the sublane-stencil kernel, so no
        transposes are needed anywhere.  Physical boundary conditions at
        the global edge faces (wall: zero normal momentum + one-sided
        pressure; open: exterior limit copies interior) are applied INSIDE
        the kernel from SMEM boundary-mode scalars -- under shard_map the
        scalars are gated by lax.axis_index so only boundary shards apply
        them (reference edge_exchange BCs, dynamics...h:1005-1081)."""
        from ..ops.pallas_recon import (direction_fluxes_pallas,
                                        direction_fluxes_pallas_sub)

        hyc, hyt, hye, hyte = hy
        hp = self.hs + 1
        Np = n + 2 + 2 * self.hs
        zv = normal_id if bc == BC_WALL else None
        mesh_ax = spmd.get(axis) if spmd is not None else None
        # Unsharded, un-chunked axes reconstruct their exterior face limits
        # in-block (local_edges: hs-wide strips, lane/sublane-aligned vector
        # widths); sharded or chunked axes need the halo-cell
        # reconstruction, so their strips are hp-wide.
        will_chunk = (axis == _AX_Y and Np > _SUB_WHOLE_NP_CAP
                      and _chunk_size(n) is not None)
        hw = self.hs if (mesh_ax is None and not will_chunk) else hp
        # In-kernel boundary mode: 0 none, 1 wall, 2 open.
        mode = {BC_PERIODIC: 0, BC_WALL: 1, BC_OPEN: 2}[bc]
        self_bc = None
        if mesh_ax is not None:
            # inside shard_map: halo strips come from the ring neighbors
            from ..parallel.halo import exchange_halo_strips
            name, ns = mesh_ax
            lo, hi = exchange_halo_strips(prim, axis, hw, name, ns, bc,
                                          zero_var=zv)
            idx = jax.lax.axis_index(name)
            bc_lo = jnp.where(idx == 0, mode, 0).astype(jnp.int32)
            bc_hi = jnp.where(idx == ns - 1, mode, 0).astype(jnp.int32)
        elif will_chunk:
            # chunks need real strip arrays (global ends; interior chunk
            # strips are sliced from prim below)
            lo, hi = halo_strips(prim, axis, hw, bc, zero_var=zv)
            bc_lo = bc_hi = jnp.int32(mode)
        else:
            # unsharded whole-axis: the kernel builds its own halos from
            # the block's edges -- no strip arrays at all
            lo = hi = None
            self_bc = mode
            bc_lo = bc_hi = jnp.int32(mode)

        nvar = prim.shape[0]
        nens, nz, ny, nx = grid.nens, grid.nz, grid.ny, grid.nx
        args = (n, self.mats, self.cutoff, normal_id, consts.C0, consts.gamma)
        kw = dict(fast_weights=self.fast_weights, opt=self.opt_algebra,
                  div_scale=div_scale, self_bc=self_bc, emit_fo=emit_fo)
        y_lane_layout = False

        def unpack(out):
            return out if emit_fo else (*out, None)

        kw["bc"] = (bc_lo, bc_hi)

        if acc is not None:
            assert div_scale is not None
        # Direction-local prim assembly (MWML_PRIM_SPLIT, big grids): build
        # this direction's kernel operand as its OWN concat of the shared
        # de-densitized parts -- bitwise-identical values (concat of
        # reshapes == reshape of the concat), but each direction's concat
        # fuses into its kernel's operand read (allow_input_fusion)
        # instead of relaying-out one shared 5-D prim buffer per operand
        # layout.  The 1024x1024x100 OOM table showed a 3.25G relayout
        # COPY of prim feeding the z kernel on top of the 3.12G concat
        # itself; direction-local assembly removes the copy class.  Only
        # strip-free (whole-axis self_bc) directions qualify -- strip
        # slicing still reads the 5-D prim.
        def _local(shape_tail):
            return jnp.concatenate(
                [p.reshape((p.shape[0],) + shape_tail) for p in prim_parts])

        if axis == _AX_X:
            if prim_parts is not None and self_bc is not None:
                flat = _local((nens * nz * ny, n))
            else:
                flat = prim.reshape(nvar, nens * nz * ny, n)
            if acc is not None:
                kw["acc"] = acc.reshape(NUM_STATE, nens * nz * ny, n)
            lo_f = hi_f = None
            if self_bc is None:
                lo_f = lo.reshape(nvar, nens * nz * ny, hw)
                hi_f = hi.reshape(nvar, nens * nz * ny, hw)
            hyr_rows = jnp.broadcast_to(
                hyc[:, :, None], (nens, nz, ny)).reshape(-1)
            hyt_rows = jnp.broadcast_to(
                hyt[:, :, None], (nens, nz, ny)).reshape(-1)
            hyr_f = jnp.broadcast_to(hyr_rows[:, None], (hyr_rows.size, n + 1))
            hyt_f = jnp.broadcast_to(hyt_rows[:, None], (hyr_rows.size, n + 1))
            SF, TF, FO = unpack(direction_fluxes_pallas(
                flat, lo_f, hi_f, hyr_f, hyt_f, *args,
                aligned_tf=_ALIGNED_TFX and nvar > NUM_STATE, **kw))
        elif axis == _AX_Y and Np <= _SUB_WHOLE_NP_CAP:
            # stencil on the sublane axis; x stays on lanes (no transpose).
            # Only viable while the whole stencil axis fits in the VMEM
            # working set (Np*128 lanes within the Mosaic temp stack).
            if prim_parts is not None and self_bc is not None:
                resh = _local((nens * nz, n, nx))
            else:
                resh = prim.reshape(nvar, nens * nz, n, nx)
            if acc is not None:
                kw["acc"] = acc.reshape(NUM_STATE, nens * nz, n, nx)
            if rk is not None:
                coefs, b0, b1, grav_f, fcor_f = rk
                kw["rk"] = (coefs,
                            b0.reshape(NUM_STATE, nens * nz, n, nx),
                            None if b1 is None else
                            b1.reshape(NUM_STATE, nens * nz, n, nx),
                            grav_f, fcor_f)
            lo_r = hi_r = None
            if self_bc is None:
                lo_r = lo.reshape(nvar, nens * nz, hw, nx)
                hi_r = hi.reshape(nvar, nens * nz, hw, nx)
            hyr_r = hyc.reshape(-1, 1)
            hyt_r = hyt.reshape(-1, 1)
            SF, TF, FO = unpack(direction_fluxes_pallas_sub(resh, lo_r, hi_r,
                                                 hyr_r, hyt_r, *args, **kw))
        elif axis == _AX_Y and (cn := _chunk_size(n)) is not None:
            # large ny: split the stencil axis into chunks that individually
            # fit in VMEM, still on sublanes -- no transpose.  Chunks are a
            # free reshape; each chunk's halo strips come from its
            # neighbors in the same row (global strips at the ends).  A
            # chunk produces its cn+1 faces; the shared chunk-boundary face
            # is computed identically in both chunks (same stencil inputs)
            # and _stitch_chunk_faces drops the duplicates.
            C = n // cn
            if prim_parts is not None:
                # direction-local assembly (see the x branch): the strip
                # slices below still read the 5-D prim, but slice-of-concat
                # simplifies through, so the 5-D concat itself goes dead.
                resh = _local((nens * nz * C, cn, nx))
            else:
                resh = prim.reshape(nvar, nens * nz * C, cn, nx)
            if acc is not None:
                kw["acc"] = acc.reshape(NUM_STATE, nens * nz * C, cn, nx)
            if rk is not None:
                coefs, b0, b1, grav_f, fcor_f = rk
                kw["rk"] = (coefs,
                            b0.reshape(NUM_STATE, nens * nz * C, cn, nx),
                            None if b1 is None else
                            b1.reshape(NUM_STATE, nens * nz * C, cn, nx),
                            grav_f, fcor_f)
            los = [lo] + [
                jax.lax.slice_in_dim(prim, c * cn - hp, c * cn, axis=3)
                for c in range(1, C)]
            his = [
                jax.lax.slice_in_dim(prim, (c + 1) * cn,
                                     (c + 1) * cn + hp, axis=3)
                for c in range(C - 1)] + [hi]
            lo_r = jnp.stack(los, axis=3).reshape(
                nvar, nens * nz * C, hp, nx)
            hi_r = jnp.stack(his, axis=3).reshape(
                nvar, nens * nz * C, hp, nx)
            hyr_r = jnp.broadcast_to(
                hyc[:, :, None], (nens, nz, C)).reshape(-1, 1)
            hyt_r = jnp.broadcast_to(
                hyt[:, :, None], (nens, nz, C)).reshape(-1, 1)
            SF, TF, FO = unpack(direction_fluxes_pallas_sub(
                resh, lo_r, hi_r, hyr_r, hyt_r, cn, *args[1:], nchunk=C,
                **kw))
            if div_scale is None:
                SF = _stitch_chunk_faces(SF, nens, nz, C, cn, nx)
            TF = _stitch_chunk_faces(TF, nens, nz, C, cn, nx)
        elif axis == _AX_Y:
            # no usable chunk size: transpose y onto lanes, lane kernel.
            # acc rides along via the same transpose (a real copy -- this
            # branch only fires when no chunk size divides ny, where the
            # transposes already dominate; correctness over memory there).
            moved = jnp.moveaxis(prim, -2, -1)     # (nvar, E, Z, X, n)
            flat = moved.reshape(nvar, nens * nz * nx, n)
            if acc is not None:
                kw["acc"] = jnp.moveaxis(acc, -2, -1).reshape(
                    NUM_STATE, nens * nz * nx, n)
            lo_f = hi_f = None
            if self_bc is None:
                lo_f = jnp.moveaxis(lo, -2, -1).reshape(
                    nvar, nens * nz * nx, hw)
                hi_f = jnp.moveaxis(hi, -2, -1).reshape(
                    nvar, nens * nz * nx, hw)
            hyr_rows = jnp.broadcast_to(
                hyc[:, :, None], (nens, nz, nx)).reshape(-1)
            hyt_rows = jnp.broadcast_to(
                hyt[:, :, None], (nens, nz, nx)).reshape(-1)
            hyr_f = jnp.broadcast_to(hyr_rows[:, None], (hyr_rows.size, n + 1))
            hyt_f = jnp.broadcast_to(hyt_rows[:, None], (hyr_rows.size, n + 1))
            SF, TF, FO = unpack(direction_fluxes_pallas(flat, lo_f, hi_f, hyr_f, hyt_f,
                                             *args, **kw))
            y_lane_layout = True
        else:  # _AX_Z
            if prim_parts is not None and self_bc is not None:
                resh = _local((nens, n, ny * nx))
            else:
                resh = prim.reshape(nvar, nens, n, ny * nx)
            if acc is not None:
                kw["acc"] = acc.reshape(NUM_STATE, nens, n, ny * nx)
            lo_r = hi_r = None
            if self_bc is None:
                lo_r = lo.reshape(nvar, nens, hw, ny * nx)
                hi_r = hi.reshape(nvar, nens, hw, ny * nx)
            SF, TF, FO = unpack(direction_fluxes_pallas_sub(
                resh, lo_r, hi_r, hye, hyte, *args,
                lane_block=_Z_LANE_BLOCK, **kw))

        # Unflatten back to the (nv, nens, nz, ny, nx) layout (m = n+1
        # faces, or n cells for the in-kernel state divergence).
        def back(F, m):
            nv = F.shape[0]
            if axis == _AX_X:
                return F.reshape(nv, nens, nz, ny, m)
            if axis == _AX_Y:
                if y_lane_layout:
                    return jnp.moveaxis(
                        F.reshape(nv, nens, nz, nx, m), -1, -2)
                return F.reshape(nv, nens, nz, m, nx)
            return F.reshape(nv, nens, m, ny, nx)

        m_s = n if div_scale is not None else n + 1
        if emit_fo:
            # fo is cell-shaped in every layout (chunked rows reshape
            # directly: chunk-major x within-chunk order is contiguous y)
            ntr = FO.shape[0]
            if axis == _AX_Y and not y_lane_layout and FO.ndim == 4 \
                    and FO.shape[1] != nens * nz:
                FO = FO.reshape(ntr, nens, nz, ny, nx)
            else:
                FO = back(FO, n)
        # face count of the tracer output: lane layouts keep faces on the
        # last axis (n or n+1 -- the aligned x form is n-wide), sublane
        # layouts on axis -2
        m_t = (TF.shape[-1] if axis == _AX_X or y_lane_layout
               else TF.shape[-2])
        if emit_fo:
            return back(SF, m_s), back(TF, m_t), FO
        return back(SF, m_s), back(TF, m_t)

    def _fct_div_pallas(self, grid, tr, positive, Fx, Fy, Fz, FOx, FOy, FOz,
                        dt, rk=None):
        """FCT + tracer-flux divergence via fused kernels (single-device
        Pallas path).  The per-direction outflow partials FO* came from the
        direction megakernels (cell-shaped, aligned), so the multiplier is
        one fused elementwise pass; the face scaling + divergence then runs
        in per-direction kernels that read each array exactly once
        (ops/pallas_recon.fct_scale_div_pallas{,_sub}).  Same math as
        _fct + div (dynamics...h:498-516), to rounding."""
        from ..ops.pallas_recon import (fct_scale_div_pallas,
                                        fct_scale_div_pallas_sub)

        dx, dy, dz = grid.dx, grid.dy, grid.dz
        vol = dx * dy * dz
        ntr = tr.shape[0]
        # Compute the multiplier in collapsed 2-D (ntr, cells) form: the
        # three kfct calls below view it as three different 3-/4-D
        # collapses, all bitcasts of one row-major buffer.  Computing it
        # 5-D lets XLA pick a permuted layout for the fusion output and
        # then COPY at each pallas row-major operand boundary -- two
        # 1.17G relayouts at 1024^2x100 (r05 queue-6 allocation table).
        mass_avail = jnp.maximum(tr.reshape(ntr, -1), 0.0) * vol
        fo = FOx.reshape(ntr, -1) + FOz.reshape(ntr, -1)
        if FOy is not None:
            fo = fo + FOy.reshape(ntr, -1)
        mass_out = fo * dt * vol
        need = mass_out > mass_avail
        tiny = 1e-300 if tr.dtype == jnp.float64 else 1e-30
        mult = jnp.where(need, mass_avail / jnp.maximum(mass_out, tiny), 1.0)
        pos = jnp.asarray(positive, bool)[:, None]
        mult = jnp.where(pos, mult, 1.0)

        nens, nz, ny, nx = grid.nens, grid.nz, grid.ny, grid.nx
        # rk (final direction): (coefs, tr0, tr1) -- the SSPRK3 tracer
        # stage update + positivity clamp run in the last pass's epilogue
        # (the tracer analog of the state-side MWML_RK_FUSE)
        rk_full = None
        if rk is not None:
            rk_full = (*rk, tuple(bool(b) for b in positive))
        # x: lanes layout
        t = fct_scale_div_pallas(
            Fx.reshape(ntr, nens * nz * ny, nx + 1),
            mult.reshape(ntr, nens * nz * ny, nx), None, nx, 1.0 / dx)
        # z: sublane layout, accumulating (tendency buffer donated on)
        t = fct_scale_div_pallas_sub(
            Fz.reshape(ntr, nens, nz + 1, ny * nx),
            mult.reshape(ntr, nens, nz, ny * nx),
            t.reshape(ntr, nens, nz, ny * nx), nz, 1.0 / dz,
            rk=None if Fy is not None else rk_full)
        if Fy is not None:
            t = fct_scale_div_pallas_sub(
                Fy.reshape(ntr, nens * nz, ny + 1, nx),
                mult.reshape(ntr, nens * nz, ny, nx),
                t.reshape(ntr, nens * nz, ny, nx), ny, 1.0 / dy,
                rk=rk_full)
        return t.reshape(ntr, nens, nz, ny, nx)

    def _fct_mult(self, grid, tr, positive, Fx, Fy, Fz, dt,
                  x_aligned=False):
        """Per-cell FCT multiplier (the ``mult`` of dynamics...h:498-509):
        1 where the cell's outgoing tracer mass fits its available mass,
        mass_avail/mass_out where it would overdraw."""
        dx, dy, dz = grid.dx, grid.dy, grid.dz
        vol = dx * dy * dz
        mass_avail = jnp.maximum(tr, 0.0) * vol
        if x_aligned:
            fo_x = (jnp.maximum(jnp.roll(Fx, -1, axis=_AX_X), 0.0)
                    - jnp.minimum(Fx, 0.0)) / dx
        else:
            fo_x = (jnp.maximum(_slice_axis(Fx, _AX_X, 1, grid.nx + 1), 0.0)
                    - jnp.minimum(_slice_axis(Fx, _AX_X, 0, grid.nx), 0.0)) / dx
        fo_z = (jnp.maximum(_slice_axis(Fz, _AX_Z, 1, grid.nz + 1), 0.0)
                - jnp.minimum(_slice_axis(Fz, _AX_Z, 0, grid.nz), 0.0)) / dz
        if Fy is not None:
            fo_y = (jnp.maximum(_slice_axis(Fy, _AX_Y, 1, grid.ny + 1), 0.0)
                    - jnp.minimum(_slice_axis(Fy, _AX_Y, 0, grid.ny), 0.0)) / dy
        else:
            fo_y = 0.0
        mass_out = (fo_x + fo_y + fo_z) * dt * vol
        need = mass_out > mass_avail
        mult = jnp.where(need, mass_avail / jnp.maximum(mass_out, 1e-300 if tr.dtype == jnp.float64 else 1e-30), 1.0)
        pos = jnp.asarray(positive, bool)[:, None, None, None, None]
        return jnp.where(pos, mult, 1.0)

    def _fct_scale_dir(self, grid, mult, F, axis, spmd=None):
        """Apply the FCT multiplier to one direction's (n+1)-face array
        from the upwind (outflow) side."""
        mesh_ax = spmd.get(axis) if spmd is not None else None
        if mesh_ax is not None:
            from ..parallel.halo import exchange_face_scalar
            name, ns = mesh_ax
            left, right = exchange_face_scalar(mult, axis, name, ns)
        else:
            ones_shape = list(mult.shape)
            ones_shape[axis] = 1
            left = right = jnp.ones(ones_shape, mult.dtype)
        mult_left = jnp.concatenate([left, mult], axis=axis)   # face f <- cell f-1
        mult_right = jnp.concatenate([mult, right], axis=axis)  # face f <- cell f
        return F * jnp.where(F > 0, mult_left, jnp.where(F < 0, mult_right, 1.0))

    def _fct_scale_x_aligned(self, grid, mult, Fx):
        """Reference outflow-side-only scaling on the ALIGNED x array:
        face 0's copy is never left-scaled (its left cell is the
        neighbor copy's business), the seam copy (face nx) is scaled
        only by cell nx-1's multiplier when flux is outward.  Returns
        (left_faces, seam)."""
        mult_prev = jnp.roll(mult, 1, axis=_AX_X)
        at0 = jnp.arange(grid.nx) == 0
        mult_left = jnp.where(at0, 1.0, mult_prev)
        LF = Fx * jnp.where(Fx > 0, mult_left,
                            jnp.where(Fx < 0, mult, 1.0))
        seam_v = _slice_axis(Fx, _AX_X, 0, 1)
        seam = seam_v * jnp.where(seam_v > 0,
                                  _slice_axis(mult, _AX_X,
                                              grid.nx - 1, grid.nx),
                                  1.0)
        return LF, seam

    def _fct(self, grid, tr, positive, Fx, Fy, Fz, dt, spmd=None,
             x_aligned=False):
        """Flux-corrected transport: scale outgoing tracer fluxes so no cell
        can be driven negative (dynamics...h:498-516), rewritten functionally:
        compute a per-cell multiplier, apply it to each face from the
        upwind (outflow) side.

        ``x_aligned``: Fx holds nx ALIGNED left faces of a periodic
        whole-axis x (face i of cell i; the seam face nx pre-scale equals
        face 0).  Scaling then preserves the reference's duplicated-seam
        semantics exactly -- each seam copy is scaled only from its
        outflow cell's side -- by returning (left_faces, seam) with the
        seam copy scaled separately."""
        mult = self._fct_mult(grid, tr, positive, Fx, Fy, Fz, dt,
                              x_aligned=x_aligned)
        if x_aligned:
            Fx = self._fct_scale_x_aligned(grid, mult, Fx)
        else:
            Fx = self._fct_scale_dir(grid, mult, Fx, _AX_X, spmd)
        Fz = self._fct_scale_dir(grid, mult, Fz, _AX_Z, spmd)
        if Fy is not None:
            Fy = self._fct_scale_dir(grid, mult, Fy, _AX_Y, spmd)
        return Fx, Fy, Fz

    def _tendencies(self, grid, consts, hy, immersed, positive, spmd, s, tr,
                    dt, rk=None):
        """One semi-discrete RHS evaluation (dynamics...h:204-552).

        ``rk`` (from _ssprk3 under _rk_fuse_on): (coefs, b0, b1) -- the
        final direction kernel emits the SSPRK3 stage update (including
        the gravity/Coriolis sources) instead of the tendency, and the
        STATE part of the return value is the updated state."""
        hyc = hy[0][:, :, None, None]
        full_r = s[IDR] + hyc
        sim2d = grid.sim2d

        # De-densitized variables (dynamics...h:248-255): rho', u, v, w,
        # (rho theta)', tracer concentrations -- computed ONCE, shared by
        # all three direction pipelines.
        prim_parts = (s[IDR:IDU], s[IDU:IDT] / full_r, s[IDT:IDT + 1],
                      tr / full_r)
        prim = jnp.concatenate(prim_parts)

        # Pallas kernels emit the state divergence contribution directly
        # (state fluxes are never FCT-limited, so their faces need not
        # round-trip through HBM); the XLA path emits faces.
        #
        # MWML_FCT_PALLAS=1 (experiment, default OFF): the megakernels also
        # emit the per-cell FCT outflow partial and the scale+divergence
        # runs in fused kernels.  STANDALONE the XLA fct+div measures
        # 11.6 ms/RHS vs ~4 for the kernels, but at the FULL-STEP level the
        # kernel path LOSES (176 -> 195 ms/step at 512x512x64): XLA was
        # already fusing the divergence into the RK stage update, and the
        # kernel boundary forces t_tend/mult materializations that cost
        # more than the re-sliced faces.  Kept as a flag because the
        # trade-off may flip on other shapes/generations.
        kdiv = self.riemann_impl == "pallas"
        ntracers = prim.shape[0] - NUM_STATE
        import os as _os
        kfct = self._kfct_on(grid, spmd, ntracers)
        ds_x = (1.0 / grid.dx) if kdiv else None
        ds_y = (1.0 / grid.dy) if kdiv else None
        ds_z = (1.0 / grid.dz) if kdiv else None

        # In-kernel state-divergence accumulation (MWML_DIV_ACC 0/1/auto,
        # default auto = on whenever the megakernels emit divergences):
        # chain the directions x -> z -> y, each kernel ADDING its
        # contribution to the running tendency with the accumulator's HBM
        # buffer donated to the kernel output (input_output_aliases).  One
        # state-tendency buffer stays live instead of three, the XLA
        # s_tend = SFx+SFz+SFy add temps disappear (the 1024^2x100
        # single-chip HBM-fit lever), and the adds themselves ride the
        # kernels.  The sum keeps the same association order but runs in
        # strict f32 inside the kernel, where the XLA-add form may fuse
        # with excess precision -- measured difference is a few ulp
        # (tests/test_pallas.py pins it at 1e-5 relative).  Auto-gated to
        # big grids: at 512^2x64 the chained kernels measured 107.7 vs
        # 108.7 Mcellups (lost x/z launch overlap), so small grids keep
        # the XLA adds.
        n_cells = grid.nens * grid.nz * grid.ny * grid.nx
        acc_env = _os.environ.get("MWML_DIV_ACC", "auto")
        use_acc = kdiv and (acc_env == "1"
                            or (acc_env == "auto" and n_cells >= _ACC_CELLS))
        if rk is not None:
            assert kdiv and not sim2d and not consts.use_immersed
            use_acc = True  # the rk epilogue rides the accumulator chain
        split_env = _os.environ.get("MWML_PRIM_SPLIT", "auto")
        parts = prim_parts if (kdiv and (split_env == "1" or (
            split_env == "auto" and n_cells >= _ACC_CELLS))) else None
        out_x = self._direction_fluxes(
            grid, consts, hy, prim, _AX_X, grid.nx, consts.bc_x, IDU, spmd,
            div_scale=ds_x, emit_fo=kfct, prim_parts=parts)
        if kfct:
            SFx, TFx, FOx = out_x
        else:
            SFx, TFx = out_x
        out_z = self._direction_fluxes(
            grid, consts, hy, prim, _AX_Z, grid.nz, consts.bc_z, IDW, spmd,
            div_scale=ds_z, emit_fo=kfct, acc=SFx if use_acc else None,
            prim_parts=parts)
        if kfct:
            SFz, TFz, FOz = out_z
        else:
            SFz, TFz = out_z
        if use_acc:
            SFx = jnp.zeros((), SFz.dtype)  # folded into SFz by the kernel
        # HBM-limit sequencing (MWML_DIR_SEQ 0/1/auto, default auto: on for
        # grids past the previous single-chip fit limit): fold the x/z
        # state divergences into ONE buffer before the y kernel launches
        # and make the y kernel's input depend on that sum, so buffer
        # assignment reuses the x/z output space instead of holding all
        # three 5-var direction outputs live at the peak.  Subsumed by the
        # in-kernel accumulation above (aliasing makes the dependency
        # real); kept for the MWML_DIV_ACC=0 fallback.
        seq_mode = _os.environ.get("MWML_DIR_SEQ", "auto")
        seq = (kdiv and not use_acc and not sim2d and not kfct
               and (seq_mode == "1"
                    or (seq_mode == "auto"
                        and grid.nens * grid.nz * grid.ny * grid.nx
                        >= _SEQ_CELLS)))
        if seq:
            SFx = SFx + SFz
            SFz = jnp.zeros((), SFx.dtype)
            prim, SFx = jax.lax.optimization_barrier((prim, SFx))
        if sim2d:
            SFy = TFy = FOy = None
        else:
            rk_full = None
            if rk is not None:
                coefs, b0, b1, _tr0, _tr1 = rk
                grav_f = consts.grav if consts.enable_gravity else 0.0
                rk_full = (coefs, b0, b1, grav_f, consts.fcor)
            out_y = self._direction_fluxes(
                grid, consts, hy, prim, _AX_Y, grid.ny, consts.bc_y, IDV,
                spmd, div_scale=ds_y, emit_fo=kfct,
                acc=SFz if use_acc else None, prim_parts=parts,
                rk=rk_full)
            if kfct:
                SFy, TFy, FOy = out_y
            else:
                SFy, TFy = out_y
            if use_acc:
                SFz = jnp.zeros((), SFy.dtype)  # folded into SFy

        def div(F, axis, n, dxi):
            return -(_slice_axis(F, axis, 1, n + 1) - _slice_axis(F, axis, 0, n)) / dxi

        if kfct:
            tr_rk = None
            if rk is not None:
                coefs_, _b0, _b1, tr0, tr1 = rk
                tr_rk = (coefs_, tr0, tr1)
            t_tend = self._fct_div_pallas(grid, tr, positive, TFx, TFy, TFz,
                                          FOx, FOy, FOz, dt, rk=tr_rk)
        else:
            x_aligned = ntracers > 0 and TFx.shape[-1] == grid.nx
            # MWML_TR_SEQ 0/1/auto (default auto: >= _ACC_CELLS): sequence
            # the per-direction tracer scale+divergence passes the way
            # MWML_DIR_SEQ sequences the state side.  The barriers carry
            # the UNSCALED faces + the shared multiplier (both already
            # materialized) so each direction's scale fuses into its
            # divergence-accumulate AFTER the barrier -- barriering the
            # scaled faces instead forces ~1.26G-per-direction extra
            # materializations and measured a net fit LOSS (queue 11,
            # 19.39G vs 16.26G at 1024^2x100).  One div temp live instead
            # of three.  Replaces the kfct kernels as the tracer-side fit
            # lever (see _kfct_on: those relayout-copy their way to a net
            # fit LOSS too).
            trseq_env = _os.environ.get("MWML_TR_SEQ", "auto")
            trseq = (ntracers > 0 and not sim2d
                     and (trseq_env == "1"
                          or (trseq_env == "auto"
                              and n_cells >= _ACC_CELLS)))
            if trseq:
                mult = self._fct_mult(grid, tr, positive, TFx, TFy, TFz,
                                      dt, x_aligned=x_aligned)
                TFx = (self._fct_scale_x_aligned(grid, mult, TFx)
                       if x_aligned
                       else self._fct_scale_dir(grid, mult, TFx, _AX_X,
                                                spmd))
            else:
                TFx, TFy, TFz = self._fct(grid, tr, positive, TFx, TFy,
                                          TFz, dt, spmd,
                                          x_aligned=x_aligned)
            if x_aligned:
                # cell i's right face is LF[i+1] (periodic roll), except
                # cell nx-1 whose right face is the separately-scaled seam
                LF, seam = TFx
                right = jnp.roll(LF, -1, axis=_AX_X)
                at_last = jnp.arange(grid.nx) == grid.nx - 1
                right = jnp.where(at_last, seam, right)
                t_tend = -(right - LF) / grid.dx
            else:
                t_tend = div(TFx, _AX_X, grid.nx, grid.dx)
            if trseq:
                TFz, mult, t_tend = jax.lax.optimization_barrier(
                    (TFz, mult, t_tend))
                TFz = self._fct_scale_dir(grid, mult, TFz, _AX_Z, spmd)
            t_tend = t_tend + div(TFz, _AX_Z, grid.nz, grid.dz)
            if not sim2d:
                if trseq:
                    TFy, mult, t_tend = jax.lax.optimization_barrier(
                        (TFy, mult, t_tend))
                    TFy = self._fct_scale_dir(grid, mult, TFy, _AX_Y,
                                              spmd)
                t_tend = t_tend + div(TFy, _AX_Y, grid.ny, grid.dy)

        if rk is not None:
            # SFy IS the updated stage state (sources applied in-kernel)
            return SFy, t_tend

        if kdiv:
            s_tend = SFx + SFz
        else:
            s_tend = (div(SFx, _AX_X, grid.nx, grid.dx)
                      + div(SFz, _AX_Z, grid.nz, grid.dz))
        if not sim2d:
            s_tend = s_tend + (SFy if kdiv
                               else div(SFy, _AX_Y, grid.ny, grid.dy))

        # Gravity + Coriolis sources (dynamics...h:524-527).
        if consts.enable_gravity:
            s_tend = s_tend.at[IDW].add(-consts.grav * full_r)
        if consts.fcor != 0.0:
            s_tend = s_tend.at[IDU].add(consts.fcor * s[IDV])
            s_tend = s_tend.at[IDV].add(-consts.fcor * s[IDU])
        if sim2d:
            s_tend = s_tend.at[IDV].set(0.0)

        # Immersed-boundary relaxation blending (dynamics...h:534-550).
        if consts.use_immersed:
            tau = 1.0e3 * dt
            fac = -min(1.0, dt / tau) / dt
            imm_tend = fac * s
            prop = immersed[None]
            s_tend = prop * imm_tend + (1.0 - prop) * s_tend
        return s_tend, t_tend
