"""Shared experiment-driver machinery.

Mirrors the reference driver pattern (experiments/supercell_example/
driver.cpp:9-88): read YAML -> allocate coupler -> module init -> main loop
{compute dt, module time_steps} -> finalize, plus the ``Etime, dtphys, maxw``
heartbeat (dynamics...h:186-196) and periodic NetCDF output.

Differences: output/heartbeat live in the driver loop instead of inside the
dycore's time_step (identical content and cadence), and the composed module
chain for one physics step is jit-compiled as a single function per distinct
dt (the auto-CFL path keeps dt constant, so normally two compiles per run:
main dt + the final partial step).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..core.coupler import CouplerState, make_coupler_state
from ..io.netcdf import StateWriter

__all__ = ["setup_state", "run_main_loop", "Timers"]

# Grids at/above this many cells skip the jit warm-up call (the warm-up
# copy + step working set would exceed HBM); their first, compiling step is
# timed under "first_step_compile" instead of "simulation_loop".
_WARMUP_SKIP_CELLS = 52_000_000


class Timers:
    """Wall-clock section timers (the reference uses yakl::timer_start/stop,
    e.g. community_benchmark/driver.cpp:66,82)."""

    def __init__(self):
        self.acc: dict[str, float] = {}
        self.counts: dict[str, int] = {}  # e.g. steps timed per section
        self._open: dict[str, float] = {}

    def start(self, name: str):
        self._open[name] = time.perf_counter()

    def stop(self, name: str):
        self.acc[name] = self.acc.get(name, 0.0) + time.perf_counter() - self._open.pop(name)

    def report(self) -> str:
        return "\n".join(f"  {k:<24s} {v:10.3f} s" for k, v in self.acc.items())


def setup_state(config: SimConfig) -> CouplerState:
    """Allocate the coupler state and stash driver-level options
    (reference driver.cpp:34-47)."""
    if config.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    state = make_coupler_state(config.grid, dtype=config.dtype)
    return state.set_options(
        out_prefix=config.out_prefix,
        init_data=config.init_data,
        out_freq=config.out_freq,
        enable_gravity=config.enable_gravity,
        file_per_process=config.file_per_process,
        standalone_input_file=config.config_path,
    )


def run_main_loop(
    state: CouplerState,
    config: SimConfig,
    step_modules: Sequence[Callable[[CouplerState, float], CouplerState]],
    dycore,
    writer: StateWriter | None = None,
    timers: Timers | None = None,
    on_step: Callable[[CouplerState, float, float], None] | None = None,
    quiet: bool = False,
    jit_chain: bool = True,
    etime0: float = 0.0,
    checkpoint_freq: float = -1.0,
    checkpoint_path: str = "",
    validate: bool = False,
) -> CouplerState:
    """The reference main loop (driver.cpp:64-80) with heartbeat + output.

    ``jit_chain=True`` fuses the whole module chain into one jitted step (the
    fast path).  ``jit_chain=False`` jits each module separately and runs
    modules marked with ``_host_side = True`` eagerly -- needed by the
    surrogate data-harvesting drivers whose hooks accumulate on host.

    ``on_step`` contract: the carried state is DONATED into the next step
    (jit_chain path), so the callback must not retain device references to
    the state it receives past its own return -- fetch scalars/host copies
    (``float(...)``, ``np.asarray(...)``) instead.  All in-tree callers do.
    """
    timers = timers or Timers()
    etime = etime0
    dtphys_in = config.dt_phys
    out_freq = config.out_freq
    num_out = int(etime0 / out_freq) if out_freq > 0 else 0
    num_chk = int(etime0 / checkpoint_freq) if checkpoint_freq > 0 else 0

    compiled: dict[float, Callable] = {}
    warmed: set[float] = set()  # dts whose executable has already run once

    def get_step(dt: float):
        # Snap to an existing key: float accumulation of etime can make the
        # final partial dt differ from the predicted one by roundoff.
        for k in compiled:
            if abs(dt - k) < 1e-9 * max(abs(dt), abs(k), 1e-30):
                return k, compiled[k]
        if dt not in compiled:
            if jit_chain:
                def whole_step(s):
                    for mod in step_modules:
                        s = mod(s, dt)
                    return s
                # Wrap the chain in a length-1 lax.scan (bench.py's fused
                # loop structure): the scan carry forces XLA to alias the
                # step's in/out buffers INSIDE the program, which changes
                # buffer assignment exactly at the HBM-limit grids --
                # measured 106.4 Mcellups (scan, bench inner=1) vs 33.5
                # (flat driver step) at 1024x1024x64.  MWML_DRIVER_SCAN=0
                # keeps the flat form for A/B.
                if os.environ.get("MWML_DRIVER_SCAN", "1") == "1":
                    def stepper(s):
                        return jax.lax.scan(
                            lambda c, _: (whole_step(c), None), s, None,
                            length=1)[0]
                else:
                    stepper = whole_step
                # Donate the carried state so the in/out buffers alias --
                # the same policy as bench.py's fused loop.  Required for
                # the HBM-limit grids (the 1024^2-class community
                # benchmark) to fit through the per-step driver path; the
                # loop below rebinds `state` each step and nothing holds
                # device references to the previous step's buffers.
                compiled[dt] = jax.jit(stepper, donate_argnums=0)
                # Warm the jit cache with a discarded call so compilation
                # never lands inside the timed loop.  (AOT lower().compile()
                # executables are pathologically slow on the axon TPU
                # platform, so warm-up goes through the traced wrapper.)
                # The warm-up input is a COPY so donation cannot invalidate
                # the caller's state; on HBM-limit grids (where copy + step
                # working set would not fit) skip the warm-up and let the
                # first loop step carry the compile instead -- that step is
                # then timed under "first_step_compile", NOT inside
                # "simulation_loop", so the benchmark's compile-outside-
                # the-timer invariant holds at every grid size.
                if state["density_dry"].size < _WARMUP_SKIP_CELLS:
                    out = compiled[dt](
                        jax.tree_util.tree_map(jnp.copy, state))
                    float(jnp.max(out["temp"]))  # value fetch = axon sync
                    warmed.add(dt)
            else:
                jitted = [
                    (lambda s, _m=mod: _m(s, dt))
                    if getattr(mod, "_host_side", False)
                    else jax.jit(lambda s, _m=mod: _m(s, dt))
                    for mod in step_modules
                ]

                def whole_step(s, _mods=jitted):
                    for mod in _mods:
                        s = mod(s)
                    return s
                compiled[dt] = whole_step
                warmed.add(dt)  # per-module jit path has no donation hazard
        return dt, compiled[dt]

    # Pre-compile outside the timed loop.  dt is constant across the run
    # (compute_time_step is static), so the two distinct dts -- the main one
    # and the final partial step -- are known up front.
    dt_main = dycore.compute_time_step(state) if dtphys_in <= 0.0 else dtphys_in
    get_step(dt_main)
    nfull = int((config.sim_time - etime0) / dt_main)
    dt_last = config.sim_time - etime0 - nfull * dt_main
    if 1e-12 * dt_main < dt_last < dt_main:
        get_step(dt_last)

    if writer is not None and out_freq >= 0.0 and etime0 == 0.0:
        writer.write(state, 0.0)

    timers.start("simulation_loop")
    while etime < config.sim_time:
        dtphys = dycore.compute_time_step(state) if dtphys_in <= 0.0 else dtphys_in
        if etime + dtphys > config.sim_time:
            dtphys = config.sim_time - etime
        key, step_fn = get_step(dtphys)
        if key not in warmed:
            # First execution of this executable (warm-up was skipped on an
            # HBM-limit grid): carry the compile in its own timer section so
            # simulation_loop stays a steady-state measurement.  DRAIN the
            # pending async steps into simulation_loop first (a value fetch
            # is the only honest sync on the axon platform) -- otherwise
            # their execution time lands in this compile section and the
            # loop timer records dispatch cost only (measured: 52 steps
            # "in 0.052 s" with 188 s booked to the compile section).
            float(jnp.max(state["temp"]))
            timers.stop("simulation_loop")
            timers.start("first_step_compile")
            state = step_fn(state)
            float(jnp.max(state["temp"]))  # value fetch = axon sync
            timers.stop("first_step_compile")
            timers.start("simulation_loop")
            warmed.add(key)
            timers.counts["first_step_compile"] = (
                timers.counts.get("first_step_compile", 0) + 1)
        else:
            state = step_fn(state)
        etime += dtphys
        if on_step is not None:
            on_step(state, dtphys, etime)
        if validate:
            problems = state.validate()
            if problems:
                raise FloatingPointError(
                    f"state validation failed at etime={etime:g}: {problems}"
                    " (reference DataManager::validate analog)")
        if out_freq >= 0.0 and etime / out_freq >= num_out + 1:
            if writer is not None:
                writer.write(state, etime)
            num_out += 1
            maxw = float(jnp.max(jnp.abs(state["wvel"])))
            if not quiet:
                # heartbeat format mirrors dynamics...h:193-195
                print(f"Etime , dtphys, maxw: {etime:10.6e} , "
                      f"{dtphys:10.6e} , {maxw:10.6e}", flush=True)
        if (checkpoint_freq > 0.0 and checkpoint_path
                and etime / checkpoint_freq >= num_chk + 1):
            from ..io.checkpoint import save_checkpoint
            save_checkpoint(checkpoint_path, state, etime)
            num_chk += 1
    # Force device sync with a value fetch so the timer is honest:
    # block_until_ready returns early on the experimental axon TPU platform.
    float(jnp.max(state["temp"]))
    timers.stop("simulation_loop")
    return state
