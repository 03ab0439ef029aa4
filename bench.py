"""Headline benchmark: supercell cell-updates/sec on one chip.

Runs the community_benchmark physics chain (WENO Euler dycore + Kessler +
sponge + nudging, reference experiments/community_benchmark/driver.cpp) on a
single-chip supercell grid, times a fixed number of fully-compiled steps, and
prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "Mcellups", "vs_baseline": N}

``vs_baseline`` is measured throughput divided by the 10 Mcell-updates/s
nominal CPU-node figure from BASELINE.md's north-star target (the reference
publishes no numbers; BASELINE.json's target is >=10x a CPU node, so
vs_baseline >= 10 means the target is met).

Env overrides: MWML_BENCH_NX/NY/NZ/STEPS; MWML_BENCH_FAST=1 for a reduced
capture (smaller grid, fewer steps) that fits inside a tunnel-wedge
recovery window; MWML_BENCH_PROBE_S for the device-probe horizon.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax

# MWML_BENCH_CPU=1 pins the host CPU backend (for tests/smoke runs; the
# axon TPU plugin ignores the JAX_PLATFORMS env var, so an explicit config
# update before backend init is the only way to opt out of the chip).
if os.environ.get("MWML_BENCH_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

from miniweatherml_tpu.config import config_from_dict
from miniweatherml_tpu.experiments.supercell_example import build

_BASELINE_MCELLUPS = 10.0  # nominal CPU-node throughput (BASELINE.md north star)


def _finish(payload: dict) -> None:
    """Print the single JSON result line and terminate with rc 0.

    ``os._exit`` skips interpreter/C++ teardown: if the device probe thread
    was abandoned (wedged tunnel), normal exit aborts with rc 134
    ("terminate called ... FATAL: exception not rethrown") -- the round-2
    failure mode.  The honest-zero path must exit cleanly."""
    print(json.dumps(payload), flush=True)
    sys.stderr.flush()
    os._exit(0)


def _device_alive(timeout_s: float) -> bool:
    """Probe the device with a tiny computation under a watchdog.  The axon
    TPU tunnel wedges when a client is killed mid-execution; a full heal
    was probe-verified at ~20 minutes (2026-08-19), so wait out the whole
    window (default 22 min, MWML_BENCH_PROBE_S to override) before giving
    up, and only then report honestly instead of hanging the harness
    forever.  The blocked jax call completes as soon as the tunnel heals,
    so one long join IS the retry loop."""
    import threading

    ok = []

    def probe():
        x = jax.numpy.ones((8, 8))
        ok.append(float(jax.numpy.sum(x)))

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        t.join(min(60.0, max(0.0, deadline - time.monotonic())))
        if ok:
            return True
        if not t.is_alive():
            # the probe DIED (backend init raised) rather than hanging --
            # no point spinning out the rest of the horizon
            return False
        print(f"[bench] device probe still pending "
              f"({deadline - time.monotonic():.0f}s left in horizon)",
              file=sys.stderr, flush=True)
    return bool(ok)


def main() -> None:
    # Default horizon 22 min: covers the probe-verified ~20-min worst-case
    # tunnel-wedge heal (2026-08-19), so a wedge at run start still yields
    # a real measurement instead of a false honest-zero.
    probe_s = float(os.environ.get("MWML_BENCH_PROBE_S", 1320.0))
    if not _device_alive(probe_s):
        _finish({
            "metric": "supercell cell-updates/sec/chip "
                      "(DEVICE UNRESPONSIVE: axon TPU tunnel wedged; "
                      "no computation completes)",
            "value": 0.0,
            "unit": "Mcellups",
            "vs_baseline": 0.0,
        })
    on_tpu = jax.devices()[0].platform == "tpu"
    # FAST mode: a reduced capture (~1/20 the timed work, smaller compile)
    # sized to finish inside a wedge-recovery window.
    fast = os.environ.get("MWML_BENCH_FAST", "0") == "1"
    nx = int(os.environ.get("MWML_BENCH_NX",
                            (256 if fast else 512) if on_tpu else 64))
    ny = int(os.environ.get("MWML_BENCH_NY",
                            (256 if fast else 512) if on_tpu else 64))
    nz = int(os.environ.get("MWML_BENCH_NZ", 64 if on_tpu else 32))
    steps = int(os.environ.get("MWML_BENCH_STEPS",
                               (4 if fast else 10) if on_tpu else 3))
    # Steps fused into one device call via lax.scan: amortizes the per-call
    # dispatch latency of the axon TPU tunnel (~0.4 s/call measured).
    inner = int(os.environ.get("MWML_BENCH_INNER",
                               (5 if fast else 10) if on_tpu else 1))

    # community_benchmark supercell geometry (819.2 km x 819.2 km x 20 km,
    # reference experiments/community_benchmark/inputs/input_euler3d*.yaml),
    # scaled to the chosen grid at the same ~400 m/200 m resolution class.
    # MWML_BENCH_DTYPE=float64 records the double-precision datapoint (the
    # reference's `real` is double, main_header.h:59); f32 is the TPU-native
    # default and the headline configuration.
    dtype = os.environ.get("MWML_BENCH_DTYPE", "float32")
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    # MWML_BENCH_NENS: ensemble members advancing in lockstep in the same
    # kernels (leading nens axis; reference coupler.h:210 trailing nens).
    nens = int(os.environ.get("MWML_BENCH_NENS", 1))
    config = config_from_dict(dict(
        sim_time=1.0e9, nens=nens, nx_glob=nx, ny_glob=ny, nz=nz,
        xlen=400.0 * nx, ylen=400.0 * ny, zlen=200.0 * nz,
        init_data="supercell", out_prefix="bench", dt_phys=0.0, out_freq=-1.0,
        dtype=dtype,
    ))
    # MWML_BENCH_MICRO=p3 swaps Kessler for the P3 ice scheme (9 tracers;
    # reference microphysics_p3.h -- which stages state through the HOST
    # and calls serial Fortran per rank, where this chain stays fused
    # on-device).
    # MWML_BENCH_MICRO=surrogate swaps Kessler for the inline MLP micro
    # deployed online (reference microphysics_kessler_ponni.h:189 with the
    # ponni override active), using the shipped example model.
    # MWML_BENCH_CASE=city: the simple_city chain (wall-x immersed-building
    # flow + horizontal/top sponges + time averager, reference
    # experiments/simple_city/driver.cpp:8-88) at the city resolution class
    # (5 m cells) -- the one chain whose BC/immersed path is otherwise only
    # CPU-tested.  The dycore order/impl knobs are honored through the
    # config extras; the generic override below is skipped (the dycore is
    # not the first module in this chain).
    case = os.environ.get("MWML_BENCH_CASE", "supercell")
    micro_kind = os.environ.get("MWML_BENCH_MICRO", "kessler")
    if case == "city":
        from miniweatherml_tpu.experiments.simple_city import (
            build as build_city)
        ordv = int(os.environ.get("MWML_BENCH_ORD", 5))
        use_pallas = os.environ.get(
            "MWML_BENCH_PALLAS", "1" if on_tpu else "0") == "1"
        # the reference city DOMAIN (2000 x 2000 x 300 m, input_city.yaml)
        # at whatever resolution the bench grid implies -- the building
        # grid needs >= ~1.3 km of fetch, so the domain stays fixed
        config = config_from_dict(dict(
            sim_time=1.0e9, nens=nens, nx_glob=nx, ny_glob=ny, nz=nz,
            xlen=2000.0, ylen=2000.0, zlen=300.0,
            init_data="city", out_prefix="bench", dt_phys=0.0,
            out_freq=-1.0, enable_gravity=False, dtype=dtype,
            dyn_order=ordv, riemann_impl="pallas" if use_pallas else "xla",
            fast_weights=use_pallas and os.environ.get(
                "MWML_BENCH_FASTW", "1") == "1",
        ))
        state, mods, dycore, _ = build_city(config)
        micro_kind = "city"
    elif micro_kind == "p3":
        from miniweatherml_tpu.experiments.supercell_p3 import build as build_p3
        state, mods, dycore = build_p3(config)
        if os.environ.get("MWML_BENCH_P3_ACTIVE", "0") == "1":
            # All-cells-active worst case: seed every cell with small
            # cloud, rain, and (rimed) ice so every hydrometeor-presence
            # gate fires on every step -- the vectorized analog of the
            # reference's log_hydrometeorsPresent = true everywhere
            # (micro_p3.F90 p3_main section skips).  The default bench
            # init is the presence-gated early-storm best case.
            # NOTE: this mutates tracer masses WITHOUT re-deriving the dry
            # density, so rho_d + sum(mass tracers) no longer equals the
            # rho the dycore was initialized with (off by <= ~4.5e-4
            # kg/kg).  Deliberate: this is a THROUGHPUT mode measuring the
            # ungated instruction stream, not a physics run -- do not use
            # its output fields for anything but timing.
            import jax.numpy as _jnp
            seeds = {"cloud_water": 1.0e-4, "cloud_water_num": 1.0e7,
                     "rain": 1.0e-4, "rain_num": 1.0e5,
                     "ice": 1.0e-4, "ice_num": 1.0e5,
                     "ice_rime": 5.0e-5, "ice_rime_vol": 1.0e-7}
            state = state.replace_fields(**{
                k: _jnp.maximum(state[k], v) for k, v in seeds.items()})
    elif micro_kind == "surrogate":
        from miniweatherml_tpu.experiments.inference_surrogate import (
            build as build_sur)
        from miniweatherml_tpu.ml.mlp import load_keras_h5, load_scaling
        from miniweatherml_tpu.physics.kessler_surrogate import (
            MicrophysicsKesslerSurrogate)
        here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "inputs", "examples")
        micro = MicrophysicsKesslerSurrogate(
            load_keras_h5(os.path.join(
                here, "supercell_kessler_singlecell_model_weights.h5")),
            load_scaling(os.path.join(
                here, "supercell_kessler_input_scaling.txt"), 5),
            load_scaling(os.path.join(
                here, "supercell_kessler_output_scaling.txt"), 4),
            online=True, compare=False)
        state, mods, dycore = build_sur(config, micro=micro)
    else:
        state, mods, dycore = build(config)
    # MWML_BENCH_ORD=3 matches the reference's own benchmark builds
    # (-DMW_ORD=3 in build/machines/aws/aws_a100_gpu.env); default is the
    # reference's default order 5.  MWML_BENCH_PALLAS=1 uses the VMEM
    # megakernel path.
    ordv = int(os.environ.get("MWML_BENCH_ORD", 5))
    # Single-chip default: the Pallas megakernel path with approximate-
    # reciprocal WENO-weight normalization (MWML_BENCH_FASTW=0 for the exact
    # path).  fast_weights perturbs reconstructed edge values at ~1e-5
    # relative in general (euler.py docs); on the round-1 chip the step
    # output happened to match the XLA path exactly, but that is an
    # empirical observation, not a guarantee.  (The XLA path stays the
    # library default because auto-SPMD cannot partition pallas_call; opt
    # out with MWML_BENCH_PALLAS=0.)
    use_pallas = os.environ.get("MWML_BENCH_PALLAS", "1" if on_tpu else "0") == "1"
    # Mosaic TPU kernels are f32-only; the f64 datapoint runs the XLA path.
    if dtype == "float64":
        use_pallas = False
    if case != "city" and (ordv != 5 or use_pallas):
        from miniweatherml_tpu.dycore.euler import Dycore
        dy = Dycore(ord=ordv,
                    riemann_impl="pallas" if use_pallas else "xla",
                    fast_weights=use_pallas and
                    os.environ.get("MWML_BENCH_FASTW", "1") == "1")
        mods = [dy.time_step] + list(mods[1:])
        dycore = dy
    dt = dycore.compute_time_step(state)

    # donate the carry: the input state's buffers are reused for the
    # output, saving one full state copy of HBM at the largest grids.
    # MWML_COMPILER_OPTS="flag=val,..." forwards XLA:TPU compiler options
    # (client XLA_FLAGS rejects TPU-only flag names; jit's
    # compiler_options is the channel that reaches the remote compiler).
    copts = {}
    for kv in os.environ.get("MWML_COMPILER_OPTS", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            copts[k.strip()] = v.strip()

    @functools.partial(jax.jit, donate_argnums=0,
                       compiler_options=copts or None)
    def step(s):
        def body(s, _):
            for m in mods:
                s = m(s, dt)
            return s, None
        s, _ = jax.lax.scan(body, s, None, length=inner)
        return s

    # Force full device sync by fetching a scalar: on the experimental axon
    # TPU platform block_until_ready returns before execution finishes.
    def sync(s):
        return float(jax.numpy.max(s.fields["temp"]))

    # Warm-up (compile + one synced execution) outside the timed region.
    state = step(state)
    sync(state)
    state = step(state)
    sync(state)

    t0 = time.perf_counter()
    for _ in range(steps):
        state = step(state)
    sync(state)
    elapsed = time.perf_counter() - t0

    cells = nx * ny * nz * nens
    mcellups = cells * steps * inner / elapsed / 1e6
    _finish({
        "metric": "supercell cell-updates/sec/chip "
                  f"({nx}x{ny}x{nz}{f'x{nens}ens' if nens > 1 else ''}, "
                  f"{steps}x{inner} steps, "
                  f"{jax.devices()[0].platform}"
                  + (f", {micro_kind}" if micro_kind != "kessler" else "")
                  + (f", {dtype}" if dtype != "float32" else "")
                  + (", fast" if fast else "") + ")",
        "value": round(mcellups, 3),
        "unit": "Mcellups",
        "vs_baseline": round(mcellups / _BASELINE_MCELLUPS, 3),
    })


if __name__ == "__main__":
    main()
