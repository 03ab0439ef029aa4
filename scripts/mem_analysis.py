"""AOT memory analysis of the fused bench step at a chosen grid.

Compiles (never runs) the same donated lax.scan step bench.py times and
prints XLA's memory analysis -- or, on OOM, the allocation-table tail of
the compiler error.  Used to attack the single-chip HBM ceiling
(BASELINE.md: 1024x1024x64 missed by ~725M of buffer-assignment slack).

Usage: python scripts/mem_analysis.py [nx ny nz] [--inner N]
Env: MWML_BENCH_* knobs honored as in bench.py (ORD, PALLAS, FASTW).
"""
import functools
import os
import sys

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    nx, ny, nz = (int(a) for a in args[:3]) if len(args) >= 3 else (1024, 1024, 64)
    inner = 10
    if "--inner" in sys.argv:
        inner = int(sys.argv[sys.argv.index("--inner") + 1])

    from miniweatherml_tpu.config import config_from_dict
    from miniweatherml_tpu.experiments.community_benchmark import build

    config = config_from_dict(dict(
        sim_time=1.0e9, nens=1, nx_glob=nx, ny_glob=ny, nz=nz,
        xlen=400.0 * nx, ylen=400.0 * ny, zlen=200.0 * nz,
        init_data="supercell", out_prefix="mem", dt_phys=0.0, out_freq=-1.0,
        dtype="float32",
    ))
    if os.environ.get("MWML_BENCH_MICRO", "kessler") == "p3":
        from miniweatherml_tpu.experiments.supercell_p3 import (
            build as build_p3)
        state, mods, dycore = build_p3(config)
    else:
        state, mods, dycore = build(config)
    ordv = int(os.environ.get("MWML_BENCH_ORD", 5))
    use_pallas = os.environ.get("MWML_BENCH_PALLAS", "1") == "1"
    if ordv != 5 or use_pallas:
        from miniweatherml_tpu.dycore.euler import Dycore
        dy = Dycore(ord=ordv, riemann_impl="pallas" if use_pallas else "xla",
                    fast_weights=os.environ.get("MWML_BENCH_FASTW", "1") == "1")
        mods = [dy.time_step] + list(mods[1:])
        dycore = dy
    dt = dycore.compute_time_step(state)

    @functools.partial(jax.jit, donate_argnums=0)
    def step(s):
        def body(s, _):
            for m in mods:
                s = m(s, dt)
            return s, None
        s, _ = jax.lax.scan(body, s, None, length=inner)
        return s

    lowered = step.lower(state)
    # MWML_COMPILER_OPTS="flag=val,flag=val": serialized into the compile
    # request's env_option_overrides, the only channel that reaches the
    # remote tpu_compile_helper (client-side XLA_FLAGS rejects TPU-only
    # flag names -- measured queue-1 round 5).
    copts = {}
    for kv in os.environ.get("MWML_COMPILER_OPTS", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            copts[k.strip()] = v.strip()
    print(f"lowered {nx}x{ny}x{nz} inner={inner} "
          f"ord={ordv} pallas={use_pallas} copts={copts}", flush=True)
    try:
        compiled = lowered.compile(compiler_options=copts or None)
    except Exception as e:  # OOM report carries the allocation table
        txt = str(e)
        print("COMPILE FAILED; error text:")
        print(txt[:40000])
        return 1
    ma = compiled.memory_analysis()
    print("memory_analysis:", ma)
    for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                 "output_size_in_bytes", "alias_size_in_bytes",
                 "generated_code_size_in_bytes"):
        v = getattr(ma, attr, None)
        if v is not None:
            print(f"  {attr}: {v/2**30:.3f} GiB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
