"""Per-chip HBM-fit receipts for the reference's at-scale benchmark
configs on described multi-chip mesh topologies.

The reference demonstrates community-benchmark grids of 2048x2048x100 and
4096x4096x100 multi-node (inputs/input_euler3d_2048x2048x100.yaml,
input_euler3d.yaml; job scripts build/machines/aws/job_16.sh,
summit/job_4096.sh).  Real multi-chip hardware is unavailable in this
container, so the honest receipt is per-chip: for each (config, mesh)
pair, AOT-compile THE SAME donated fused step bench.py times at the
per-chip block size on the one real chip and record XLA's memory
analysis (or the OOM allocation-table headline).  The sharded program
differs from the single-chip block only by the ring halo exchanges,
whose buffers are hp-wide strips (<= a few hundred MB at these blocks,
quantified below per block) -- the dominant working set IS the per-chip
block, which is exactly what this measures.

Usage: python -u scripts/mem_table_multichip.py   (TPU; compile-only)
Env: MWML_BENCH_* knobs honored (ORD to check the reference's -DMW_ORD=3
benchmark flag as well as the ord-5 default).
"""
import functools
import os
import sys

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (global config, [(px, py), ...]) -- meshes from the reference's
# demonstrated scales (16 A100 nodes = 128 GPUs; Summit 4096 nodes).
CASES = [
    ((2048, 2048, 100), [(2, 2), (4, 2), (4, 4)]),
    ((4096, 4096, 100), [(4, 4), (8, 4), (8, 8)]),
]

HBM_GIB = 15.75  # usable HBM on this v5e-lite chip (measured round 3)


def block_of(cfg, mesh):
    (gx, gy, gz), (px, py) = cfg, mesh
    assert gx % px == 0 and gy % py == 0
    return gx // px, gy // py, gz


def compile_block(nx, ny, nz, inner=10):
    from miniweatherml_tpu.config import config_from_dict
    from miniweatherml_tpu.dycore.euler import Dycore
    from miniweatherml_tpu.experiments.community_benchmark import build

    config = config_from_dict(dict(
        sim_time=1.0e9, nens=1, nx_glob=nx, ny_glob=ny, nz=nz,
        xlen=400.0 * nx, ylen=400.0 * ny, zlen=200.0 * nz,
        init_data="supercell", out_prefix="mem", dt_phys=0.0, out_freq=-1.0,
        dtype="float32",
    ))
    state, mods, dycore = build(config)
    ordv = int(os.environ.get("MWML_BENCH_ORD", 5))
    dy = Dycore(ord=ordv, riemann_impl="pallas", fast_weights=True)
    mods = [dy.time_step] + list(mods[1:])
    dt = dy.compute_time_step(state)

    @functools.partial(jax.jit, donate_argnums=0)
    def step(s):
        def body(s, _):
            for m in mods:
                s = m(s, dt)
            return s, None
        s, _ = jax.lax.scan(body, s, None, length=inner)
        return s

    lowered = step.lower(state)
    try:
        compiled = lowered.compile()
    except Exception as e:
        txt = str(e)
        # headline of the OOM report: "requires %dG" style first lines
        head = "; ".join(line.strip() for line in txt.splitlines()[:3])
        return None, head[:300]
    ma = compiled.memory_analysis()
    gib = (ma.temp_size_in_bytes + ma.argument_size_in_bytes) / 2**30
    return gib, f"temp {ma.temp_size_in_bytes/2**30:.2f} + args " \
                f"{ma.argument_size_in_bytes/2**30:.2f} GiB"


def halo_overhead_gib(nx, ny, nz, nvar=8, hp=3):
    """Upper bound on the sharded step's extra working set vs the
    single-chip block: 2 strips per decomposed axis of (nvar, hp) cells,
    x2 for send+recv staging, f32."""
    cells = 2 * 2 * hp * nvar * (ny * nz + nx * nz)
    return cells * 4 / 2**30


def main():
    print("devices:", jax.devices(), flush=True)
    ordv = int(os.environ.get("MWML_BENCH_ORD", 5))
    results = {}
    rows = []
    for cfg, meshes in CASES:
        for mesh in meshes:
            blk = block_of(cfg, mesh)
            if blk not in results:
                print(f"compiling per-chip block {blk} (ord {ordv})...",
                      flush=True)
                results[blk] = compile_block(*blk)
                print(f"  -> {results[blk]}", flush=True)
            gib, note = results[blk]
            fits = gib is not None and gib <= HBM_GIB
            rows.append((cfg, mesh, blk, gib, fits, note))
    print(f"\n| global config | mesh px x py | per-chip block | HBM needed "
          f"(GiB, of {HBM_GIB}) | fits | halo-exchange overhead bound |",
          flush=True)
    print("|---|---|---|---|---|---|", flush=True)
    for cfg, mesh, blk, gib, fits, note in rows:
        g = f"{gib:.2f}" if gib is not None else f"OOM ({note})"
        print(f"| {cfg[0]}x{cfg[1]}x{cfg[2]} | {mesh[0]}x{mesh[1]} "
              f"| {blk[0]}x{blk[1]}x{blk[2]} | {g} | "
              f"{'YES' if fits else 'no'} | "
              f"+{halo_overhead_gib(*blk):.3f} GiB |", flush=True)


if __name__ == "__main__":
    sys.exit(main())
