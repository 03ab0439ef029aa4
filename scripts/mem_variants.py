"""Sweep memory-shape variants of the fused bench step through AOT
compiles at an HBM-limit grid and report peak/temp stats per variant.

Never executes on the chip -- compile only (the compile itself goes
through the axon tunnel service, so run this with the tunnel otherwise
quiet, ONE process at a time).  On OOM the XLA error carries the
allocation table; we print the 'needed vs available' line plus the
largest allocations so the next variant is chosen from facts.

Usage: python scripts/mem_variants.py [nx ny nz] [--inner N] [--variants a,b]
"""
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

VARIANTS = {
    # name -> env overrides applied to the child mem_analysis run.
    # Measured at 1024x1024x64 (2026-08-19): baseline OOMs at buffer
    # assignment (16.46G of 15.75G; top temps: 2.0G prim concat + three
    # 1.25G per-direction state-divergence outputs live at the peak,
    # 4.1G fragmentation); dir_seq compiles AND runs at full throughput
    # (106.75 Mcellups).  An optimization_barrier pinning one prim
    # materialization alone (no sequencing) was a measured NO-OP --
    # identical 16.46G -- so only the sequencing flag was kept.
    "baseline": {"MWML_DIR_SEQ": "0"},
    "dir_seq": {"MWML_DIR_SEQ": "1"},
    # round-5 levers (euler.py / pallas_recon.py): in-kernel divergence
    # accumulation, direction-local prim, in-kernel SSPRK3 stage update
    "acc_split": {"MWML_DIV_ACC": "1", "MWML_PRIM_SPLIT": "1",
                  "MWML_RK_FUSE": "0"},
    "acc_split_rk": {"MWML_DIV_ACC": "1", "MWML_PRIM_SPLIT": "1",
                     "MWML_RK_FUSE": "1"},
    "rk_only": {"MWML_DIV_ACC": "1", "MWML_PRIM_SPLIT": "0",
                "MWML_RK_FUSE": "1"},
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dims = args[:3] if len(args) >= 3 else ["1024", "1024", "64"]
    inner = "10"
    if "--inner" in sys.argv:
        inner = sys.argv[sys.argv.index("--inner") + 1]
    names = list(VARIANTS)
    if "--variants" in sys.argv:
        names = sys.argv[sys.argv.index("--variants") + 1].split(",")

    for name in names:
        env = dict(os.environ)
        env.update(VARIANTS[name])
        print(f"=== variant {name} env={VARIANTS[name]} "
              f"grid={'x'.join(dims)} inner={inner}", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.join(HERE, "mem_analysis.py"),
             *dims, "--inner", inner],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(HERE))
        out = p.stdout
        # success path: memory_analysis summary lines
        for ln in out.splitlines():
            if ("memory_analysis" in ln or "GiB" in ln
                    or ln.startswith("lowered")):
                print("  " + ln.strip(), flush=True)
        if "COMPILE FAILED" in out:
            # OOM report: surface the headline + the biggest buffers
            m = re.search(r"Used ([\d.]+\w) of ([\d.]+\w)", out)
            for pat in (r"exceeds the limit[^\n]*", r"requires [^\n]*",
                        r"Peak buffers:[\s\S]{0,2500}"):
                mm = re.search(pat, out)
                if mm:
                    print("  " + mm.group(0)[:2500], flush=True)
            if m:
                print(f"  used {m.group(1)} of {m.group(2)}", flush=True)
        if p.returncode != 0 and "COMPILE FAILED" not in out:
            print("  child rc", p.returncode, "stderr tail:",
                  p.stderr.strip().splitlines()[-3:], flush=True)


if __name__ == "__main__":
    main()
