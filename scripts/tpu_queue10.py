"""Round-5 queue 10: the 1024x1024x100 single-chip fit attempt with the
MWML_TR_SEQ tracer-divergence sequencing (the lever that replaced kfct
after queue 7 measured kfct a net fit LOSS).

Waits for queue 9's "QUEUE DONE" sentinel so exactly ONE TPU client runs
at a time (see .claude/skills/verify/SKILL.md), then:
  1. AOT allocation table at 1024x1024x100 (auto gates: DIV_ACC +
     PRIM_SPLIT + RK_FUSE + TR_SEQ at 104M cells, kfct off)
  2. if-it-compiles-it-runs: bench.py at the same grid -- the verdict's
     "exact community-benchmark file on one chip" target
  3. control table with TR_SEQ off (same session, attributes the delta)
"""
import os, sys, time

PREV = "/root/repo/measurements/r05_queue9_20260821.log"
os.environ.setdefault("MWML_QUEUE_LOG",
                      "/root/repo/measurements/r05_queue10_20260821.log")

t0 = time.time()
while True:
    try:
        if "QUEUE DONE" in open(PREV).read():
            break
    except OSError:
        pass
    if time.time() - t0 > 10 * 3600:
        sys.exit("queue 9 never finished")
    time.sleep(60)

# Import the shared runner machinery WITHOUT triggering queue 9's list:
# execute only the helper definitions by running our own steps inline.
sys.path.insert(0, os.path.dirname(__file__))
import json, socket, subprocess  # noqa: E402

LOG = os.environ["MWML_QUEUE_LOG"]

def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")

def run(name, env_extra, args=None):
    env = dict(os.environ); env.update(env_extra)
    cmd = [sys.executable] + (args or ["bench.py"])
    log(f"START {name}: {args or 'bench.py'} env={env_extra}")
    t0 = time.time()
    scratch = "/tmp/tpuq"; os.makedirs(scratch, exist_ok=True)
    out_path = os.path.join(scratch, f"{name}.out")
    with open(out_path, "w") as fo, open(out_path + ".err", "w") as fe:
        rc = subprocess.run(cmd, stdout=fo, stderr=fe, cwd="/root/repo",
                            env=env).returncode
    log(f"END {name} rc={rc} wall={time.time()-t0:.0f}s")
    for ln in open(out_path).read().strip().splitlines()[-10:]:
        log(f"  out: {ln}")
    for ln in open(out_path + ".err").read().strip().splitlines()[-4:]:
        log(f"  err: {ln}")

run("mem-1024x100-trseq", {}, args=["scripts/mem_analysis.py",
                                    "1024", "1024", "100"])
run("bench-1024x100", {"MWML_BENCH_NX": "1024", "MWML_BENCH_NY": "1024",
                       "MWML_BENCH_NZ": "100", "MWML_BENCH_STEPS": "10"})
run("mem-1024x100-notrseq", {"MWML_TR_SEQ": "0"},
    args=["scripts/mem_analysis.py", "1024", "1024", "100"])
log("QUEUE DONE")
