"""Round-5 queue 12: 1024x1024x100 fit attempt with the FIXED TR_SEQ
(lazy per-direction scale after the barrier; queue 11 measured the
eager-scale form at 19.39G -- worse than the 16.26G no-TR_SEQ stack).

Chains on queue 11's DONE sentinel (one TPU client at a time)."""
import os, subprocess, sys, time

PREV = "/root/repo/measurements/r05_queue11_20260821.log"
LOG = "/root/repo/measurements/r05_queue12_20260821.log"

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
    return rc

t0 = time.time()
while True:
    try:
        if "QUEUE DONE" in open(PREV).read():
            break
    except OSError:
        pass
    if time.time() - t0 > 10 * 3600:
        sys.exit("queue 11 never finished")
    time.sleep(60)

run("mem-1024x100-trseq2", {}, args=["scripts/mem_analysis.py",
                                     "1024", "1024", "100"])
run("bench-1024x100-trseq2", {"MWML_BENCH_NX": "1024",
                              "MWML_BENCH_NY": "1024",
                              "MWML_BENCH_NZ": "100",
                              "MWML_BENCH_STEPS": "10"})
run("mem-1024x100-notrseq", {"MWML_TR_SEQ": "0"},
    args=["scripts/mem_analysis.py", "1024", "1024", "100"])
log("QUEUE DONE")
