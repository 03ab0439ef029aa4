"""Round-5 queue 13 (final consolidation): probe-gated steps so a dead
tunnel costs one probe horizon, not one horizon per step.  Runs the
queue-12 fit attempt (lazy-scale TR_SEQ) first, then the remaining
queue-11 receipts.  One TPU client at a time, children file-redirected.

Usage: python scripts/tpu_queue13.py [pid-to-wait-for]
"""
import json, os, subprocess, sys, time

LOG = "/root/repo/measurements/r05_queue13_20260821.log"

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

def probe_until_healthy():
    """Tiny probe; loop until one completes a real computation."""
    while True:
        rc = run("probe", {"MWML_BENCH_FAST": "1",
                           "MWML_BENCH_PROBE_S": "1800",
                           "MWML_BENCH_NX": "64", "MWML_BENCH_NY": "64",
                           "MWML_BENCH_NZ": "32", "MWML_BENCH_STEPS": "2",
                           "MWML_BENCH_INNER": "2"})
        try:
            out = open("/tmp/tpuq/probe.out").read()
            val = json.loads(out.strip().splitlines()[-1])["value"]
        except Exception:
            val = 0.0
        if rc == 0 and val > 0:
            log("probe healthy")
            return
        log("probe unhealthy; waiting 3 min")
        time.sleep(180)

if len(sys.argv) > 1:
    pid = int(sys.argv[1])
    while os.path.exists(f"/proc/{pid}"):
        time.sleep(15)
    log(f"previous client {pid} gone")

probe_until_healthy()
run("mem-1024x100-trseq2", {}, args=["scripts/mem_analysis.py",
                                     "1024", "1024", "100"])
run("bench-1024x100-trseq2", {"MWML_BENCH_NX": "1024",
                              "MWML_BENCH_NY": "1024",
                              "MWML_BENCH_NZ": "100",
                              "MWML_BENCH_STEPS": "10"})
run("lookups-matmul-vs-lane", {"MWML_P3_LOOKUPS_ONLY": "1",
                               "MWML_P3_IMPLS": "matmul,lane"},
    args=["scripts/profile_p3.py"])
run("512-auto-warm", {})
run("driver-1024x64-flat", {"MWML_DRIVER_SCAN": "0"},
    args=["-m", "miniweatherml_tpu.experiments.community_benchmark",
          "inputs/community_benchmark_1024x64.yaml"])
run("p3-earlystorm-512", {"MWML_BENCH_MICRO": "p3"})
run("mem-1024x100-notrseq", {"MWML_TR_SEQ": "0"},
    args=["scripts/mem_analysis.py", "1024", "1024", "100"])
log("QUEUE DONE")
