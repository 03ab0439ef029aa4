"""Round-5 queue 11 (consolidated priorities after the tunnel-wedge ate
the session's first half hour).  Order = value per tunnel-minute:
  1. P3 all-cells-active at 512^2x64 with the round-5b wide-lane lookup
     kernels now default (the verdict's >=40 target; last 33.4)
  2. AOT fit table + real bench at the reference's exact 1024x1024x100
     community-benchmark grid with MWML_TR_SEQ (kfct retired as a fit
     LOSS, queue 7)
  3. standalone lookup matmul-vs-lane A/B (recommits the lost queue-6
     receipts)
  4. headline warm bench + driver control + P3 early-storm re-verify

One TPU client at a time; children file-redirected (a dead supervisor's
pipes SIGPIPE-kill the client; see .claude/skills/verify/SKILL.md)."""
import json, os, socket, subprocess, sys, time

LOG = os.environ.get("MWML_QUEUE_LOG",
                     "/root/repo/measurements/r05_queue11_20260821.log")

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

# 0. wait for the orphaned queue-9 probe child (pid argv[1], if given) to
#    exit so exactly one client touches the device.
if len(sys.argv) > 1:
    pid = int(sys.argv[1])
    while os.path.exists(f"/proc/{pid}"):
        time.sleep(15)
    log(f"previous client {pid} gone")

# 1. probe until a real computation completes (never kill the client)
while True:
    p_rc = run("probe", {"MWML_BENCH_FAST": "1", "MWML_BENCH_PROBE_S": "1200",
                         "MWML_BENCH_NX": "64", "MWML_BENCH_NY": "64",
                         "MWML_BENCH_NZ": "32", "MWML_BENCH_STEPS": "2",
                         "MWML_BENCH_INNER": "2"})
    try:
        out = open("/tmp/tpuq/probe.out").read()
        val = json.loads(out.strip().splitlines()[-1])["value"]
    except Exception:
        val = 0.0
    if p_rc == 0 and val > 0:
        log("probe healthy")
        break
    log("probe unhealthy; waiting 3 min")
    time.sleep(180)

run("p3-allactive-512", {"MWML_BENCH_MICRO": "p3",
                         "MWML_BENCH_P3_ACTIVE": "1"})
run("mem-1024x100-trseq", {}, args=["scripts/mem_analysis.py",
                                    "1024", "1024", "100"])
run("bench-1024x100", {"MWML_BENCH_NX": "1024", "MWML_BENCH_NY": "1024",
                       "MWML_BENCH_NZ": "100", "MWML_BENCH_STEPS": "10"})
run("lookups-matmul-vs-lane", {"MWML_P3_LOOKUPS_ONLY": "1",
                               "MWML_P3_IMPLS": "matmul,lane"},
    args=["scripts/profile_p3.py"])
run("512-auto-warm", {})
run("driver-1024x64-flat", {"MWML_DRIVER_SCAN": "0"},
    args=["-m", "miniweatherml_tpu.experiments.community_benchmark",
          "inputs/community_benchmark_1024x64.yaml"])
run("p3-earlystorm-512", {"MWML_BENCH_MICRO": "p3"})
log("QUEUE DONE")
