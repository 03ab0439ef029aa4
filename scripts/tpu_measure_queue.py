"""Wait for the axon TPU tunnel to come back, then run a measurement
queue sequentially -- ONE client at a time, never killed mid-execution
(killing a client wedges the tunnel; see .claude/skills/verify/SKILL.md).

Each step is a bench.py or script invocation with env overrides; results
append to /tmp/tpuq/results.log.  Adjust the queue list at the bottom for
the measurements of the day.  Run it in the background and forget it:
it polls the relay ports (fast TCP check), probes with a small capture,
and only then starts the expensive runs."""
import json, os, socket, subprocess, sys, time

LOG = os.environ.get("MWML_QUEUE_LOG", "/root/repo/measurements/r05_queue9_20260821.log")
os.makedirs(os.path.dirname(LOG), exist_ok=True)
def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")

def port_open():
    for p in [8082, 8083, 8087, 8092]:
        s = socket.socket(); s.settimeout(2)
        try:
            s.connect(("127.0.0.1", p)); return True
        except Exception:
            pass
        finally:
            s.close()
    return False

class _Result:
    def __init__(self, returncode, stdout, stderr):
        self.returncode, self.stdout, self.stderr = returncode, stdout, stderr


def run(name, env_extra, args=None, timeout=None):
    """Child stdout/stderr go to FILES, never pipes: if this supervisor
    dies while holding a pipe's read end, the TPU client gets SIGPIPE on
    its next write and dies MID-EXECUTION -- which wedges the tunnel
    (observed 2026-08-20: killing the supervisor killed its client ~25 s
    later and cost a ~20-min heal window)."""
    env = dict(os.environ); env.update(env_extra)
    cmd = [sys.executable] + (args or ["bench.py"])
    log(f"START {name}: {args or 'bench.py'} env={env_extra}")
    t0 = time.time()
    scratch = "/tmp/tpuq"; os.makedirs(scratch, exist_ok=True)
    out_path = os.path.join(scratch, f"{name}.out")
    err_path = out_path + ".err"
    with open(out_path, "w") as fo, open(err_path, "w") as fe:
        rc = subprocess.run(cmd, stdout=fo, stderr=fe, cwd="/root/repo",
                            env=env).returncode
    stdout = open(out_path).read()
    stderr = open(err_path).read()
    log(f"END {name} rc={rc} wall={time.time()-t0:.0f}s")
    for ln in stdout.strip().splitlines()[-8:]:
        log(f"  out: {ln}")
    for ln in stderr.strip().splitlines()[-4:]:
        log(f"  err: {ln}")
    return _Result(rc, stdout, stderr)

# 1. wait for the relay
t0 = time.time()
while not port_open():
    time.sleep(60)
    if time.time() - t0 > 8 * 3600:
        log("GIVE UP: tunnel down > 8 h"); sys.exit(1)
log(f"relay port open after {time.time()-t0:.0f}s; probing")

# 2. probe until a real computation completes (never kill the client)
while True:
    p = run("probe", {"MWML_BENCH_FAST": "1", "MWML_BENCH_PROBE_S": "1200",
                      "MWML_BENCH_NX": "64", "MWML_BENCH_NY": "64",
                      "MWML_BENCH_NZ": "32", "MWML_BENCH_STEPS": "2",
                      "MWML_BENCH_INNER": "2"})
    try:
        val = json.loads(p.stdout.strip().splitlines()[-1])["value"]
    except Exception:
        val = 0.0
    if p.returncode == 0 and val > 0:
        log("probe healthy")
        break
    log("probe unhealthy; waiting 5 min")
    time.sleep(300)

# --- round-5 queue 9 (machine restarted; /tmp receipts for queues 6-8
# were lost before commit -- this queue regenerates them as committed
# files and runs the pending queue-8 control).  Priority order:
#   1. headline warm bench (receipt for the ~110 auto-gate number, and
#      the known-good run the queue-8 control requires first)
#   2. P3 all-cells-active at 512^2x64 with the round-5b wide-lane
#      kernels now default (the verdict's >=40 target; last 33.4)
#   3. standalone lookup A/B matmul-vs-lane (recommits queue-6 numbers)
#   4. queue-8 driver-vs-bench control on the provably healthy device
#   5. P3 early-storm re-verify
run("512-auto-warm", {})
run("p3-allactive-512", {"MWML_BENCH_MICRO": "p3",
                         "MWML_BENCH_P3_ACTIVE": "1"})
run("lookups-matmul-vs-lane", {"MWML_P3_LOOKUPS_ONLY": "1",
                               "MWML_P3_IMPLS": "matmul,lane"},
    args=["scripts/profile_p3.py"])
run("driver-1024x64-flat", {"MWML_DRIVER_SCAN": "0"},
    args=["-m", "miniweatherml_tpu.experiments.community_benchmark",
          "inputs/community_benchmark_1024x64.yaml"])
run("driver-1024x64-scan2", {},
    args=["-m", "miniweatherml_tpu.experiments.community_benchmark",
          "inputs/community_benchmark_1024x64.yaml"])
run("p3-earlystorm-512", {"MWML_BENCH_MICRO": "p3"})
log("QUEUE DONE")
