"""Wait for the axon TPU tunnel to come back, then run a measurement
queue sequentially -- ONE client at a time, never killed mid-execution
(killing a client wedges the tunnel; see .claude/skills/verify/SKILL.md).

Each step is a bench.py or script invocation with env overrides; results
append to /tmp/tpuq/results.log.  Adjust the queue list at the bottom for
the measurements of the day.  Run it in the background and forget it:
it polls the relay ports (fast TCP check), probes with a small capture,
and only then starts the expensive runs."""
import json, os, socket, subprocess, sys, time

LOG = "/tmp/tpuq/results.log"
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

def run(name, env_extra, args=None, timeout=None):
    env = dict(os.environ); env.update(env_extra)
    cmd = [sys.executable] + (args or ["bench.py"])
    log(f"START {name}: {args or 'bench.py'} env={env_extra}")
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", env=env)
    log(f"END {name} rc={p.returncode} wall={time.time()-t0:.0f}s")
    with open(os.path.join(os.path.dirname(LOG), f"{name}.out"), "w") as f:
        f.write(p.stdout + "\n=== STDERR ===\n" + p.stderr)
    for ln in p.stdout.strip().splitlines()[-8:]:
        log(f"  out: {ln}")
    for ln in p.stderr.strip().splitlines()[-4:]:
        log(f"  err: {ln}")
    return p

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

# --- round-5 queue 2 ------------------------------------------------------
# 1. driver steady-state failure repro (queue-1 rc 1 with a truncated
#    traceback) -- full traceback this time
run("driver-1024x64-repro", {"JAX_TRACEBACK_FILTERING": "off"},
    args=["-m", "miniweatherml_tpu.experiments.community_benchmark",
          "inputs/community_benchmark_1024x64.yaml"])

# 2. 1024x1024x64 flag A/B: queue-1 regression (99.7 under auto
#    DIV_ACC+PRIM_SPLIT vs round-4's 106.75 under DIR_SEQ) -- attribute it
GRID = {"MWML_BENCH_NX": "1024", "MWML_BENCH_NY": "1024",
        "MWML_BENCH_NZ": "64"}
run("1024x64-dirseq-r4", {**GRID, "MWML_DIV_ACC": "0",
                          "MWML_PRIM_SPLIT": "0", "MWML_DIR_SEQ": "1"})
run("1024x64-acc-only", {**GRID, "MWML_DIV_ACC": "1",
                         "MWML_PRIM_SPLIT": "0"})
run("1024x64-split-only", {**GRID, "MWML_DIV_ACC": "0",
                           "MWML_PRIM_SPLIT": "1", "MWML_DIR_SEQ": "1"})

# 3. collect-lookup layout A/B: joint (densize,isize) contraction (92%
#    MXU tile fill) vs queue-1's isize-only form (22.14 ms at 256^2)
run("lookups-joint-256", {"MWML_P3_LOOKUPS_ONLY": "1",
                          "MWML_P3_IMPLS": "matmul,lane"},
    args=["scripts/profile_p3.py"])

# 4. all-cells-active with lane ice + joint collect (queue-1: 32.1 lane,
#    27.9 matmul; target >= 40)
run("p3-allactive-512-joint", {"MWML_BENCH_MICRO": "p3",
                               "MWML_BENCH_P3_ACTIVE": "1",
                               "MWML_BENCH_STEPS": "4",
                               "MWML_BENCH_INNER": "5"})

# 5. all-active phase attribution at 256^2 (where does the non-lookup
#    part of the 140 ms early-storm -> all-active delta go?)
run("profile-p3-active", {"MWML_P3_PROFILE_ACTIVE": "1"},
    args=["scripts/profile_p3.py"])

# 6. kernel-FCT A/B under the 9-tracer P3 chain (the round-3 negative was
#    3-tracer Kessler economics; queue-1 early-storm auto = 43.88)
run("p3-chain-512-kfct", {"MWML_BENCH_MICRO": "p3", "MWML_FCT_PALLAS": "1",
                          "MWML_BENCH_STEPS": "4", "MWML_BENCH_INNER": "5"})
log("QUEUE DONE")
