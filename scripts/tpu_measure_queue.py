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

# --- round-5 queue 3 ------------------------------------------------------
# 1. steady-state DRIVER receipt at 1024x1024x64 (queue-1/2 failures were
#    the XLA-recon default OOMing at 24.4G; riemann_impl now defaults to
#    auto -> pallas single-device TPU)
run("driver-1024x64-steady", {},
    args=["-m", "miniweatherml_tpu.experiments.community_benchmark",
          "inputs/community_benchmark_1024x64.yaml"])

# 2. 1024x1024x100 allocation tables under the round-5 levers:
#    fresh acc+split table, + the new in-kernel RK stage update
run("mem-1024x100-variants", {},
    args=["scripts/mem_variants.py", "1024", "1024", "100",
          "--variants", "acc_split,acc_split_rk,rk_only"])

# 3. if the rk variant fits, this is the real run (auto gates turn all
#    levers on at 105M cells); the .out captures the OOM table otherwise
run("bench-1024x100", {"MWML_BENCH_NX": "1024", "MWML_BENCH_NY": "1024",
                       "MWML_BENCH_NZ": "100", "MWML_BENCH_STEPS": "2",
                       "MWML_BENCH_INNER": "5"})

# 4. RK_FUSE cost check at the 512^2 headline (DIV_ACC alone measured
#    107.7 there; the gate keeps both off below 80M cells -- this is the
#    documentation datapoint)
run("512-rkfuse-ab", {"MWML_DIV_ACC": "1", "MWML_RK_FUSE": "1"})

# 5. ord-9 at the 512^2 headline grid (completes the like-for-like
#    MW_ORD envelope; round-4 datapoint was 256^2)
run("ord9-512", {"MWML_BENCH_ORD": "9"})

# 6. compiler-options channel probe: client XLA_FLAGS rejects TPU flag
#    names; env_option_overrides through lowered.compile() is the
#    documented channel -- validate it and measure the scheduler's
#    liveness contribution at the OOM grid
run("mem-1024x100-lhs-off",
    {"MWML_COMPILER_OPTS":
     "xla_tpu_enable_latency_hiding_scheduler=false"},
    args=["scripts/mem_analysis.py", "1024", "1024", "100"])
log("QUEUE DONE")
