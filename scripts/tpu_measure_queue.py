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

# --- round-5 queue 6 (grid-over-tracer fct kernel + wide-lane lookups) ---
# 1. allocation table for the reference's exact 1024x1024x100 benchmark
#    with the FIXED fct kernel (tracer axis on the pallas grid; queue-5
#    attempts hit 17.03M/29.25M scoped-VMEM stacks -- Mosaic does not
#    reuse stack across unrolled tracer iterations)
run("mem-1024x100-all", {}, args=["scripts/mem_analysis.py",
                                  "1024", "1024", "100"])

# 2. the real 1024x1024x100 run if it fits (VERDICT item 3)
run("bench-1024x100", {"MWML_BENCH_NX": "1024", "MWML_BENCH_NY": "1024",
                       "MWML_BENCH_NZ": "100", "MWML_BENCH_STEPS": "2",
                       "MWML_BENCH_INNER": "5"})

# 3. standalone lookup A/B: XLA joint matmul vs round-5b wide-lane
#    kernels (ice wide + collect lane, both weight builds)
run("lookups-256-lane", {"MWML_P3_LOOKUPS_ONLY": "1",
                         "MWML_P3_IMPLS": "matmul,lane"},
    args=["scripts/profile_p3.py"])
run("lookups-256-lane-decode", {"MWML_P3_LOOKUPS_ONLY": "1",
                                "MWML_P3_IMPLS": "lane",
                                "MWML_P3_COLL_BUILD": "decode"},
    args=["scripts/profile_p3.py"])

# 4. all-cells-active chain: new defaults (wide ice + collect lane), the
#    collect=matmul control, and the kfct combination
run("p3-allactive-512", {"MWML_BENCH_MICRO": "p3",
                         "MWML_BENCH_P3_ACTIVE": "1",
                         "MWML_BENCH_STEPS": "4", "MWML_BENCH_INNER": "5"})
run("p3-allactive-512-collmm", {"MWML_BENCH_MICRO": "p3",
                                "MWML_BENCH_P3_ACTIVE": "1",
                                "MWML_P3_COLLECT": "matmul",
                                "MWML_BENCH_STEPS": "4",
                                "MWML_BENCH_INNER": "5"})
run("p3-allactive-512-kfct", {"MWML_BENCH_MICRO": "p3",
                              "MWML_BENCH_P3_ACTIVE": "1",
                              "MWML_FCT_PALLAS": "1",
                              "MWML_BENCH_STEPS": "4",
                              "MWML_BENCH_INNER": "5"})

# 5. early-storm P3 chain: kernel-FCT A/B (VERDICT item 2; queue-5
#    attempt pre-dated the grid-over-tracer fix) + the new-default rerun
run("p3-chain-512", {"MWML_BENCH_MICRO": "p3",
                     "MWML_BENCH_STEPS": "4", "MWML_BENCH_INNER": "5"})
run("p3-chain-512-kfct", {"MWML_BENCH_MICRO": "p3", "MWML_FCT_PALLAS": "1",
                          "MWML_BENCH_STEPS": "4", "MWML_BENCH_INNER": "5"})

# 5b. driver steady-state at 1024x64 with the scan-wrapped step (bench
#     inner=1 measured 106.4 at this grid vs the flat driver step's
#     33.5, twice -- the scan carry's in-program aliasing is the only
#     structural difference; MWML_DRIVER_SCAN=0 is the control)
run("driver-1024x64-scan", {},
    args=["-m", "miniweatherml_tpu.experiments.community_benchmark",
          "inputs/community_benchmark_1024x64.yaml"])

# 6. RK_FUSE gate data at the 52-80M band: queue-2 tested DIV_ACC alone
#    (103.3, a loss vs DIR_SEQ 106.9); the winning 512^2 combo was
#    DIV_ACC+RK_FUSE -- measure that combo at 1024x1024x64
run("1024x64-rkfuse", {"MWML_BENCH_NX": "1024", "MWML_BENCH_NY": "1024",
                       "MWML_BENCH_NZ": "64", "MWML_DIV_ACC": "1",
                       "MWML_RK_FUSE": "1"})
log("QUEUE DONE")
