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

# 3. P3 headline at 512^2 post-Newton-seed (round-3: 36.5; round-4 pre-seed: 43.7)
run("p3-chain-512-seed", {"MWML_BENCH_MICRO": "p3", "MWML_BENCH_STEPS": "4",
                          "MWML_BENCH_INNER": "5"})

# 4. P3 at 256^2 (pre-seed: 46.4) for phase comparison
run("p3-chain-256-seed", {"MWML_BENCH_MICRO": "p3", "MWML_BENCH_NX": "256",
                          "MWML_BENCH_NY": "256", "MWML_BENCH_STEPS": "4",
                          "MWML_BENCH_INNER": "5"})

# 5. phase attribution post-seed (wrapper+part1 prefix was 9.1 ms)
run("profile-p3-phases", {}, args=["scripts/profile_p3.py"])

# 6. surrogate micro on-chip datapoint (the one bench mode without one)
run("surrogate-512", {"MWML_BENCH_MICRO": "surrogate", "MWML_BENCH_STEPS": "4",
                      "MWML_BENCH_INNER": "5"})
log("QUEUE DONE")
