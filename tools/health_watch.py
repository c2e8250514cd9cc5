"""Round-5 scaling-campaign watcher.

Samples host capacity (1T + mt8 matmul probes) every few minutes and
launches ``tools/scaling_bench.py`` the FIRST time both probes clear the
campaign gates while no pytest/bench run holds the host (CLAUDE.md: the
scaling bench must run alone). Every sample is appended to
``BENCH/health_watch_r5.jsonl`` so a never-healthy round is documented
with evidence, exactly like the round-4 gated no-run.

Touch ``/tmp/spark_graft_busy`` to suppress launches while foreground
work runs; remove it to re-arm.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
LOG = os.path.join(REPO, "BENCH", "health_watch_r5.jsonl")
BUSY_FLAG = "/tmp/spark_graft_busy"
PROBE_1T_MIN = 550
MT8_MIN = 1200
INTERVAL = 240
MAX_HOURS = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0


def probe_1t() -> int:
    import numpy as np
    a = np.random.rand(600, 600)
    t0 = time.time()
    k = 0
    while time.time() - t0 < 2:
        a @ a
        k += 1
    return k


def probe_mt(n: int = 8) -> int:
    import threading

    import numpy as np
    counts = [0] * n
    stop = time.time() + 2

    def work(i: int) -> None:
        a = np.random.rand(600, 600)
        while time.time() < stop:
            a @ a
            counts[i] += 1

    ts = [threading.Thread(target=work, args=(i,)) for i in range(n)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    return sum(counts)


def busy() -> bool:
    if os.path.exists(BUSY_FLAG):
        return True
    r = subprocess.run(
        ["pgrep", "-f", "pytest|bench\\.py|check_oracles"],
        capture_output=True, text=True)
    pids = [p for p in r.stdout.split() if p and int(p) != os.getpid()]
    return bool(pids)


def main() -> int:
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    t_end = time.time() + MAX_HOURS * 3600
    n = 0
    while time.time() < t_end:
        p1, pm = probe_1t(), probe_mt()
        b = busy()
        rec = {"t": round(time.time(), 1), "probe_1t": p1,
               "probe_mt8": pm, "busy": b}
        with open(LOG, "a") as f:
            f.write(json.dumps(rec) + "\n")
        n += 1
        if p1 >= PROBE_1T_MIN and pm >= MT8_MIN and not b:
            print(f"HEALTHY after {n} samples: 1T={p1} mt8={pm} "
                  "-> launching scaling campaign", flush=True)
            rc = subprocess.run(
                [sys.executable, "tools/scaling_bench.py", "24576", "256"],
                cwd=REPO).returncode
            print(f"scaling_bench rc={rc}", flush=True)
            return rc
        time.sleep(INTERVAL)
    print(f"watcher expired after {n} samples with no healthy+idle window",
          flush=True)
    return 3


if __name__ == "__main__":
    sys.exit(main())
