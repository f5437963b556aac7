"""Launch `bench.py --scaling` once the host enters a measurable window.

The sandbox host's parallel-compute ceiling ((cal_32/cal_8)/4, probed via
bench.host_calibration) swings 0.55-0.95 between windows; a scaling run
started in a throttled window measures the host, not the engine.  This
wrapper probes every PROBE_GAP seconds and starts the run after two
consecutive probes at or above MIN_START; after MAX_WAIT seconds it starts
regardless (the per-pair GRAFT_SCALING_MIN_CEILING gate still rejects
throttled pairs inside the run).  Writes the run's stdout JSON to OUT and
the per-pair stderr log to LOG.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import host_calibration  # noqa: E402

OUT = os.environ.get("SCALING_OUT", "/tmp/scaling_r03.json")
LOG = os.environ.get("SCALING_LOG", "/tmp/scaling_r03.log")
MIN_START = float(os.environ.get("SCALING_MIN_START", "0.75"))
PROBE_GAP = int(os.environ.get("SCALING_PROBE_GAP", "180"))
MAX_WAIT = int(os.environ.get("SCALING_MAX_WAIT", "5400"))


def probe() -> float:
    c8 = host_calibration(8)
    c32 = host_calibration(32)
    return (c32 / c8) / 4.0 if c8 else 0.0


def main() -> None:
    t0 = time.time()
    streak = 0
    with open(LOG, "a") as lg:
        while time.time() - t0 < MAX_WAIT:
            c = probe()
            lg.write(json.dumps({"t": round(time.time() - t0), "ceiling": round(c, 3)}) + "\n")
            lg.flush()
            streak = streak + 1 if c >= MIN_START else 0
            if streak >= 2:
                break
            time.sleep(PROBE_GAP)
        lg.write(json.dumps({"start_run": True, "waited": round(time.time() - t0)}) + "\n")
        lg.flush()
        env = dict(
            os.environ,
            GRAFT_SCALING_PAIRS=os.environ.get("GRAFT_SCALING_PAIRS", "5"),
            GRAFT_SCALING_MIN_CEILING=os.environ.get("GRAFT_SCALING_MIN_CEILING", "0.72"),
            GRAFT_SCALING_RETRIES=os.environ.get("GRAFT_SCALING_RETRIES", "2"),
        )
        res = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"), "--scaling"],
            env=env, stdout=subprocess.PIPE, stderr=lg, text=True,
        )
    with open(OUT, "w") as f:
        f.write(res.stdout)
    print(res.stdout.strip().splitlines()[-1] if res.stdout.strip() else "EMPTY")


if __name__ == "__main__":
    main()
