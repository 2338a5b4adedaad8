"""One throughput table, one protocol, one session (VERDICT tasks 4+5).

Round 3 left three numbers for "single-chip maps/s" (RESULTS 305.9,
BENCH_r03 293.0, SERVING raw bound 270.2) with no variance bars.  This
tool runs, back to back in ONE session on the one real chip:

1. `bench.py` (5 timed reps, per-rep rates + spread in the JSON line);
2. the serving benchmark at steady state — 1024 requests = 16 batches of
   64 through the depth-3 pipeline — whose raw bound is measured in the
   same process right before the scheduler run.

and writes THROUGHPUT.json with all numbers side by side.  RESULTS.md
quotes THIS artifact.
"""

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


# 1. bench.py (subprocess; prints one JSON line)
log("running bench.py ...")
out = subprocess.run([sys.executable, "/root/repo/bench.py"],
                     capture_output=True, text=True, timeout=3600)
bench = None
for line in out.stdout.splitlines():
    line = line.strip()
    if line.startswith("{"):
        bench = json.loads(line)
log("bench:", json.dumps(bench))

# 2. serving at steady state (same session; its own raw bound is measured
# in-process immediately before the scheduler stream)
log("running serving bench (1024 requests, batch 64) ...")
out2 = subprocess.run(
    [sys.executable, "/root/repo/tools/serving_bench_tpu.py",
     "--requests", "1024", "--batch", "64", "--drain-threads", "3"],
    capture_output=True, text=True, timeout=3600)
# the serving bench writes its full artifact (closed-loop + the round-5
# open-loop Poisson point) to SERVING.json — read that rather than
# parsing stdout (which now prints multiple JSON lines)
serving = None
if out2.returncode == 0:
    try:
        with open("/root/repo/SERVING.json") as f:
            serving = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
log("serving:", json.dumps(serving))
if serving is None:
    log("serving stdout:", out2.stdout[-2000:])
    log("serving stderr:", out2.stderr[-2000:])
    raise SystemExit(1)

import bench as _bench

table = {
    "protocol": "all numbers from one session on one chip; bench.py = "
                f"batched B={_bench.BATCH} low-rank 1-bit recovery, "
                "5 timed reps; serving = 1024 requests (16 batches of "
                "64) through the depth-3 continuous-batching pipeline "
                "vs its same-process raw bound",
    "bench": bench,
    "serving": serving,
    "single_chip_maps_per_sec": bench["value"] if bench else None,
    "single_chip_spread": bench.get("rep_spread") if bench else None,
    "serving_maps_per_sec": serving["maps_per_sec"],
    "serving_fraction_of_raw": serving["fraction_of_raw"],
    "batches_dispatched": serving["batches_dispatched"],
    "open_loop": serving.get("open_loop"),
    "wall_seconds": round(time.time() - t0, 1),
}
with open("/root/repo/THROUGHPUT.json", "w") as f:
    json.dump(table, f, indent=1)
log("wrote THROUGHPUT.json")
