"""Pin the bench.py torch-CPU denominator (VERDICT round-4 item 6).

`bench.py` used to re-measure its strengthened torch-CPU baseline every
run, so the headline `vs_baseline` ratio swung 429->672 across artifacts
on a shared host while the TPU numerator was flat (~293 maps/s).  This
tool measures the baseline ONCE with >=5 independent full-run reps,
records the per-rep rates and spread, and writes BASELINE_TORCH.json;
bench.py then reports `vs_baseline` against the pinned median and
carries the pinned spread so the ratio is stable and self-describing.

The measured algorithm is identical to bench.torch_maps_per_sec: the
reference's low-rank 1-bit probit MLE (backup/notebooks/
onebit_lowrank.ipynb cell 1 semantics) with the Python-loop get_tensor
strengthened to einsum — timing the reference's own loops would inflate
the ratio ~100x.

Usage: python tools/pin_torch_baseline.py [reps]
"""

import json
import os
import platform
import sys
import time

sys.path.insert(0, "/root/repo")

import torch

from bench import (BASELINE_FINGERPRINT, INNER, OUTER,
                   torch_single_run_seconds)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def one_run() -> float:
    """One full solve, timed — delegates to bench.torch_single_run_seconds
    (the single source of truth for the baseline algorithm; a duplicated
    loop here could silently diverge from what bench compares against)."""
    return torch_single_run_seconds()


one_run()  # warm-up (allocator, thread pool)
rates = []
for r in range(REPS):
    dt = one_run()
    rates.append(1.0 / dt)
    print(f"rep {r}: {dt:.3f}s = {rates[-1]:.3f} maps/s", flush=True)

rates_sorted = sorted(rates)
median = rates_sorted[len(rates_sorted) // 2]
out = {
    "metric": "torch-CPU maps/sec, single-map low-rank 1-bit MLE "
              f"({OUTER}x2x{INNER} Adam steps, einsum-strengthened "
              "reference algorithm)",
    "maps_per_sec_median": round(median, 4),
    "rep_rates": [round(r, 4) for r in rates],
    "spread": [round(min(rates), 4), round(max(rates), 4)],
    "reps": REPS,
    "fingerprint": BASELINE_FINGERPRINT,
    "torch_version": torch.__version__,
    "torch_threads": torch.get_num_threads(),
    "platform": platform.platform(),
    "cpu_count": os.cpu_count(),
    "pinned_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
}
with open("/root/repo/BASELINE_TORCH.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
