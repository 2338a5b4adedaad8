"""Benchmark: maps/sec for batched 1-bit 51x51x64 SLF recovery on TPU.

Protocol (BASELINE.json metric "maps/sec/chip on 51x51 SLF recovery"):
a batch of B independent full-size problems, each solved by the low-rank
1-bit probit MLE (backup/notebooks/onebit_lowrank.ipynb semantics:
alternating Adam, 50 outer x (5 S + 5 C) inner steps, rank/nonneg
projection every 5 iters), vmapped + jitted on one chip.

vs_baseline: ratio against a *strengthened* torch-CPU reference — the same
algorithm with the reference's Python-loop get_tensor replaced by einsum
(the reference's own loops are ~100x slower still; timing those would
inflate the ratio).  Reference solver semantics per
backup/notebooks/onebit_lowrank.ipynb cell 1.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "maps/sec", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

# B=256: measured batch-saturation point (B-sweep on the real chip:
# 128 -> 291, 256 -> 305, 512 -> 307 maps/s — dispatch amortization
# saturates by 256; RESULTS.md throughput section)
BATCH = 256
OUTER = 50
INNER = 5
GRID, BANDS, RANK = 51, 64, 2
MEAN, STD = 0.0045, 0.008
# QSC_BENCH_FUSED=1 uses the Pallas fused kernel (measured 147 maps/s; the
# fwd+bwd Mosaic kernels add ~15 min of remote compile on the axon tunnel);
# =0 uses the XLA analytic-VJP path (73 maps/s, ~3 min compile).  Unset:
# try the Pallas path in a watchdogged subprocess and fall back to the XLA
# path if it times out or fails (tunnel compile latency is highly variable).
FUSED_ENV = os.environ.get("QSC_BENCH_FUSED")
USE_FUSED = FUSED_ENV == "1"
FUSED_WATCHDOG_SECS = int(os.environ.get("QSC_BENCH_FUSED_TIMEOUT", "2700"))


def jax_maps_per_sec() -> "tuple[float, list]":
    import jax
    import jax.numpy as jnp
    from quantized_spectrum_cartography_tpu.config import (
        PhysicsConfig, SolverConfig)
    from quantized_spectrum_cartography_tpu.ops.quantizer import dither_probit
    from quantized_spectrum_cartography_tpu.physics import (
        generate_map_batch)
    from quantized_spectrum_cartography_tpu.solvers import recover_lowrank_mle

    cfg = PhysicsConfig(grid_size=GRID, num_bands=BANDS, num_emitters=RANK)
    scfg = SolverConfig(max_iters=OUTER, s_inner_iters=INNER,
                        c_inner_iters=INNER, lr_s=0.001, lr_c=0.001,
                        projection_interval=5, rank_truncation=10)

    T, S, C, _ = generate_map_batch(jax.random.PRNGKey(0), cfg, BATCH)
    T_obs = dither_probit(jax.random.PRNGKey(1), T - MEAN, STD)
    S0 = jnp.zeros((BATCH, RANK, GRID, GRID))
    C0 = jnp.full((BATCH, RANK, BANDS), 0.01)

    solve = jax.jit(jax.vmap(
        lambda t, s, c: recover_lowrank_mle(t, s, c, scfg, MEAN, STD,
                                            use_fused=USE_FUSED)))
    # warm-up / compile.  NOTE: through the axon tunnel
    # block_until_ready alone does not await remote execution; a host
    # transfer (device_get of a scalar) is the only reliable fence.
    float(jnp.sum(solve(T_obs, S0, C0).costs))
    reps = 5
    rates = []
    acc = 0.0
    for _ in range(reps):
        t0 = time.time()
        res = solve(T_obs, S0, C0)
        acc += float(jnp.sum(res.costs))     # forced completion fence
        rates.append(BATCH / (time.time() - t0))
    assert acc == acc  # keep the fence live
    # median of the reps: the tunnel occasionally serves one cold/slow
    # window (measured rep sets like [141, 293.6, 292.6, 295.3, 294.5]);
    # the median reports the sustained rate while rep_rates/rep_spread
    # expose the variance
    return float(np.median(rates)), rates


def torch_single_run_seconds() -> float:
    """ONE full solve of the strengthened torch-CPU baseline: same
    algorithm as the JAX path, einsum-vectorized, single map (the
    reference runs one map per notebook).  The single source of truth
    for the baseline algorithm — tools/pin_torch_baseline.py times THIS
    function, so the pinned denominator and any live measurement cannot
    diverge."""
    import torch

    torch.manual_seed(0)
    T_true = torch.rand(BANDS, GRID, GRID) * 0.01
    p = 0.5 * (1 + torch.erf((T_true - MEAN) / (STD * 1.414213)))
    T_obs = torch.bernoulli(p)

    S = torch.zeros(RANK, GRID, GRID, requires_grad=True)
    C = torch.full((RANK, BANDS), 0.01, requires_grad=True)
    opt_s = torch.optim.Adam([S], lr=0.001)
    opt_c = torch.optim.Adam([C], lr=0.001)
    bce = torch.nn.BCELoss()

    def cost():
        T_hat = torch.einsum("rij,rk->kij", S, C)
        z = 0.5 * (1 + torch.erf((T_hat - MEAN) / (STD * 1.414213)))
        return bce(z.clamp(1e-6, 1 - 1e-6), T_obs) + \
            0.01 * torch.norm(C, "fro")

    t0 = time.time()
    for i in range(OUTER):
        for _ in range(INNER):
            opt_s.zero_grad(); opt_c.zero_grad()
            c = cost(); c.backward(); opt_s.step()
        for _ in range(INNER):
            opt_s.zero_grad(); opt_c.zero_grad()
            c = cost(); c.backward(); opt_c.step()
        if (i + 1) % 5 == 0:
            with torch.no_grad():
                u, s, v = torch.svd(S)
                s[:, 10:] = 0
                S.copy_(u @ torch.diag_embed(s) @ v.transpose(-2, -1))
                C.clamp_(min=0)
    return time.time() - t0


# the baseline-protocol fingerprint: a pinned BASELINE_TORCH.json is
# only honored when it was measured under these exact constants
BASELINE_FINGERPRINT = {"outer": OUTER, "inner": INNER, "grid": GRID,
                        "bands": BANDS, "rank": RANK}


def torch_maps_per_sec() -> float:
    # best-of-2 full runs: the CPU baseline is sensitive to transient host
    # load, and an artificially slow baseline would inflate vs_baseline
    return 1.0 / min(torch_single_run_seconds(),
                     torch_single_run_seconds())


def main():
    sys.path.insert(0, "/root/repo")
    if FUSED_ENV is None:
        # parent: try the faster Pallas path in a subprocess so a Mosaic
        # compile stall cannot wedge the whole benchmark
        import subprocess
        env = dict(os.environ, QSC_BENCH_FUSED="1")
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=FUSED_WATCHDOG_SECS)
            for line in out.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    json.loads(line)   # validate
                    print(line)
                    return
        except (subprocess.TimeoutExpired, json.JSONDecodeError, OSError):
            pass
        # fall through to the XLA path in-process
    jax_rate, rep_rates = jax_maps_per_sec()
    # pinned denominator (tools/pin_torch_baseline.py, BASELINE_TORCH.json):
    # re-measuring the CPU baseline every run made vs_baseline swing
    # 429->672 across artifacts on a shared host while the numerator was
    # flat; the pinned median (with its recorded spread) keeps the
    # headline ratio stable and self-describing.  Falls back to a live
    # measurement only when the pin is absent.
    pin_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_TORCH.json")
    baseline_src = None
    torch_rate = float("nan")
    if os.path.exists(pin_path):
        try:
            with open(pin_path) as f:
                pin = json.load(f)
            # honor the pin only when its protocol fingerprint matches
            # the current constants — a stale pin after a protocol
            # change would silently skew the headline ratio
            if pin.get("fingerprint") == BASELINE_FINGERPRINT:
                torch_rate = float(pin["maps_per_sec_median"])
                baseline_src = {"source": "pinned (BASELINE_TORCH.json)",
                                "maps_per_sec": torch_rate,
                                "spread": pin.get("spread"),
                                "pinned_utc": pin.get("pinned_utc")}
            else:
                baseline_src = {"source": "pin fingerprint mismatch -> "
                                          "live measurement",
                                "pin_fingerprint": pin.get("fingerprint"),
                                "current": BASELINE_FINGERPRINT}
        except (OSError, KeyError, ValueError, json.JSONDecodeError):
            pass
    if torch_rate != torch_rate:
        try:
            torch_rate = torch_maps_per_sec()
            live = {"source": "live measurement"
                              + ("" if baseline_src else " (no pin found)"),
                    "maps_per_sec": round(torch_rate, 4)}
            if baseline_src:            # carry the mismatch explanation
                live["pin_rejected"] = baseline_src
            baseline_src = live
        except Exception:
            torch_rate = float("nan")
    out = {
        "metric": "maps/sec, batched 1-bit 51x51x64 low-rank MLE recovery "
                  f"(B={BATCH}, {OUTER}x2x{INNER} Adam steps, 1 chip, "
                  f"{'pallas' if USE_FUSED else 'xla'} likelihood)",
        "value": round(jax_rate, 3),
        "unit": "maps/sec",
        "rep_rates": [round(r, 1) for r in rep_rates],
        "rep_spread": [round(min(rep_rates), 1), round(max(rep_rates), 1)],
        "baseline": baseline_src,
        "vs_baseline": round(jax_rate / torch_rate, 2)
        if torch_rate == torch_rate else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
