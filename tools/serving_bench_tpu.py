"""End-to-end serving benchmark: continuous batching on the real chip.

Streams N single-map 1-bit recovery requests through
`parallel.RecoveryScheduler` backed by the batched Pallas-kernel solver
(static device batch; pad slots keep the XLA shape fixed), and reports
sustained throughput and per-request latency percentiles — the
production-serving protocol SURVEY.md §5.8 calls for, which the
reference (one map per notebook run) has no analogue of.

    python tools/serving_bench_tpu.py --requests 256 --batch 64
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--inner", type=int, default=5)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--drain-threads", type=int, default=2)
    ap.add_argument("--open-frac", type=float, default=0.9,
                    help="open-loop offered load as a fraction of the "
                         "measured raw capacity")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from quantized_spectrum_cartography_tpu.config import (
        PhysicsConfig, SolverConfig)
    from quantized_spectrum_cartography_tpu.ops.quantizer import (
        dither_probit, pack_bits_host, unpack_bits)
    from quantized_spectrum_cartography_tpu.parallel import RecoveryScheduler
    from quantized_spectrum_cartography_tpu.physics import generate_map_batch
    from quantized_spectrum_cartography_tpu.solvers import recover_lowrank_mle

    G, K, R = 51, 64, 2
    MEAN, STD = 0.0045, 0.008
    B = args.batch
    scfg = SolverConfig(max_iters=args.iters, s_inner_iters=args.inner,
                        c_inner_iters=args.inner, lr_s=0.001, lr_c=0.001,
                        projection_interval=5, rank_truncation=10)

    solve = jax.jit(jax.vmap(
        lambda packed: recover_lowrank_mle(
            unpack_bits(packed, G * G).reshape(K, G, G),
            jnp.zeros((R, G, G)), jnp.full((R, K), 0.01),
            scfg, MEAN, STD)))

    def solver_fn(stacked):
        # wire format: bit-packed observations up (1 bit/entry — 32x
        # less than f32), compact factors down (S,C ~ 16x less than the
        # reconstructed tensor — clients rebuild T_hat = sum_r S_r o c_r
        # locally when needed).  Transfer volume dominates serving latency
        # through any host<->device link; through the tunnel it is
        # decisive.
        # return DEVICE arrays: the scheduler's drain thread performs the
        # blocking device_get, so this dispatch stays async and batch N's
        # download overlaps batch N+1's compute
        res = solve(jnp.asarray(stacked["T_obs"]))
        return {"S": res.S, "C": res.C, "cost": res.costs[:, -1]}

    # data: a stream of independent problems
    pcfg = PhysicsConfig(grid_size=G, num_bands=K, num_emitters=R)
    T, _, _, _ = generate_map_batch(jax.random.PRNGKey(0), pcfg,
                                    args.requests)
    y01 = np.asarray(dither_probit(jax.random.PRNGKey(1), T - MEAN, STD))
    T_obs = pack_bits_host(y01.reshape(args.requests, K, G * G))

    # warm-up compile outside the timed region
    solver_fn({"T_obs": T_obs[:B]})
    print(f"compiled; streaming {args.requests} requests "
          f"(batch {B})", flush=True)

    # in-process raw bound: back-to-back batched solves, downloads fenced
    # at the end only (the pure-compute ceiling serving is measured
    # against — same process, same tunnel, same data)
    n_raw = max(1, args.requests // B)
    t0 = time.time()
    raw_outs = [solver_fn({"T_obs": T_obs[i * B:(i + 1) * B]})
                for i in range(n_raw)]
    for o in raw_outs:
        np.asarray(o["cost"])        # host fence
    raw_dt = time.time() - t0
    raw_maps_per_sec = n_raw * B / raw_dt
    print(f"raw batch-solver bound: {raw_maps_per_sec:.1f} maps/s",
          flush=True)

    sched = RecoveryScheduler(solver_fn, batch_size=B, max_wait_ms=20.0,
                              pipeline_depth=args.depth,
                              drain_threads=args.drain_threads)
    t0 = time.time()
    submit_times = []
    futures = []
    done_closed = [0.0] * args.requests
    for i in range(args.requests):
        submit_times.append(time.time())
        f = sched.submit({"T_obs": T_obs[i]})
        f.add_done_callback(
            lambda fut, i=i: done_closed.__setitem__(i, time.time()))
        futures.append(f)
    for f in futures:
        r = f.result(timeout=600)
        assert np.isfinite(r["cost"]), "non-finite solver cost"
    # CPython runs done-callbacks AFTER waking result() waiters, so the
    # final batch's timestamps may still be pending here — wait for them
    deadline = time.time() + 30
    while any(d == 0.0 for d in done_closed) and time.time() < deadline:
        time.sleep(0.005)
    assert all(d > 0.0 for d in done_closed), "missing completion stamps"
    dt = max(done_closed) - t0
    sched.shutdown()

    lat = np.asarray(done_closed) - np.asarray(submit_times)
    serving = args.requests / dt
    out = {
        "metric": "serving throughput, continuous-batched 1-bit recovery",
        "requests": args.requests,
        "batch": B,
        "pipeline_depth": args.depth,
        "drain_threads": args.drain_threads,
        "maps_per_sec": round(serving, 2),
        "raw_bound_maps_per_sec": round(raw_maps_per_sec, 2),
        "fraction_of_raw": round(serving / raw_maps_per_sec, 4),
        "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
        "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
        "latency_p99_s": round(float(np.percentile(lat, 99)), 3),
        "latency_max_s": round(float(lat.max()), 3),
        "batches_dispatched": sched.batches_dispatched,
        "notes": "closed-loop (all requests submitted at once): a "
                 "throughput measurement; p50 latency is queue-"
                 "dominated by construction",
    }
    print(json.dumps(out))
    # persist the closed-loop result BEFORE the open-loop phase so a
    # failure there cannot discard an already-completed measurement
    with open("/root/repo/SERVING.json", "w") as f:
        json.dump(out, f, indent=1)

    # ---- open-loop point (round-5 VERDICT item 7): Poisson arrivals at
    # `open_frac` x the measured raw capacity — the latency-bounded
    # operating point a production deployment would run at.  Requests
    # arrive on a clock, not all-at-once, so queueing delay reflects the
    # scheduler, not the submission burst.
    open_frac = args.open_frac
    lam = open_frac * raw_maps_per_sec            # arrivals per second
    rng = np.random.default_rng(7)
    gaps = rng.exponential(1.0 / lam, size=args.requests)
    sched2 = RecoveryScheduler(solver_fn, batch_size=B, max_wait_ms=20.0,
                               pipeline_depth=args.depth,
                               drain_threads=args.drain_threads)
    print(f"open loop: lambda = {lam:.1f} req/s "
          f"({open_frac:.2f} x raw bound)", flush=True)
    t0 = time.time()
    # completion times MUST be captured at future-resolve time via
    # callbacks: the main thread is busy pacing arrivals for the whole
    # submission window, so reading futures afterwards would timestamp
    # early completions seconds late and inflate every latency quantile
    done_t = [0.0] * args.requests
    submit_times2, futures2 = [], []
    next_t = t0
    for i in range(args.requests):
        next_t += gaps[i]
        now = time.time()
        if next_t > now:
            time.sleep(next_t - now)
        submit_times2.append(time.time())
        f = sched2.submit({"T_obs": T_obs[i]})
        f.add_done_callback(
            lambda fut, i=i: done_t.__setitem__(i, time.time()))
        futures2.append(f)
    for f in futures2:
        r = f.result(timeout=600)
        assert np.isfinite(r["cost"]), "non-finite solver cost"
    deadline = time.time() + 30
    while any(d == 0.0 for d in done_t) and time.time() < deadline:
        time.sleep(0.005)
    assert all(d > 0.0 for d in done_t), "missing completion stamps"
    sched2.shutdown()
    lat2 = np.asarray(done_t) - np.asarray(submit_times2)
    span = max(done_t) - t0
    # drop the warm-up/drain edges for the sustained-rate estimate:
    # completions between the 10th and 90th percentile completion times
    d = np.sort(np.asarray(done_t))
    lo, hi = d[int(0.1 * len(d))], d[int(0.9 * len(d)) - 1]
    sustained = (np.sum((np.asarray(done_t) >= lo)
                        & (np.asarray(done_t) <= hi))
                 / max(hi - lo, 1e-9))
    out["open_loop"] = {
        "arrival_process": "Poisson",
        "target_rate_frac_of_raw": open_frac,
        "offered_load_maps_per_sec": round(lam, 2),
        "sustained_maps_per_sec": round(float(sustained), 2),
        "completed_over_span_maps_per_sec": round(
            args.requests / span, 2),
        "latency_p50_s": round(float(np.percentile(lat2, 50)), 3),
        "latency_p95_s": round(float(np.percentile(lat2, 95)), 3),
        "latency_p99_s": round(float(np.percentile(lat2, 99)), 3),
        "latency_max_s": round(float(lat2.max()), 3),
        "batches_dispatched": sched2.batches_dispatched,
    }
    print(json.dumps(out["open_loop"]))
    with open("/root/repo/SERVING.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
