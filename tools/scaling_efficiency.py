"""Weak-scaling efficiency of sharded batched recovery on a virtual mesh.

BASELINE.json's north star asks for >=90% linear maps/sec scaling from one
chip to N devices.  Real multi-chip hardware is not reachable from this
environment (one v5e chip via the axon tunnel), so this harness runs the
EXACT production code path — `parallel.batched_recover_lowrank` over a
`('data','model')` mesh — on the standard virtual-device substitute
(XLA_FLAGS=--xla_force_host_platform_device_count=N on CPU) and reports
weak-scaling efficiency: batch per device held constant, time per solve
compared against the 1-device run.

On the CPU backend device parallelism maps to host cores, so the numbers
demonstrate mechanism (sharding correctness + collective-free data axis),
not ICI bandwidth.  Run with N real chips for hardware numbers:

    python tools/scaling_efficiency.py --devices 1 2 4 8 --per-device 8
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--per-device", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true", default=True,
                    help="force the virtual CPU mesh (default; pass real "
                         "chips by running under a multi-chip runtime)")
    args = ap.parse_args()

    max_dev = max(args.devices)
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max_dev}")
        os.environ["JAX_PLATFORMS"] = "cpu"

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from quantized_spectrum_cartography_tpu.config import (
        PhysicsConfig, SolverConfig)
    from quantized_spectrum_cartography_tpu.ops.quantizer import dither_probit
    from quantized_spectrum_cartography_tpu.parallel import (
        batched_recover_lowrank, make_mesh)
    from quantized_spectrum_cartography_tpu.physics import generate_map_batch

    G, K, R = 51, 64, 2
    MEAN, STD = 0.0045, 0.008
    pcfg = PhysicsConfig(grid_size=G, num_bands=K, num_emitters=R)
    scfg = SolverConfig(max_iters=args.iters, s_inner_iters=2,
                        c_inner_iters=2, lr_s=0.001, lr_c=0.001,
                        projection_interval=5, rank_truncation=10)

    results = []
    base_rate = None
    # efficiency must be normalized by the true 1-device per-map rate;
    # if the requested list omits n=1, measure it anyway (a list starting
    # at n=2 would otherwise silently treat the 2-device run as perfect)
    devices = list(args.devices)
    if devices[0] != 1:
        devices = [1] + devices
    for n in devices:
        B = n * args.per_device
        mesh = make_mesh((n, 1), devices=jax.devices()[:n])
        T, S, C, _ = generate_map_batch(jax.random.PRNGKey(0), pcfg, B)
        T_obs = dither_probit(jax.random.PRNGKey(1), T - MEAN, STD)
        S0 = jnp.zeros((B, R, G, G))
        C0 = jnp.full((B, R, K), 0.01)

        def run():
            res = batched_recover_lowrank(
                mesh, T_obs, S0, C0, scfg, MEAN, STD)
            return float(jnp.sum(res.costs))   # host fence

        run()                                   # compile
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            run()
        dt = (time.time() - t0) / reps
        rate = B / dt
        if base_rate is None:
            assert n == 1
            base_rate = rate          # per-device rate at 1 device
            eff = 1.0
        else:
            eff = rate / (base_rate * n)
        results.append({"devices": n, "batch": B,
                        "maps_per_sec": round(rate, 2),
                        "weak_scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"metric": "weak-scaling efficiency, sharded batched "
                                "1-bit recovery (virtual mesh)",
                      "results": results}))


if __name__ == "__main__":
    main()
