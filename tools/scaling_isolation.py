"""Isolate the weak-scaling residual: sharded mesh vs independent processes.

Round-1 measured 0.62 weak-scaling efficiency at 8 virtual CPU devices and
attributed it to host-core oversubscription without proof (VERDICT.md weak
item 1).  This experiment pins it:

  mode=mesh   one process, N virtual devices, `batched_recover_lowrank`
              over the ('data','model') mesh — the production sharded path.
  mode=indep  N OS processes, each a SINGLE-device JAX runtime solving the
              same per-device batch with the same solver — no mesh, no
              sharding, no collectives, nothing shared but the host CPUs.

If rate(mesh, N) ~= rate(indep, N), the sharded path adds no overhead and
the sub-1.0 efficiency is purely CPU-backend contention (this host has
`nproc` cores; N devices > cores cannot scale).  The honest mesh-mechanism
number is the efficiency at N <= nproc.

    python tools/scaling_isolation.py --devices 1 2 4 8 --per-device 8
"""

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _solver_rate(n_devices: int, per_device: int, iters: int,
                 reps: int) -> float:
    """Rate (maps/sec) of the sharded batched solve on n virtual devices.
    Runs inside a fresh process with its own device count."""
    import jax
    import jax.numpy as jnp

    from quantized_spectrum_cartography_tpu.config import (
        PhysicsConfig, SolverConfig)
    from quantized_spectrum_cartography_tpu.ops.quantizer import dither_probit
    from quantized_spectrum_cartography_tpu.parallel import (
        batched_recover_lowrank, make_mesh)
    from quantized_spectrum_cartography_tpu.physics import generate_map_batch

    G, K, R = 51, 64, 2
    MEAN, STD = 0.0045, 0.008
    B = n_devices * per_device
    pcfg = PhysicsConfig(grid_size=G, num_bands=K, num_emitters=R)
    scfg = SolverConfig(max_iters=iters, s_inner_iters=2, c_inner_iters=2,
                        lr_s=0.001, lr_c=0.001, projection_interval=5,
                        rank_truncation=10)
    mesh = make_mesh((n_devices, 1))
    T, _, _, _ = generate_map_batch(jax.random.PRNGKey(0), pcfg, B)
    T_obs = dither_probit(jax.random.PRNGKey(1), T - MEAN, STD)
    S0 = jnp.zeros((B, R, G, G))
    C0 = jnp.full((B, R, K), 0.01)

    def run():
        res = batched_recover_lowrank(mesh, T_obs, S0, C0, scfg, MEAN, STD)
        return float(jnp.sum(res.costs))        # host fence

    run()
    t0 = time.time()
    for _ in range(reps):
        run()
    return B / ((time.time() - t0) / reps)


def count_collectives(n_devices: int, per_device: int, iters: int) -> dict:
    """Compiler-level proof that the data axis is communication-free:
    compile the sharded batched solve for n devices and count collective
    ops in the optimized HLO.  Zero collectives => weak scaling on real
    hardware is bounded only by per-chip compute, independent of any
    host-load noise in CPU-substitute timings."""
    import functools

    import jax
    import jax.numpy as jnp

    from quantized_spectrum_cartography_tpu.config import SolverConfig
    from quantized_spectrum_cartography_tpu.parallel import make_mesh
    from quantized_spectrum_cartography_tpu.parallel.mesh import batch_sharding
    from quantized_spectrum_cartography_tpu.solvers.lowrank_mle import (
        recover_lowrank_mle)

    G, K, R = 51, 64, 2
    B = n_devices * per_device
    scfg = SolverConfig(max_iters=iters, s_inner_iters=2, c_inner_iters=2,
                        projection_interval=5, rank_truncation=10)
    mesh = make_mesh((n_devices, 1))
    solver = jax.vmap(functools.partial(
        recover_lowrank_mle, cfg=scfg, mean=0.0045, std=0.008))
    fn = jax.jit(solver, in_shardings=(batch_sharding(mesh, 4),
                                       batch_sharding(mesh, 4),
                                       batch_sharding(mesh, 3)))
    lowered = fn.lower(
        jax.ShapeDtypeStruct((B, K, G, G), jnp.float32),
        jax.ShapeDtypeStruct((B, R, G, G), jnp.float32),
        jax.ShapeDtypeStruct((B, R, K), jnp.float32))
    hlo = lowered.compile().as_text()
    names = ("all-reduce", "all-gather", "all-to-all", "collective-permute",
             "reduce-scatter", "collective-broadcast")
    counts = {nm: hlo.count(nm) for nm in names}
    return {"devices": n_devices, "collective_ops": counts,
            "total_collectives": sum(counts.values())}


def _child(args) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.n_devices)
    out = {"rate": _solver_rate(args.n_devices, args.per_device, args.iters,
                                args.reps)}
    if args.count_collectives:
        out.update(count_collectives(args.n_devices, args.per_device,
                                     args.iters))
    with open(args.child_out, "w") as f:
        json.dump(out, f)


def _spawn_run(n_devices, per_device, iters, reps, tmpdir, tag) -> float:
    """One subprocess with n_devices virtual devices; returns maps/sec."""
    out = os.path.join(tmpdir, f"{tag}.json")
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--n-devices", str(n_devices), "--per-device", str(per_device),
           "--iters", str(iters), "--reps", str(reps), "--child-out", out]
    if tag.startswith("mesh"):
        cmd.append("--count-collectives")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return cmd, env, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--n-devices", type=int, default=1)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--per-device", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--child-out", type=str, default=None)
    ap.add_argument("--count-collectives", action="store_true")
    args = ap.parse_args()
    if args.child:
        _child(args)
        return

    import tempfile
    tmpdir = tempfile.mkdtemp(prefix="qsc_scale_")
    ncores = mp.cpu_count()
    report = {"host_cores": ncores, "per_device_batch": args.per_device,
              "iters": args.iters, "points": []}

    base = None
    for n in args.devices:
        # mesh mode: one process, n virtual devices, sharded batch
        cmd, env, out = _spawn_run(n, args.per_device, args.iters,
                                   args.reps, tmpdir, f"mesh{n}")
        subprocess.run(cmd, check=True, env=env, timeout=1800)
        with open(out) as f:
            mesh = json.load(f)
        mesh_rate = mesh["rate"]

        # independent mode: n single-device processes running CONCURRENTLY,
        # each its own per-device batch; aggregate rate = total maps / max
        # wall time (measured inside each child, take the slowest)
        procs, outs = [], []
        t0 = time.time()
        for i in range(n):
            cmd, env, out = _spawn_run(1, args.per_device, args.iters,
                                       args.reps, tmpdir, f"ind{n}_{i}")
            procs.append(subprocess.Popen(cmd, env=env))
            outs.append(out)
        rcs = [p.wait(timeout=1800) for p in procs]
        assert not any(rcs), rcs
        rates = []
        for out in outs:
            with open(out) as f:
                rates.append(json.load(f)["rate"])
        # each child reports per-process rate incl. only solve time; the
        # aggregate is bottlenecked by the slowest child
        indep_rate = min(rates) * n

        if base is None:
            base = mesh_rate / n        # per-device rate at first point
        point = {
            "devices": n,
            "mesh_rate": round(mesh_rate, 2),
            "indep_rate": round(indep_rate, 2),
            "mesh_eff": round(mesh_rate / (base * n), 3),
            "indep_eff": round(indep_rate / (base * n), 3),
            "mesh_vs_indep": round(mesh_rate / indep_rate, 3),
            "total_collectives": mesh.get("total_collectives"),
        }
        report["points"].append(point)
        print(json.dumps(point), flush=True)

    # two-part verdict:
    # (a) compiler-level: zero collectives in the sharded program => the
    #     data axis cannot lose efficiency to communication on real chips
    # (b) host-level: mesh rate vs N independent single-device processes
    #     at matched total load — any shortfall common to both is CPU
    #     contention (N devices > host cores cannot scale on the substitute)
    worst = min(p["mesh_vs_indep"] for p in report["points"])
    no_comm = all((p["total_collectives"] or 0) == 0
                  for p in report["points"])
    report["collective_free"] = no_comm
    report["sharding_overhead_free"] = bool(worst >= 0.9)
    report["verdict"] = (
        ("compiled program contains ZERO collective ops at every N "
         "(communication-free by construction); " if no_comm else
         "WARNING: collectives found in the data-parallel program; ")
        + (f"mesh rate >= {worst:.2f}x N independent single-device "
           "processes at matched load: residual efficiency loss on the "
           f"{ncores}-core substrate is CPU-backend contention, not "
           "sharding" if worst >= 0.9 else
           f"mesh path is {1 - worst:.0%} slower than independent "
           "processes at worst N"))
    print(json.dumps(report))
    with open(os.path.join(REPO, "SCALING_ISOLATION.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
