"""Multi-host launcher: N local processes as the standard pod-slice substitute.

The reference has no distributed story at all (SURVEY.md section 5.8); the
north star requires >=90% linear maps/sec scaling from 1 chip to N>=2 hosts
(BASELINE.json).  Real multi-host TPU is not reachable from this
environment, so this launcher spawns N OS processes on localhost, each with
its own set of virtual CPU devices (XLA_FLAGS
--xla_force_host_platform_device_count), joined into one process group via
`jax.distributed.initialize` — the exact code path a pod slice runs, with
DCN replaced by localhost gRPC.

Each worker feeds only its local slice of the global batch
(jax.make_array_from_process_local_data), runs the globally-sharded
batched recovery, and reports (a) the replicated global cost scalar —
every process must compute the identical value, and (b) a checksum of its
local result rows.  The launcher asserts cross-process agreement and, when
given a reference run at a different process count, bit-identity of the
global result.

With `--shard-dir`, the production data path: a prep process per host
writes that host's rows as a raw float32 shard (runtime/native.write_shard,
rows derived from per-row keys so shard contents are process-count
independent), and each worker mmap-reads ONLY its own shard through
NativeShardLoader — no process ever materializes the global batch
(replacing the reference's file-per-index torch.load dataset,
deep_prior/slf_dataset.py:107-110).

    python tools/multihost_launch.py --num-processes 2 --devices-per-process 2 \
        --global-batch 8 --iters 10 --reps 3 --shard-dir /tmp/shards --out /tmp/mh2.json
"""

import argparse
import hashlib
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def prep_shard(args) -> None:
    """Data-pipeline step (its own process): generate ONLY process
    `args.process_id`'s rows of the global problem and write them as a
    raw float32 shard (runtime/native.write_shard).  Rows derive from
    per-row keys (`split(PRNGKey(0), B)[i]`, dither `fold_in(PRNGKey(1),
    i)`), so shard contents are independent of the process count — the
    basis of the cross-process-count bit-identity check.  No process,
    including this one, ever materializes the global batch."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from quantized_spectrum_cartography_tpu.config import PhysicsConfig
    from quantized_spectrum_cartography_tpu.ops.quantizer import dither_probit
    from quantized_spectrum_cartography_tpu.physics import generate_map
    from quantized_spectrum_cartography_tpu.physics.shadowing import (
        correlation_cholesky)
    from quantized_spectrum_cartography_tpu.runtime.native import write_shard

    G, K, R = 51, 64, 2
    MEAN, STD = 0.0045, 0.008
    pcfg = PhysicsConfig(grid_size=G, num_bands=K, num_emitters=R)
    B, n = args.global_batch, args.num_processes
    per = B // n
    lo, hi = args.process_id * per, (args.process_id + 1) * per
    keys = jax.random.split(jax.random.PRNGKey(0), B)[lo:hi]
    chol = jnp.asarray(
        correlation_cholesky(G, pcfg.decorrelation_distance))
    T = jax.vmap(lambda k: jnp.maximum(
        generate_map(k, pcfg, chol)[0], 0.0))(keys)
    dkeys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(1), i)
                       for i in range(lo, hi)])
    T_obs = jax.vmap(lambda k, t: dither_probit(k, t - MEAN, STD))(dkeys, T)
    write_shard(os.path.join(args.shard_dir,
                             f"shard_{args.process_id}.f32"),
                np.asarray(T_obs))


def worker(args) -> None:
    """Runs inside each spawned process."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)

    import jax
    import numpy as np

    from quantized_spectrum_cartography_tpu.parallel.multihost import (
        configure_cpu_substitute)

    configure_cpu_substitute(args.devices_per_process)

    from quantized_spectrum_cartography_tpu.config import (
        PhysicsConfig, SolverConfig)
    from quantized_spectrum_cartography_tpu.ops.quantizer import dither_probit
    from quantized_spectrum_cartography_tpu.parallel.multihost import (
        init_distributed, make_global_mesh, multihost_recover_lowrank,
        process_local_slice)
    from quantized_spectrum_cartography_tpu.physics import generate_map_batch

    init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    mesh = make_global_mesh()

    G, K, R = 51, 64, 2
    MEAN, STD = 0.0045, 0.008
    pcfg = PhysicsConfig(grid_size=G, num_bands=K, num_emitters=R)
    scfg = SolverConfig(max_iters=args.iters, s_inner_iters=2,
                        c_inner_iters=2, lr_s=0.001, lr_c=0.001,
                        projection_interval=5, rank_truncation=10)

    B = args.global_batch
    lo, hi = process_local_slice(B, mesh)
    if args.shard_dir:
        # Production data path: this process mmap-reads ONLY its own
        # per-host shard (written by the prep step) through the native
        # loader — no process ever materializes the global batch.
        from quantized_spectrum_cartography_tpu.runtime.native import (
            NativeShardLoader)

        loader = NativeShardLoader(
            os.path.join(args.shard_dir, f"shard_{args.process_id}.f32"),
            (K, G, G), batch=hi - lo, num_threads=0)
        assert len(loader) == hi - lo, (len(loader), hi - lo)
        T_obs_local = loader.read(0, hi - lo)
        loader.close()
    else:
        # Legacy stand-in: derive the global batch from one key and keep
        # the local rows (every process regenerates everything).
        T, _, _, _ = generate_map_batch(jax.random.PRNGKey(0), pcfg, B)
        T_obs = np.asarray(
            dither_probit(jax.random.PRNGKey(1), T - MEAN, STD))
        T_obs_local = T_obs[lo:hi]
    S0 = np.zeros((hi - lo, R, G, G), np.float32)
    C0 = np.full((hi - lo, R, K), 0.01, np.float32)

    # compile (excluded from timing), then timed reps
    local, total = multihost_recover_lowrank(
        mesh, T_obs_local, S0, C0, scfg, MEAN, STD)
    t0 = time.time()
    for _ in range(args.reps):
        local, total = multihost_recover_lowrank(
            mesh, T_obs_local, S0, C0, scfg, MEAN, STD)
    dt = (time.time() - t0) / args.reps

    digest = hashlib.sha256()
    for key in ("S", "C", "costs"):
        digest.update(np.ascontiguousarray(local[key]).tobytes())
    out = {
        "process_id": args.process_id,
        "num_processes": args.num_processes,
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "rows": [lo, hi],
        "global_cost": total,
        "local_sha256": digest.hexdigest(),
        "costs_tail": [float(c) for c in local["costs"][:, -1]],
        "seconds_per_solve": dt,
        "maps_per_sec": B / dt,
        "data_path": "native_shard" if args.shard_dir else "regenerate",
    }
    with open(args.worker_out, "w") as f:
        json.dump(out, f)


def launch(args) -> dict:
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    tmp = tempfile.mkdtemp(prefix="qsc_mh_")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)           # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    if args.shard_dir:
        # data-pipeline step: one prep process per shard, each generating
        # only its own rows (run before the workers; any missing shard
        # fails the worker's loader open)
        os.makedirs(args.shard_dir, exist_ok=True)
        preps = [subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--prep-shard",
             "--num-processes", str(args.num_processes),
             "--process-id", str(pid),
             "--global-batch", str(args.global_batch),
             "--shard-dir", args.shard_dir], env=env)
            for pid in range(args.num_processes)]
        rcs = [p.wait(timeout=args.timeout) for p in preps]
        if any(rcs):
            raise RuntimeError(f"shard prep exit codes {rcs}")
    procs = []
    outs = []
    for pid in range(args.num_processes):
        wout = os.path.join(tmp, f"proc{pid}.json")
        outs.append(wout)
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--coordinator", coordinator,
               "--num-processes", str(args.num_processes),
               "--process-id", str(pid),
               "--devices-per-process", str(args.devices_per_process),
               "--global-batch", str(args.global_batch),
               "--iters", str(args.iters),
               "--reps", str(args.reps),
               "--worker-out", wout]
        if args.shard_dir:
            cmd += ["--shard-dir", args.shard_dir]
        procs.append(subprocess.Popen(cmd, env=env))
    rcs = [p.wait(timeout=args.timeout) for p in procs]
    if any(rcs):
        raise RuntimeError(f"worker exit codes {rcs}")
    results = []
    for wout in outs:
        with open(wout) as f:
            results.append(json.load(f))

    # every process must see the full device set and the same global cost
    costs = {r["global_cost"] for r in results}
    assert len(costs) == 1, f"cross-process cost disagreement: {costs}"
    expect_dev = args.num_processes * args.devices_per_process
    assert all(r["global_devices"] == expect_dev for r in results)

    tails = []
    for r in sorted(results, key=lambda r: r["rows"][0]):
        tails.extend(r["costs_tail"])
    summary = {
        "data_path": "native_shard" if args.shard_dir else "regenerate",
        "num_processes": args.num_processes,
        "devices_per_process": args.devices_per_process,
        "global_batch": args.global_batch,
        "iters": args.iters,
        "global_cost": results[0]["global_cost"],
        "global_costs_tail": tails,
        "maps_per_sec": round(min(r["maps_per_sec"] for r in results), 2),
        "per_process": results,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--prep-shard", action="store_true")
    ap.add_argument("--shard-dir", type=str, default=None)
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--devices-per-process", type=int, default=2)
    ap.add_argument("--global-batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--worker-out", type=str, default=None)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.prep_shard:
        prep_shard(args)
    elif args.worker:
        worker(args)
    else:
        summary = launch(args)
        print(json.dumps({k: v for k, v in summary.items()
                          if k != "per_process"}, indent=1))


if __name__ == "__main__":
    main()
