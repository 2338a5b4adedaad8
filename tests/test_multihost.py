"""Multi-process (multi-host substitute) integration tests.

Spawns real OS processes joined via jax.distributed.initialize + gloo CPU
collectives — the standard pod-slice substitute (SURVEY.md section 4).
Asserts the 2-process globally-sharded recovery is bit-identical to the
1-process run of the same global problem (north-star requirement:
distribution must not change results).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCH = os.path.join(REPO, "tools", "multihost_launch.py")


def _run(num_processes, devices_per_process, out, shard_dir=None):
    cmd = [sys.executable, LAUNCH,
           "--num-processes", str(num_processes),
           "--devices-per-process", str(devices_per_process),
           "--global-batch", "4", "--iters", "5", "--out", out]
    if shard_dir:
        cmd += ["--shard-dir", shard_dir]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    subprocess.run(cmd, check=True, env=env, timeout=600,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out) as f:
        return json.load(f)


@pytest.mark.slow
def test_two_process_recovery_matches_single_process(tmp_path):
    one = _run(1, 4, str(tmp_path / "p1.json"))
    two = _run(2, 2, str(tmp_path / "p2.json"))

    # every process reported the identical replicated global cost
    assert len({r["global_cost"] for r in two["per_process"]}) == 1
    # each worker saw the full global device set
    assert all(r["global_devices"] == 4 for r in two["per_process"])
    # distribution changes nothing: bit-identical final costs per map
    assert one["global_cost"] == two["global_cost"]
    assert one["global_costs_tail"] == two["global_costs_tail"]


@pytest.mark.slow
def test_shard_data_path_bit_identity(tmp_path):
    """Production data path: per-host native shards (each worker
    mmap-reads only its own shard; no process materializes the global
    batch).  Shard contents are process-count independent, so 1-process
    and 2-process runs must be bit-identical — and each worker's shard
    holds exactly its local row count."""
    one = _run(1, 4, str(tmp_path / "s1.json"),
               shard_dir=str(tmp_path / "shards1"))
    two = _run(2, 2, str(tmp_path / "s2.json"),
               shard_dir=str(tmp_path / "shards2"))

    assert one["data_path"] == two["data_path"] == "native_shard"
    # shard files: 1-proc wrote one 4-row shard, 2-proc two 2-row shards
    item_bytes = 64 * 51 * 51 * 4
    assert os.path.getsize(tmp_path / "shards1" / "shard_0.f32") \
        == 4 * item_bytes
    for pid in range(2):
        assert os.path.getsize(
            tmp_path / "shards2" / f"shard_{pid}.f32") == 2 * item_bytes
    assert len({r["global_cost"] for r in two["per_process"]}) == 1
    assert one["global_cost"] == two["global_cost"]
    assert one["global_costs_tail"] == two["global_costs_tail"]
