"""Real-TPU gated tests (QSC_TPU_TESTS=1): Pallas kernels as actual
Mosaic programs — value/grad parity vs the jnp oracle and a roofline
floor — so the kernel claims in RESULTS.md are reproducible.

The CPU conftest pins every in-process test to the fake 8-device CPU
backend, so the chip runs happen in subprocesses with the axon site hook
re-enabled.  Parity and bandwidth run as SEPARATE subprocesses: remote
Mosaic/XLA compiles through the tunnel occasionally hang >20 min
(RESULTS.md environment notes) and a fresh process recovers, so the
bandwidth phase gets one retry instead of taking the parity results down
with it.  Budget: ~10-25 min on a cold Mosaic cache (kernels are cached
server-side across processes).
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("QSC_TPU_TESTS") != "1",
    reason="real-TPU tests are opt-in: set QSC_TPU_TESTS=1",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "tpu_kernel_parity.py")


def _run(phase, timeout):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)           # let the axon hook pick TPU
    env["PYTHONPATH"] = "/root/.axon_site:" + REPO
    return subprocess.run(
        [sys.executable, "-u", TOOL, "--phase", phase],
        env=env, capture_output=True, text=True, timeout=timeout)


def test_pallas_kernels_on_chip():
    proc = _run("parity", timeout=1500)
    assert proc.returncode == 0, (
        f"kernel parity failed\nstdout: {proc.stdout}\nstderr tail: "
        f"{proc.stderr[-2000:]}")
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["backend"] == "tpu"
    assert out["generic_val_rel"] < 1e-4
    assert out["generic_gS_rel"] < 1e-2
    assert out["generic_gC_rel"] < 1e-2
    assert out["onebit_val_rel"] < 5e-4  # f32 sum-order vs the XLA path
    assert out["onebit_gS_rel"] < 1e-2
    assert out["onebit_gC_rel"] < 1e-2


def test_pallas_kernel_bandwidth_floor():
    last = None
    for attempt in range(2):
        try:
            proc = _run("bw", timeout=1200)
        except subprocess.TimeoutExpired as e:
            last = e
            continue                         # hung remote compile: retry once
        assert proc.returncode == 0, (
            f"bandwidth floor failed\nstdout: {proc.stdout}\nstderr tail: "
            f"{proc.stderr[-2000:]}")
        out = json.loads(proc.stdout.strip().splitlines()[-1])
        assert out["fwd_gbps_raw"] > 50.0
        return
    pytest.skip(f"remote compile hung twice (known tunnel flake): {last}")
