"""Real-TPU gated tests (QSC_TPU_TESTS=1): Pallas kernels as actual
Mosaic programs — value/grad parity vs the jnp oracle and a roofline
floor — so the kernel claims in RESULTS.md are reproducible.

The CPU conftest pins every in-process test to the fake 8-device CPU
backend, so the chip run happens in a subprocess with the axon site hook
re-enabled.  Budget: ~10-20 min on a cold Mosaic cache (compiles are
cached server-side for identical kernels — RESULTS.md environment notes).
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


def test_pallas_kernels_on_chip():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)           # let the axon hook pick TPU
    env["PYTHONPATH"] = "/root/.axon_site:" + REPO
    proc = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "tools",
                                            "tpu_kernel_parity.py")],
        env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (
        f"kernel parity failed\nstdout: {proc.stdout}\nstderr tail: "
        f"{proc.stderr[-2000:]}")
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["backend"] == "tpu"
    assert out["generic_val_rel"] < 1e-4
    assert out["generic_gS_rel"] < 1e-2
    assert out["generic_gC_rel"] < 1e-2
    assert out["onebit_val_rel"] < 1e-4
    assert out["onebit_gS_rel"] < 1e-2
    assert out["onebit_gC_rel"] < 1e-2
    assert out["fwd_gbps_raw"] > 50.0
