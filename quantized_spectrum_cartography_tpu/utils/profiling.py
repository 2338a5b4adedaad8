"""Profiling and roofline accounting.

The reference has no tracing at all (ad-hoc MATLAB tic/toc only,
SURVEY.md section 5.1).  Here: jax.profiler trace capture, wall-clock
timing of jitted callables with compile-time split, and a roofline helper
for the fused likelihood kernel.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn: Callable, *args, iters: int = 50) -> Dict[str, float]:
    """Returns {'compile_s', 'per_call_us'} for a jitted callable."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    per_call = (time.perf_counter() - t0) / iters
    return {"compile_s": compile_s, "per_call_us": per_call * 1e6}


# TPU v5e single-chip peaks (public figures); used for roofline %.
V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0
V5E_F32_TFLOPS = 98.5


def likelihood_roofline(
    batch: int, K: int, IJp: int, R: int, measured_us: float,
    backward: bool = False,
) -> Dict[str, float]:
    """Roofline stats for the fused quantized-NLL kernel.

    Traffic model: reads W,U [K,IJp] f32 per map (+S,C, negligible);
    backward additionally writes dS [R,IJp] and dC [K,R].
    """
    bytes_per_map = 4 * (2 * K * IJp + R * IJp + K * R)
    if backward:
        bytes_per_map += 4 * (R * IJp + K * R)
    total_bytes = batch * bytes_per_map
    gbps = total_bytes / (measured_us * 1e-6) / 1e9
    flops = batch * (2 * K * R * IJp * (3 if backward else 1)
                     + 30 * K * IJp)
    tflops = flops / (measured_us * 1e-6) / 1e12
    return {
        "achieved_GBps": gbps,
        "pct_hbm_peak": 100.0 * gbps / V5E_HBM_GBPS,
        "achieved_TFLOPs": tflops,
        "bound": "bandwidth" if gbps / V5E_HBM_GBPS >
                 tflops / V5E_F32_TFLOPS else "compute",
    }
