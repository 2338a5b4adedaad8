"""Real-TPU (non-interpret) Pallas kernel parity + roofline check.

Runs the generic ordinal fused kernel and the specialized 1-bit kernel as
actual Mosaic programs on the chip, compares value and factor gradients to
the pure-jnp oracle (`fused_nll_reference`), times the forward with a
host-transfer fence (block_until_ready does not await remote execution
through the axon tunnel — RESULTS.md), and prints ONE JSON line.

Invoked by tests/test_tpu_real.py (gated on QSC_TPU_TESTS=1) so the
kernel claims in RESULTS.md are reproducible, per the SURVEY.md section 4
test plan.  Budget ~8-20 min on a cold Mosaic cache.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops.pallas import (
    fused_nll_reference,
    fused_onebit_nll,
    fused_quantized_nll,
    pack_bounds,
    pack_bounds_1bit,
    pack_codes_1bit,
)
from quantized_spectrum_cartography_tpu.ops.lowrank import pad_spatial


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["all", "parity", "bw"],
                    default="all",
                    help="'parity' = value/grad checks only; 'bw' = "
                    "bandwidth chain only (separate phases so a hung "
                    "remote compile of one program cannot take down the "
                    "other's results — tests/test_tpu_real.py retries "
                    "them independently)")
    args = ap.parse_args()

    out = {"backend": jax.default_backend()}
    assert jax.default_backend() == "tpu", "must run on the real chip"

    K, I, J, R = 64, 51, 51, 2
    IJ = I * J
    rng = np.random.default_rng(0)
    S = pad_spatial(jnp.asarray(
        rng.uniform(0.0, 0.05, (R, IJ)).astype(np.float32)))
    C = jnp.asarray(rng.uniform(0.0, 1.0, (K, R)).astype(np.float32))
    Y = jnp.asarray(rng.integers(0, 4, (K, I, J)))
    mask = jnp.asarray(rng.integers(0, 2, (K, I, J)).astype(np.float32))
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_4_BINS_LOG))
    sigma, offset = 5.0, B.LOG_OFFSET_4
    W, U = pack_bounds(Y, bb, mask)

    # ---- generic ordinal kernel: value + grads vs jnp oracle -----------
    def kern(s, c):
        return fused_quantized_nll(s, c, W, U, sigma, offset, False, False,
                                   None, "pallas")

    def oracle(s, c):
        return fused_nll_reference(s, c, W, U, sigma, offset)

    if args.phase == "bw":
        run_bw(out, S, C, W, U, sigma, offset)
        print(json.dumps(out), flush=True)
        sys.exit(0 if out["fwd_gbps_raw"] > 50.0 else 1)

    t0 = time.time()
    v_k, (gS_k, gC_k) = jax.value_and_grad(kern, argnums=(0, 1))(S, C)
    v_k = float(v_k)                      # host fence = real execution
    out["generic_compile_s"] = round(time.time() - t0, 1)
    v_o, (gS_o, gC_o) = jax.value_and_grad(oracle, argnums=(0, 1))(S, C)
    out["generic_val_rel"] = abs(v_k - float(v_o)) / abs(float(v_o))
    out["generic_gS_rel"] = float(
        jnp.linalg.norm(gS_k - gS_o) / jnp.linalg.norm(gS_o))
    out["generic_gC_rel"] = float(
        jnp.linalg.norm(gC_k - gC_o) / jnp.linalg.norm(gC_o))

    # ---- specialized 1-bit kernel vs generic bounds on the same obs ----
    mean = 0.0045
    Y1 = jnp.asarray(rng.integers(0, 2, (K, I, J)).astype(np.float32))
    Yc = pack_codes_1bit(Y1, mask)
    W1, U1 = pack_bounds_1bit(Y1, mean, mask)

    def kern1(s, c):
        return fused_onebit_nll(s, c, Yc, mean, 0.008, False, "pallas")

    def gen1(s, c):
        return fused_quantized_nll(s, c, W1, U1, 0.008, 0.0, False, True,
                                   None, "xla")

    t0 = time.time()
    v1_k, (g1S_k, g1C_k) = jax.value_and_grad(kern1, argnums=(0, 1))(S, C)
    v1_k = float(v1_k)
    out["onebit_compile_s"] = round(time.time() - t0, 1)
    v1_o, (g1S_o, g1C_o) = jax.value_and_grad(gen1, argnums=(0, 1))(S, C)
    out["onebit_val_rel"] = abs(v1_k - float(v1_o)) / abs(float(v1_o))
    out["onebit_gS_rel"] = float(
        jnp.linalg.norm(g1S_k - g1S_o) / jnp.linalg.norm(g1S_o))
    out["onebit_gC_rel"] = float(
        jnp.linalg.norm(g1C_k - g1C_o) / jnp.linalg.norm(g1C_o))

    ok = (out["generic_val_rel"] < 1e-4 and out["generic_gS_rel"] < 1e-2
          and out["generic_gC_rel"] < 1e-2 and out["onebit_val_rel"] < 5e-4
          and out["onebit_gS_rel"] < 1e-2 and out["onebit_gC_rel"] < 1e-2)

    if args.phase == "all":
        run_bw(out, S, C, W, U, sigma, offset)
        ok = ok and out["fwd_gbps_raw"] > 50.0

    print(json.dumps(out), flush=True)
    sys.exit(0 if ok else 1)


def run_bw(out, S, C, W, U, sigma, offset):
    """Roofline floor: batched forward bandwidth.  B maps' (W, U) bounds
    are the dominant traffic: 2 f32 tensors of [K, IJp] per map per pass.

    Timing: CHAIN-SERIALIZED in-graph executions with a single host fence
    — a per-rep fence pays the full axon tunnel RTT every rep (~10s of
    ms) and reports RTT, not kernel time (RESULTS.md timing pitfall).
    The S perturbation by the previous output makes each link
    data-dependent so XLA cannot CSE the repeats.  B=128 matches the
    proven bench.py program shape.
    """
    Bn, CHAIN = 128, 10
    Wb = jnp.broadcast_to(W, (Bn,) + W.shape)
    Ub = jnp.broadcast_to(U, (Bn,) + U.shape)
    Sb = jnp.broadcast_to(S, (Bn,) + S.shape)
    Cb = jnp.broadcast_to(C, (Bn,) + C.shape)

    vfwd = jax.vmap(
        lambda s, c, w, u: fused_quantized_nll(
            s, c, w, u, sigma, offset, False, False, None, "pallas"))

    @jax.jit
    def chain(s0):
        def link(s, _):
            nll = vfwd(s, Cb, Wb, Ub)                # [Bn]
            s = s + 1e-20 * nll[:, None, None]       # serialize, no CSE
            return s, jnp.sum(nll)
        s, nlls = jax.lax.scan(link, s0, None, length=CHAIN)
        return jnp.sum(nlls) + jnp.sum(s[0, 0, :1])

    t0 = time.time()
    float(chain(Sb))                                 # compile + warm
    out["bw_compile_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    total = float(chain(Sb))                         # ONE fence for CHAIN runs
    dt = (time.time() - t0) / CHAIN
    assert np.isfinite(total)
    bytes_moved = 2 * Wb.size * 4
    out["fwd_ms_b128"] = round(dt * 1e3, 2)
    out["fwd_gbps_raw"] = round(bytes_moved / dt / 1e9, 1)


if __name__ == "__main__":
    main()
