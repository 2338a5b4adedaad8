"""Is the headline MLE objective informative? Compare cost at ground truth
vs at the solver's solution; run the solver initialized at the truth."""

import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

t0 = time.time()
print("backend:", jax.default_backend(), flush=True)

from quantized_spectrum_cartography_tpu.config import (
    PhysicsConfig, QuantizerConfig, SolverConfig)
from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops.likelihood import (
    log_prob_probit_bounds, gather_bin_bounds, masked_nll)
from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.ops.quantizer import quantize_log
from quantized_spectrum_cartography_tpu.physics import (
    generate_onebit_problem, sample_entry_mask)
from quantized_spectrum_cartography_tpu.solvers import (
    load_vae_prior, recover_mle_gan, encoder_init)

PCFG = PhysicsConfig()
prob = generate_onebit_problem(jax.random.PRNGKey(2), PCFG, 0.1)
sigma = 5.0
qcfg = QuantizerConfig(boundaries=B.QUANTIZATION_BOUNDARIES_4_BINS,
                       noise_std=sigma, log_offset=B.LOG_OFFSET_4)
bb = jnp.asarray(np.array(qcfg.boundaries))
Y = quantize_log(jax.random.PRNGKey(3), prob.T_true, sigma, bb,
                 qcfg.log_offset)
mask = sample_entry_mask(jax.random.PRNGKey(4), Y.shape, 0.1)
Wb, Ub = gather_bin_bounds(Y, bb)


def nll_of(T_hat):
    x = jnp.log(T_hat + qcfg.log_offset)
    return float(masked_nll(log_prob_probit_bounds(Wb, Ub, x, sigma), mask))


print("nll(T_true) =", nll_of(prob.T_true), flush=True)
print("nll(zeros)  =", nll_of(jnp.zeros_like(prob.T_true)), flush=True)

gen, latent, vvars = load_vae_prior("/root/repo/checkpoints/vae64/final")
# note vae64/final lacks metadata keys; they default (latent 64, amp .26)

# encoder-init Z at the true SLFs, C at truth
Z0 = encoder_init(vvars, jnp.ones((51, 51)), prob.S_true, latent_dim=latent)
S0 = gen(Z0)
print("prior fit at truth: NMSE_S per emitter:",
      [float(nmse(S0[r], prob.S_true[r])) for r in range(2)], flush=True)
print("nll(G(Z0), C_true) =", nll_of(get_tensor(S0, prob.C_true)), flush=True)

scfg = SolverConfig(max_iters=250, z_search_global=0, z_search_local=0,
                    z_dim=latent)
res = recover_mle_gan(jax.random.PRNGKey(5), Y, mask, gen, scfg, qcfg,
                      Z_init=Z0, C_init=prob.C_true, T_true=prob.T_true)
nm = np.asarray(res.nmses)
cost = np.asarray(res.costs)
print(f"[{time.time()-t0:5.0f}s] truth-init solve: nmse start~{nm[0]:.4f} "
      f"final {nm[-1]:.4f} best {nm.min():.4f}; cost {cost[0]:.0f} -> "
      f"{cost[-1]:.0f}", flush=True)

# cold solve for comparison (same program shapes, cheap second run)
res2 = recover_mle_gan(jax.random.PRNGKey(6), Y, mask, gen, scfg, qcfg,
                       T_true=prob.T_true)
nm2 = np.asarray(res2.nmses)
cost2 = np.asarray(res2.costs)
print(f"cold solve: nmse final {nm2[-1]:.4f}; cost {cost2[0]:.0f} -> "
      f"{cost2[-1]:.0f}", flush=True)
print("nll at truth-init solution:", nll_of(np.asarray(res.T_hat)), flush=True)
print("nll at cold solution:", nll_of(np.asarray(res2.T_hat)), flush=True)
print("C_true row norms:", np.linalg.norm(np.asarray(prob.C_true), axis=1),
      " solver C norms:", np.linalg.norm(np.asarray(res2.C), axis=1),
      flush=True)
print("DONE", flush=True)
